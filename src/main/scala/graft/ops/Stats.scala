package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-distribution diagnostics — the "look before you shuffle" checks a
  * 100 TB pipeline runs before committing to a join/partition key: a
  * pathological key (the null user, the empty string, one bot account)
  * concentrates a partition onto one task and stalls the stage; these two
  * operators surface that BEFORE the expensive job, from one cheap
  * map-side-combinable count.
  */
object Stats {

  /** Top-`k` heaviest values of `keyCol` with their row counts and corpus
    * share — the candidates for salting, filtering, or broadcast-side
    * special-casing. Deterministic order: (count desc, value asc), so the
    * boundary tie picks the same rows on any engine or layout.
    *
    * One partial-aggregated shuffle + a TakeOrdered over per-key counts
    * (never rows); the 1-row total broadcasts.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    // total from the per-key counts, NOT a second scan of df: the counts
    // exchange is reused, so the input is read exactly once
    val total = counts.agg(sum(col("n")).cast("double").as("__total"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("__total"), 6))
      .drop("__total")
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
  }

  /** Numeric data-QA profile: one output row per requested column with
    * non-null count, null count, min/max/mean/sample-stddev — the
    * "know your data" health check run before trusting a new drop. ONE
    * pass over the table: every column's aggregates compute in a single
    * aggregation (no per-column scans), and the 1-row result unpivots to
    * rows with `stack` — plan-level, nothing recomputes.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // the stack() unpivot is built as SQL text: reject names that cannot
    // appear safely inside it (everything else is backtick-quoted below)
    require(cols.forall(_.matches("[A-Za-z0-9_]+")),
      s"profileColumns: column names must be [A-Za-z0-9_]+, got ${cols.mkString(", ")}")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__${c}_n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nulls"),
      min(col(c)).cast("double").as(s"__${c}_min"),
      max(col(c)).cast("double").as(s"__${c}_max"),
      round(avg(col(c)), 6).as(s"__${c}_mean"),
      round(stddev_samp(col(c)), 6).as(s"__${c}_std")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __${c}_n, __${c}_nulls, __${c}_min, __${c}_max, __${c}_mean, __${c}_std"
    ).mkString(", ")
    one.select(expr(
      s"stack(${cols.length}, $stackArgs) AS (column, n, n_null, min, max, mean, stddev)"))
  }

  /** One-row skew summary of `keyCol`: distinct keys, total rows, the
    * max / mean / exact-p99 rows-per-key, and the skew ratio
    * (max / mean — 1.0 is perfectly uniform; a join key in the hundreds
    * wants salting or AQE skew handling). Exact percentile buffers the
    * per-KEY counts (not rows), which is the cardinality of the key
    * space — switch the aggregation to `approx_percentile` past ~1e8
    * distinct keys.
    */
  def keySkew(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_per_key"),
        round(avg(col("n")), 6).as("avg_per_key"),
        round(expr("percentile(n, 0.99D)"), 6).as("p99_per_key"),
        round(max(col("n")) / avg(col("n")), 6).as("skew_ratio"))

  /** Aggregate specifications [[saltedAgg]] knows how to decompose into a
    * mergeable partial + final pair. Only decomposable aggregates belong
    * here — a holistic aggregate (exact percentile) cannot be computed
    * through salting and is deliberately unrepresentable.
    */
  sealed trait SaltedAggSpec { def as: String }
  object SaltedAggSpec {
    /** `count(*)` → partial counts, final sum. */
    case class Count(as: String) extends SaltedAggSpec
    /** `sum(valueCol)` → partial sums, final sum. */
    case class Sum(valueCol: String, as: String) extends SaltedAggSpec
    case class Min(valueCol: String, as: String) extends SaltedAggSpec
    case class Max(valueCol: String, as: String) extends SaltedAggSpec
    /** `avg(valueCol)` → partial (sum, count), final sum/sum — never an
      * average of averages (that would weight salt buckets equally).
      */
    case class Avg(valueCol: String, as: String) extends SaltedAggSpec
    /** Exact `count(DISTINCT valueCol)`: the salt is REQUIRED to be the
      * hash of the value, so each distinct value lands in exactly one
      * salt bucket — per-bucket distinct sets are disjoint and the final
      * stage just sums their sizes. This is the spec that makes salting
      * more than a convenience: a hot key's distinct-set buffer never
      * assembles on one task.
      */
    case class DistinctCount(valueCol: String, as: String) extends SaltedAggSpec
  }

  /** Two-stage salted aggregation for skewed group keys — the REMEDY for
    * what [[keySkew]] measures: stage 1 aggregates on (key, salt) with
    * `nSalts` deterministic hash-salt buckets, stage 2 merges the partial
    * buffers on the key alone. The hot key's work spreads across up to
    * `nSalts` stage-1 reduce tasks; stage 2 only ever sees `nSalts` small
    * partial rows per key.
    *
    * When this matters at 100 TB — be precise, because for plain
    * algebraic aggregates (sum/count/min/max/avg) Spark's map-side
    * partial aggregation already bounds the reduce input to one partial
    * row per (key, map partition), and salting buys little:
    *  - buffer-shaped aggregates: an exact distinct-count's partial
    *    state is the distinct SET, so a hot key concentrates its whole
    *    value set on one reduce task regardless of map-side combine —
    *    [[SaltedAggSpec.DistinctCount]] salts by value hash, making the
    *    per-bucket sets disjoint and each bounded by |distinct|/nSalts;
    *  - map-side combine degradation: under memory pressure the
    *    hash-aggregate falls back to sort-based spill on exactly the
    *    partitions a hot key floods; pre-splitting the key keeps every
    *    stage-1 group under ~rows/nSalts;
    *  - AQE does NOT split skewed aggregation partitions (its skew
    *    handling is join-only) — a salted plan is the only way to bound
    *    the reduce task for a pathological key without changing the
    *    final result.
    *
    * The salt is `hash(distinct-value)` when a DistinctCount spec is
    * present (correctness requires it — at most one distinct column per
    * call), else the concatenation of the referenced value columns;
    * Count-only specs (no value column at all) REJECT without an explicit
    * `saltOn` — a constant salt is one bucket, i.e. no spread for an
    * extra exchange. A caveat either way: if the salt source is constant
    * within the hot key, rows cannot spread; pass `saltOn` with a
    * row-discriminating expression (an event id, a timestamp) for those
    * shapes.
    *
    * Results are identical to the unsalted `groupBy(key).agg(...)` (the
    * merge functions are exact, not approximate) — pinned by the unit
    * parity test and the driver row's full DuckDB oracle.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      specs: Seq[SaltedAggSpec],
      nSalts: Int = 32,
      saltOn: Option[Column] = None,
  ): DataFrame = {
    import SaltedAggSpec._
    require(keyCols.nonEmpty, "need at least one key column")
    require(specs.nonEmpty, "need at least one aggregate")
    require(nSalts >= 2, "nSalts must be >= 2 (1 salt is just groupBy)")
    val distinctCols = specs.collect { case DistinctCount(v, _) => v }.distinct
    require(distinctCols.size <= 1,
      s"at most one DistinctCount column per call (distinct sets must be " +
        s"disjoint across salt buckets), got ${distinctCols.mkString(", ")}")
    require(distinctCols.isEmpty || saltOn.isEmpty,
      "DistinctCount requires the salt to be the value hash; saltOn cannot override it")
    val saltSource: Column = distinctCols.headOption.map(col).orElse(saltOn).getOrElse {
      val valueCols = specs.collect {
        case Sum(v, _) => v; case Min(v, _) => v; case Max(v, _) => v; case Avg(v, _) => v
      }.distinct
      // Count-only specs have NO value column to salt on: hash of a
      // constant is one bucket — zero spread at the cost of an extra
      // exchange. Unrepresentable, like the other degenerate configs.
      require(valueCols.nonEmpty,
        "Count-only specs cannot spread (no value column to salt on); " +
          "pass saltOn = Some(<row-discriminating expression>, e.g. an " +
          "event id or timestamp)")
      concat_ws("\u0001", valueCols.map(c => col(c).cast("string")): _*)
    }
    val salt = pmod(Sample.saltedHash(saltSource, "salted-agg"), lit(nSalts.toLong))
    // stage 1: partial buffers per (key, salt)
    val partials = specs.zipWithIndex.flatMap {
      case (Count(_), i) => Seq(count(lit(1)).as(s"__p${i}_n"))
      case (Sum(v, _), i) => Seq(sum(col(v)).as(s"__p${i}_s"))
      case (Min(v, _), i) => Seq(min(col(v)).as(s"__p${i}_m"))
      case (Max(v, _), i) => Seq(max(col(v)).as(s"__p${i}_m"))
      case (Avg(v, _), i) => Seq(sum(col(v)).as(s"__p${i}_s"), count(col(v)).as(s"__p${i}_n"))
      case (DistinctCount(v, _), i) => Seq(countDistinct(col(v)).as(s"__p${i}_d"))
    }
    val stage1 = df
      .groupBy((keyCols.map(col) :+ salt.as("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    // stage 2: merge the partials per key
    val finals = specs.zipWithIndex.map {
      case (Count(as), i) => sum(col(s"__p${i}_n")).as(as)
      case (Sum(_, as), i) => sum(col(s"__p${i}_s")).as(as)
      case (Min(_, as), i) => min(col(s"__p${i}_m")).as(as)
      case (Max(_, as), i) => max(col(s"__p${i}_m")).as(as)
      case (Avg(_, as), i) =>
        (sum(col(s"__p${i}_s")) / sum(col(s"__p${i}_n"))).as(as)
      case (DistinctCount(_, as), i) => sum(col(s"__p${i}_d")).as(as)
    }
    stage1.groupBy(keyCols.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Per-group cardinality with BOTH the exact count and the
    * HyperLogLog++ estimate (`approx_count_distinct` at relative standard
    * deviation `rsd`), plus the realized relative error — the honesty
    * meter for the sketch the 100 TB configuration actually runs.
    *
    * At scale the exact side is the expensive one (COUNT DISTINCT
    * shuffles every distinct value; HLL shuffles one ~`1.04/rsd²`-byte
    * sketch per group with map-side merge) — production pipelines run
    * [[approxDistinct]] on a sample or ONE validation slice to pick
    * `rsd`, then drop to `exact = false` for the full corpus. Both
    * aggregates compute in one pass / one shuffle here; `exact = false`
    * omits the exact column and the error, leaving the pure-sketch plan.
    * When `keyCol` is a WIDE column (document text), pass its digest
    * instead — the distinct shuffle then moves 16-byte hashes, not
    * payloads, and the count is identical up to md5 collisions.
    */
  /** Fixed-width histogram of a numeric column, optionally per group:
    * bin `i` covers `[origin + i·width, origin + (i+1)·width)` — the
    * distribution profile behind packing/chunking decisions ("how long
    * are my documents") at a cost [[keySkew]]'s exact percentiles can't
    * match at scale: ONE map-side-combined aggregation on (group, bin),
    * output bounded by bins×groups regardless of corpus size. Null
    * values are excluded. Empty bins are absent (a 100 TB histogram over
    * a sparse range shouldn't materialize its gaps — densify driver-side
    * if needed). Returns (groupCols..., bin, lo, hi, n) ordered by bin.
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      width: Double,
      groupCols: Seq[String] = Nil,
      origin: Double = 0.0,
  ): DataFrame = {
    require(width > 0, "width must be positive")
    val bin = floor((col(valueCol).cast("double") - origin) / width).cast("long")
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", lit(origin) + col("bin") * width)
      .withColumn("hi", lit(origin) + (col("bin") + 1) * width)
      .select((groupCols.map(col) ++ Seq(col("bin"), col("lo"), col("hi"), col("n"))): _*)
  }

  /** Multi-class confusion matrix: row counts per (actual, predicted)
    * pair plus each cell's share of its actual class (the per-class
    * recall decomposition) — the evaluation companion to categorical
    * predictors like [[TextOps.languageId]]. One map-side-combined
    * aggregation on the label pair; output bounded by |classes|², so
    * driver-sized at any corpus size. Null labels on either side are
    * excluded (same rule as [[binaryEval]]). A window over the
    * |classes|²-row aggregate (not the corpus) computes the shares.
    */
  def confusionMatrix(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val counts = df
      .filter(actual.isNotNull && predicted.isNotNull)
      .groupBy(actual.as("actual"), predicted.as("predicted"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("actual"))
    counts.withColumn("share_of_actual",
      round(col("n").cast("double") / sum(col("n")).over(w), 6))
  }

  /** Binary-classifier evaluation in one aggregation pass: confusion
    * counts (tp/fp/fn/tn) plus accuracy, precision, recall, and F1 —
    * the in-engine scorecard for gates like the trained
    * [[Embeddings.linearScore]] model ("how well does score > 0 track
    * the label on a held-out slice"). Rows where either side is null are
    * excluded (no silent coercion of missing predictions to `false`);
    * zero-denominator ratios are null, not NaN. One map-side-combined
    * global aggregation — a single driver-sized row at any corpus size.
    * Every term is plain integer/double arithmetic: full SQL oracle.
    */
  def binaryEval(df: DataFrame, actual: Column, predicted: Column): DataFrame =
    binaryEvalByGroup(df, actual, predicted, Nil)

  /** [[binaryEval]] sliced by group columns — "precision/recall per
    * source/language/shard", the scorecard view that localizes WHERE a
    * gate misbehaves rather than averaging it away. Same null-exclusion
    * and null-ratio rules; one aggregation, |groups| driver-sized rows.
    */
  def binaryEvalByGroup(
      df: DataFrame,
      actual: Column,
      predicted: Column,
      groupCols: Seq[String],
  ): DataFrame = {
    val a = actual
    val p = predicted
    df.filter(a.isNotNull && p.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(a && p, 1L).otherwise(0L)).as("tp"),
        sum(when(!a && p, 1L).otherwise(0L)).as("fp"),
        sum(when(a && !p, 1L).otherwise(0L)).as("fn"),
        sum(when(!a && !p, 1L).otherwise(0L)).as("tn"))
      .select(
        (groupCols.map(col) ++ Seq(
        col("tp"), col("fp"), col("fn"), col("tn")) ++ confusionMetrics): _*)
  }

  /** The guarded accuracy/precision/recall/F1 block over `tp fp fn tn`
    * columns — ONE definition of the zero-denominator convention
    * (undefined → null) and the 6-dp rounding, shared by
    * [[binaryEvalByGroup]] and [[thresholdSweep]].
    */
  private def confusionMetrics: Seq[Column] = Seq(
    round((col("tp") + col("tn")).cast("double") /
      (col("tp") + col("fp") + col("fn") + col("tn")), 6).as("accuracy"),
    round(when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp"))), 6).as("precision"),
    round(when(col("tp") + col("fn") > 0,
      col("tp").cast("double") / (col("tp") + col("fn"))), 6).as("recall"),
    round(when(col("tp") * 2 + col("fp") + col("fn") > 0,
      (col("tp") * 2).cast("double") / (col("tp") * 2 + col("fp") + col("fn"))), 6)
      .as("f1"))

  /** Operating-point sweep for a SCORED binary classifier: confusion
    * counts and accuracy/precision/recall/F1 of `score >= t` against the
    * boolean label, for every candidate threshold — the
    * threshold-selection scorecard run before freezing a quality-filter
    * cutoff. Rows with a null label or score are excluded (zero-token
    * documents have no defined score).
    *
    * ONE corpus scan: all thresholds' TP/FP/FN/TN are conditional sums
    * inside a single map-side-combined aggregation (a 1-row frame),
    * unpivoted to |thresholds| driver-sized rows with `stack` — the
    * corpus is never shuffled and never scanned per threshold.
    */
  def thresholdSweep(
      df: DataFrame,
      label: Column,
      score: Column,
      thresholds: Seq[Double],
  ): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    // project ONCE before anything references them: the label/score
    // expressions would otherwise be re-evaluated inside every
    // conditional sum (4 × |thresholds| copies of e.g. a classifier
    // scoring expression)
    val base = labeledScores(df, label, score)
    val y = col("__y"); val s = col("__s")
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(y && s >= t, 1L).otherwise(0L)).as(s"tp_$i"),
        sum(when(!y && s >= t, 1L).otherwise(0L)).as(s"fp_$i"),
        sum(when(y && s < t, 1L).otherwise(0L)).as(s"fn_$i"),
        sum(when(!y && s < t, 1L).otherwise(0L)).as(s"tn_$i"))
    }
    val wide = base.agg(aggs.head, aggs.tail: _*)
    val stackArgs = thresholds.zipWithIndex
      .map { case (t, i) =>
        s"CAST(${java.lang.Double.toString(t)} AS DOUBLE), tp_$i, fp_$i, fn_$i, tn_$i"
      }
      .mkString(", ")
    wide
      .selectExpr(s"stack(${thresholds.length}, $stackArgs) " +
        "AS (threshold, tp, fp, fn, tn)")
      .select(
        (Seq(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn")) ++
          confusionMetrics): _*)
  }

  /** EXACT ROC-AUC of a scored binary classifier — the rank statistic
    * (Mann–Whitney U with average-rank tie correction):
    * `AUC = (Σ_pos avgRank(score) − nPos(nPos+1)/2) / (nPos · nNeg)`,
    * the probability a random positive outscores a random negative
    * (ties count ½). One row out: `(n_pos, n_neg, auc)`; null AUC when
    * either class is empty. Null labels/scores excluded.
    *
    * Scale shape: rows collapse to one frame row per DISTINCT score
    * (map-side-combined count/pos sums), and only that frame sees the
    * ordered cumulative window. With scores rounded to 6 dp (the
    * engine-wide float convention) the distinct-score frame is bounded
    * (≤ a few million rows) regardless of corpus size — the
    * single-partition window is [[graft.ops.Sample.epochAllocation]]'s
    * bounded-frame pattern, never a corpus-wide sort.
    */
  /** (__y, __s) with nulls dropped — label/score expressions evaluated
    * exactly once per row (a classifier score is an expensive
    * expression; filtering on the raw expressions would double it).
    */
  private def labeledScores(df: DataFrame, label: Column, score: Column): DataFrame =
    df.select(label.as("__y"), score.as("__s"))
      .filter(col("__y").isNotNull && col("__s").isNotNull)

  /** Calibration (reliability) bins of a scored binary classifier:
    * `bins` equal-width score bins over `[lo, hi)` (out-of-range scores
    * clamp into the edge bins, so every row is counted), each reporting
    * `(bin, n, mean_score, frac_pos)` — a well-calibrated scorer has
    * `frac_pos ≈ mean_score` per bin; systematic gaps mean the score is
    * not usable as a probability and a threshold chosen on held-out
    * data ([[thresholdSweep]]) shifts on the production mix. Null
    * labels/scores excluded. ONE map-side-combined aggregation, output
    * ≤ `bins` rows (empty bins emit nothing).
    */
  def calibrationBins(
      df: DataFrame,
      label: Column,
      score: Column,
      bins: Int = 10,
      lo: Double = 0.0,
      hi: Double = 1.0,
  ): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    require(hi > lo, "hi must exceed lo")
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((col("__s") - lit(lo)) / lit(width)), lit(0.0)), lit(bins - 1.0))
      .cast("int")
    labeledScores(df, label, score)
      .groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("__s")), 6).as("mean_score"),
        round(avg(when(col("__y"), 1.0).otherwise(0.0)), 6).as("frac_pos"))
  }

  /** Expected Calibration Error over [[calibrationBins]]' ROUNDED bin
    * stats (deterministic across engines by construction):
    * `ECE = Σ_b (n_b / N) · |frac_pos_b − mean_score_b|`, plus the max
    * per-bin gap. One row: `(n, n_bins, ece, max_gap)`, 6 dp — the
    * scalar honesty meter for "can this score gate at probability p".
    */
  def expectedCalibrationError(
      df: DataFrame,
      label: Column,
      score: Column,
      bins: Int = 10,
      lo: Double = 0.0,
      hi: Double = 1.0,
  ): DataFrame = {
    val gap = abs(col("frac_pos") - col("mean_score"))
    calibrationBins(df, label, score, bins, lo, hi)
      .agg(
        sum(col("n")).as("n"),
        count(lit(1)).as("n_bins"),
        round(sum(col("n").cast("double") * gap) / sum(col("n")), 6).as("ece"),
        round(max(gap), 6).as("max_gap"))
  }

  def rocAuc(df: DataFrame, label: Column, score: Column): DataFrame = {
    val base = labeledScores(df, label, score)
    val byScore = base.groupBy(col("__s"))
      .agg(
        count(lit(1)).as("__cnt"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore
      .withColumn("__below", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .withColumn("__avg_rank",
        col("__below") + (col("__cnt") + lit(1.0)) / lit(2.0))
    ranked
      .agg(
        sum(col("__pos")).as("__np"),
        sum(col("__cnt") - col("__pos")).as("__nn"),
        sum(col("__pos") * col("__avg_rank")).as("__rs"))
      .select(
        col("__np").as("n_pos"),
        col("__nn").as("n_neg"),
        round(when(col("__np") > 0 && col("__nn") > 0,
          (col("__rs") - col("__np") * (col("__np") + lit(1.0)) / lit(2.0)) /
            (col("__np") * col("__nn"))), 6).as("auc"))
  }

  /** Average precision — the PR-space summary for IMBALANCED gates
    * (where ROC-AUC flatters): the step integral
    * `AP = Σ_k (R_k − R_{k−1}) · P_k` over distinct score thresholds
    * descending (ties share a threshold; the scikit-learn
    * `average_precision_score` convention). Since
    * `R_k − R_{k−1} = pos_k / nPos`, AP reduces to
    * `Σ_k pos_k · P_k / nPos` — no totals join needed. One row out:
    * `(n_pos, n_neg, average_precision)`, null when no positives.
    * Same bounded distinct-rounded-score frame as [[rocAuc]].
    */
  def averagePrecision(df: DataFrame, label: Column, score: Column): DataFrame = {
    val base = labeledScores(df, label, score)
    val byScore = base.groupBy(col("__s"))
      .agg(
        count(lit(1)).as("__cnt"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("__cumcnt", sum(col("__cnt")).over(w))
      .withColumn("__cumpos", sum(col("__pos")).over(w))
      .agg(
        sum(col("__pos")).as("__np"),
        sum(col("__cnt") - col("__pos")).as("__nn"),
        sum(col("__pos") * col("__cumpos").cast("double") / col("__cumcnt"))
          .as("__s_ap"))
      .select(
        col("__np").as("n_pos"),
        col("__nn").as("n_neg"),
        round(when(col("__np") > 0, col("__s_ap") / col("__np")), 6)
          .as("average_precision"))
  }

  def approxDistinct(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      rsd: Double = 0.05,
      exact: Boolean = true,
  ): DataFrame = {
    require(rsd > 0 && rsd < 1, "rsd must be in (0, 1)")
    val g = df.groupBy(groupCols.map(col): _*)
    if (exact)
      g.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(keyCol)).as("n_distinct"),
        approx_count_distinct(col(keyCol), rsd).as("n_distinct_approx"))
        .withColumn("rel_err", round(
          abs(col("n_distinct_approx") - col("n_distinct")).cast("double") /
            greatest(col("n_distinct"), lit(1L)), 6))
    else
      g.agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col(keyCol), rsd).as("n_distinct_approx"))
  }
}
