package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Everything keys off a salted md5-derived hash rather than `rand()`:
  * at 100 TB a sample must be REPRODUCIBLE — the same rows survive a task
  * retry, a partition re-layout, or a full re-run (rand() gives none of
  * those), and a salt change gives a fresh independent sample. The hash is
  * the leading 60 bits of md5, bit-identical in DuckDB, so every operator
  * here has a true SQL oracle.
  */
object Sample {

  /** Salted 60-bit md5 hash of a key column (the shared
    * [[graft.functions.GraftFunctions.md5Long60]] derivation). Mirror:
    * `CAST('0x' || substr(md5(CAST(key AS VARCHAR) || '#' || salt), 1, 15) AS BIGINT)`.
    */
  def saltedHash(key: Column, salt: String): Column =
    graft.functions.GraftFunctions.md5Long60(
      concat(key.cast("string"), lit("#" + salt)).cast("binary"))

  /** Keep ~1/`oneIn` of the rows, chosen by the salted hash of `keyCol` —
    * a pure narrow filter (no shuffle, no state), evaluated at scan speed
    * and pushed into the scan where the source supports it. Deterministic:
    * the same (key, salt, oneIn) always selects the same rows, on any
    * cluster layout.
    */
  def sampleByHash(df: DataFrame, keyCol: String, oneIn: Int, salt: String = ""): DataFrame = {
    require(oneIn >= 1, "oneIn must be >= 1")
    df.filter(pmod(saltedHash(col(keyCol), salt), lit(oneIn.toLong)) === 0)
  }

  /** Keep approximately `fraction` of the rows (exactly: rows whose salted
    * hash lands under `fraction` of the modulus) — the arbitrary-weight
    * sibling of [[sampleByHash]], same determinism, same narrow-filter
    * plan. The million-bucket modulus quantizes the fraction to 1e-6,
    * which keeps the oracle integer-exact in both engines.
    */
  def sampleFraction(df: DataFrame, keyCol: String, fraction: Double, salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    val cut = math.round(fraction * 1000000L)
    df.filter(pmod(saltedHash(col(keyCol), salt), lit(1000000L)) < cut)
  }

  /** Weighted corpus mixture: deterministically down-sample each source to
    * its weight and union them under a `source` tag — the mixture step of
    * training-data preparation ("30% web, 50% books, …"). Each source
    * samples with its own salt (`salt#tag`), so mixtures over overlapping
    * or identical sources stay independent. Union is plan-level only
    * (no shuffle); every branch is a narrow hash filter at scan speed.
    * Sources must share a schema.
    */
  def mixCorpora(
      sources: Seq[(String, DataFrame, Double)], // (tag, df, fraction)
      keyCol: String,
      salt: String = "",
  ): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    sources.map { case (tag, df, fraction) =>
      sampleFraction(df, keyCol, fraction, s"$salt#$tag")
        .withColumn("source", lit(tag))
    }.reduce(_ unionByName _)
  }

  /** Rebalance one corpus to target group shares ("40% en, 20% each of
    * de/es/fr") by deterministic down-sampling: target the LARGEST
    * corpus achieving the mix — the scale is bounded by the scarcest
    * group (`c = min n_g / share_g`, which keeps that group in full),
    * every other group down-samples to match, and groups outside
    * `targets` are dropped. The per-group keep decision is the
    * salted-hash filter of [[sampleFraction]], so the resample is rerun-
    * and layout-stable and has a true SQL oracle (fractions quantized to
    * millionths; realized group sizes are hash-approximate around the
    * target, ±O(√n), exactly like [[sampleFraction]]).
    *
    * Scale shape: one tiny count aggregation (|groups| rows, collected —
    * group cardinality is driver-sized by definition here), then ONE
    * narrow hash filter over the corpus; no shuffle of data rows at any
    * scale. `groupCol` values are matched as strings. Every target group
    * must exist in the corpus (loud require, not a silent empty output).
    */
  def resampleToShares(
      df: DataFrame,
      groupCol: String,
      targets: Seq[(String, Double)],
      keyCol: String,
      salt: String = "",
  ): DataFrame = {
    require(targets.nonEmpty, "need at least one target share")
    require(targets.forall(_._2 > 0), "target shares must be positive")
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      s"target shares must sum to 1, got ${targets.map(_._2).sum}")
    val counts = df.groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { case (g, _) =>
      require(counts.contains(g) && counts(g) > 0,
        s"target group '$g' absent from the corpus")
    }
    // largest achievable resampled size with the exact mix
    val c = targets.map { case (g, t) => counts(g) / t }.min
    val cuts = targets.map { case (g, t) =>
      g -> math.floor(c * t / counts(g) * 1000000.0 + 0.5).toLong
    }
    val bucket = pmod(saltedHash(col(keyCol), salt), lit(1000000L))
    // per-group cut; untargeted groups get null → filter drops them
    val cutCol = cuts.foldLeft(lit(null).cast("long")) {
      case (acc, (g, cut)) =>
        when(col(groupCol).cast("string") === g, lit(cut)).otherwise(acc)
    }
    df.filter(bucket < cutCol)
  }

  /** Keep EXACTLY `n` rows (or every row, if the corpus is smaller),
    * chosen as the `n` smallest salted hashes — "give me exactly 10k
    * documents for the eval slice", where [[sampleFraction]]'s count is
    * only approximate. Deterministic and rerun-stable like every sampler
    * here; ties (hash collisions) break by `keyCol`.
    *
    * Scale shape: Spark plans the ORDER BY hash + LIMIT as
    * TakeOrderedAndProject — each partition forwards at most `n`
    * pre-sorted rows to one merge, no global sort, no full shuffle.
    * Memory on the merging task is O(n): right for eval/calibration
    * slices (up to ~millions), not for "half the corpus" — use
    * [[sampleFraction]] there.
    */
  def sampleExact(df: DataFrame, keyCol: String, n: Int, salt: String = ""): DataFrame = {
    require(n >= 1, "n must be >= 1")
    df.orderBy(saltedHash(col(keyCol), salt), col(keyCol)).limit(n)
  }

  /** Keep the top `k` rows of each group ranked by `orderCol` — "the N
    * best-scoring documents per language/domain", the merit-ranked
    * sibling of [[capPerGroup]]'s hash quota. `desc` ranks highest-first
    * (the default; `desc = false` keeps the smallest). Ties break by
    * `tieCol` ascending, so the result is deterministic whenever `tieCol`
    * is unique within a group (same precondition as [[capPerGroup]]).
    * Null `orderCol` values sort LAST in both directions — a null score
    * never beats a real one.
    *
    * Scale shape: one shuffle on the group key; the window streams each
    * group and emits at most `k` rows — never a global sort. The same
    * hot-group caveat as every per-group window applies (AQE skew
    * handling; output is bounded by k·|groups|).
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      k: Int,
      tieCol: String,
      desc: Boolean = true,
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(groupCols.nonEmpty, "need at least one group column")
    val ord = if (desc) col(orderCol).desc_nulls_last else col(orderCol).asc_nulls_last
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ord, col(tieCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Cap each group at `n` rows, keeping the `n` with the smallest salted
    * hash (ties by `keyCol`) — the standard per-source/per-domain quota in
    * corpus mixing ("at most N documents per domain"), made deterministic
    * and rerun-stable by hash ordering. PRECONDITION: `keyCol` must be
    * unique within each group — rows sharing a key value have identical
    * sort keys and `row_number` would pick among them arbitrarily. One shuffle on the group key; the
    * window streams each group and emits at most `n` rows per group. A
    * pathologically hot group concentrates on one task — the same caveat
    * as any per-group window; AQE's skew handling and the bounded output
    * keep it survivable at the quota sizes this is meant for.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      n: Int,
      salt: String = "",
  ): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(saltedHash(col(keyCol), salt), col(keyCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }

  /** Token-budget quota per group: keep a hash-ordered prefix of each
    * group's rows whose cumulative `tokenCol` stays within `budget` —
    * corpus mixing when the recipe is written in tokens, not documents
    * ("at most 1B tokens per source"). The row-count sibling is
    * [[capPerGroup]]; determinism and rerun-stability come from the same
    * salted-hash ordering (ties by `keyCol`, same uniqueness
    * PRECONDITION).
    *
    * A row is kept iff the tokens BEFORE it (in hash order) are under the
    * budget, so each group fills to at least `budget` and may overrun by
    * up to one row — the [[TextOps.packChunks]] contract, which also
    * guarantees a group's largest-first document can't starve it. One
    * shuffle on the group key; the running sum streams each group.
    * Rows with a null `tokenCol` count as 0 tokens — kept for free while
    * the group's budget is still open, but once the cumulative sum
    * reaches `budget` they are cut off like any other row (missing token
    * metadata does not exempt a row from the quota).
    *
    * SKEW note (shared with [[Joins.asofJoin]]): the window partitions by
    * the group, so one giant group funnels through one task — linear work
    * (sort + running sum), a straggler rather than a blow-up. Check
    * [[Stats.keySkew]] and split oversized sources upstream when the top
    * group dominates the corpus.
    */
  def capTokensPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      tokenCol: String,
      budget: Long,
      salt: String = "",
  ): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val tok = coalesce(col(tokenCol), lit(0L))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(saltedHash(col(keyCol), salt), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tok).over(w))
      .filter(col("__cum") - tok < budget)
      .drop("__cum")
  }

  /** Per-group quantile gate: keep rows whose `valueCol` sits at/above
    * the group's q-quantile — "keep the top (1−q) fraction by quality /
    * length / LM score per language (or source)", the relative-threshold
    * curation knob that absolute gates ([[Curate.curate]]'s fixed
    * minQuality) can't express when score distributions differ per group.
    *
    * Scale shape: cutoffs-then-compare, the [[Lm.perplexityBuckets]]
    * discipline — one grouped percentile aggregation produces a
    * groups-sized cutoff frame (languages/sources: driver-sized by
    * construction) that broadcast-joins back for a narrow filter; no
    * global sort, no per-group window over the corpus. `exact = false`
    * flips to `approx_percentile` for bounded reducer memory at 100 TB
    * (same plan otherwise). Null values never pass the gate (and never
    * contribute to cutoffs); null GROUP KEYS are ordinary groups (the
    * join is null-safe `<=>`).
    */
  def keepAboveQuantile(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      q: Double,
      exact: Boolean = true,
  ): DataFrame = {
    require(q > 0.0 && q < 1.0, "q must be in (0, 1)")
    val fn = if (exact) "percentile" else "approx_percentile"
    val cuts = broadcast(
      df.groupBy(col(groupCol).as("__g"))
        .agg(expr(s"$fn($valueCol, ${q}D)").as("__cut")))
    df.join(cuts, col(groupCol) <=> col("__g"))
      .filter(col(valueCol) >= col("__cut"))
      .select(df.columns.map(col): _*)
  }

  /** Temperature-scaled mixture weights: given the corpus's per-source
    * row counts, the sampling weight each source gets under temperature
    * `alpha` — `w(s) ∝ share(s)^alpha`, normalized to sum to 1. The
    * standard multi-source recipe knob (alpha = 1 keeps natural
    * proportions, alpha → 0 approaches uniform over sources, in between
    * up-weights small high-quality sources without flattening entirely).
    * Feed the output straight into [[mixCorpora]] as per-source
    * fractions scaled to a token budget.
    *
    * One count shuffle; the per-source frame is #sources rows (driver-
    * sized by construction), so the normalizing total broadcasts.
    */
  def temperatureWeights(
      df: DataFrame,
      srcCol: String,
      alpha: Double,
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(pow(col("n_rows"), alpha)).as("__z"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("weight", round(pow(col("n_rows"), alpha) / col("__z"), 6))
      .drop("__z")
  }

  /** Deterministic train/validation/test split: every row gets a `split`
    * tag from the salted hash of its key — a pure projection (no shuffle,
    * no sampling job), reproducible across reruns, retries, and partition
    * layouts, and STABLE UNDER CORPUS GROWTH: a row's assignment depends
    * only on (key, salt), so adding documents never migrates existing
    * ones between splits (the property rand-based splits lack that makes
    * them leak eval data across training runs).
    *
    * `weights` are (tag, weight) pairs; weights must be positive and sum
    * to ≤ 1 + 1e-9 (quantized to millionths — the [[sampleFraction]]
    * modulus, integer-exact in both engines). Rows whose hash bucket
    * falls past the last cut (when weights sum < 1) get tag `rest`.
    */
  def splitByHash(
      df: DataFrame,
      keyCol: String,
      weights: Seq[(String, Double)],
      salt: String = "",
      rest: String = "rest",
  ): DataFrame = {
    require(weights.nonEmpty, "need at least one split")
    require(weights.forall(_._2 > 0), "weights must be positive")
    val cuts = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * 1000000L)
    }.tail
    require(cuts.last <= 1000000L, "weights must sum to <= 1")
    // a weight under 5e-7 quantizes to a ZERO-width bucket: the split tag
    // would silently never be assigned — reject rather than surprise
    require(cuts.zip(0L +: cuts.init).forall { case (hi, lo) => hi > lo },
      "every weight must quantize to a non-zero number of millionths " +
        s"(i.e. be >= 5e-7): ${weights.mkString(", ")}")
    val bucket = pmod(saltedHash(col(keyCol), salt), lit(1000000L))
    // build the CASE from the last cut backwards so the FIRST matching
    // cut wins: bucket < cut_i → tag_i
    val assigned = weights.zip(cuts).reverse.foldLeft(lit(rest)) {
      case (fallthrough, ((t, _), cut)) => when(bucket < cut, lit(t)).otherwise(fallthrough)
    }
    df.withColumn("split", assigned)
  }

  /** Deterministic global shuffle for training order: assign every row a
    * (shard, pos) address in a salted-hash permutation of the corpus —
    * the "shuffle once before training" step that breaks source/crawl
    * locality so consecutive training sequences are decorrelated. Reading
    * shards in order, each sorted by `pos`, replays one fixed pseudorandom
    * permutation; a new `salt` gives an independent one, and (like every
    * operator here) a task retry or re-run reproduces it exactly —
    * `rand()`-based shuffles give none of that.
    *
    * Scale shape: shard = hash mod `nShards` is a narrow projection; the
    * only wide step is ONE hash-partition-by-shard + per-shard sort (the
    * window never spans shards). Size `nShards` so a shard fits an
    * executor's sort budget (at 100 TB, nShards = 100k → ~1 GB shards) —
    * the global-sort alternative range-partitions by sampling, which is
    * neither deterministic nor cheaper. Rows with a null `keyCol` hash to
    * null and collect in a null shard (key the corpus by a non-null id);
    * duplicate keys get adjacent `pos` values, tie-broken by `keyCol` for
    * layout determinism.
    *
    * Returns the input columns + (shard: int, pos: long), pos starting at
    * 0 within each shard.
    */
  def shuffleOrder(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      salt: String = "",
  ): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val h = saltedHash(col(keyCol), salt)
    val shard = pmod(h, lit(nShards.toLong)).cast("int")
    df.withColumn("__h", h)
      .withColumn("shard", shard)
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol)))
          .cast("long") - 1L)
      .drop("__h")
  }

  /** Token-budget epoch allocation — the data-constrained-scaling
    * question ("Scaling Data-Constrained Language Models", Muennighoff
    * et al. 2023): given a total training token budget, per-source
    * target weights, and a repetition cap, how many tokens (epochs) of
    * each source should the mixture draw? Proportional-to-weight
    * allocation with per-source capacity caps `cap = maxEpochs × tokens`
    * is the water-filling problem `alloc_i = min(cap_i, λ·w_i)` with λ
    * set so the allocations sum to `min(budget, Σcap)`. λ has a closed
    * form once sources are sorted by saturation point `r = cap/w`: a
    * source saturates iff the budget needed to saturate it given every
    * earlier source saturated — `prefixCap(before) + r·suffixW(from)` —
    * fits the budget (monotone in r, so the flag splits the sorted frame
    * in two), and λ is the remaining budget over the unsaturated weight.
    *
    * Scale shape: ONE corpus-scale aggregation (groupBy source, sum of
    * tokens — map-side combined), then every window below runs on the
    * |sources|-row aggregate: the single-partition WindowExec this plans
    * is bounded by source cardinality (dozens-to-hundreds), never by
    * corpus size. Everything stays declarative — full SQL oracle, and
    * all arithmetic is exact-integer sums + identical-operand double
    * ops, so the oracle matches bit-for-bit.
    *
    * `weight` and `tokens` are per-row expressions; weight must be
    * constant within a source (the per-source value is taken as `max`)
    * and positive — nonpositive/null-weight or zero-token sources are
    * dropped from the allocation. Output per source: total tokens,
    * weight, capacity, allocated tokens, epochs (= alloc/tokens ≤
    * maxEpochs), and the saturation flag.
    */
  def epochAllocation(
      docs: DataFrame,
      sourceCol: String,
      tokens: Column,
      weight: Column,
      budgetTokens: Double,
      maxEpochs: Double,
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val per = docs
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(tokens).cast("double").as("tokens"),
        max(weight).cast("double").as("w"))
      .filter(col("tokens") > 0 && col("w") > 0)
      .withColumn("cap", lit(maxEpochs) * col("tokens"))
      .withColumn("r", col("cap") / col("w"))
    val bySat = Window.orderBy(col("r"), col("source"))
    val whole = Window.partitionBy()
    per
      .withColumn("pre_cap", coalesce(
        sum(col("cap")).over(bySat.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .withColumn("suf_w",
        sum(col("w")).over(bySat.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("budget",
        least(lit(budgetTokens), sum(col("cap")).over(whole)))
      .withColumn("saturated",
        col("pre_cap") + col("r") * col("suf_w") <= col("budget"))
      .withColumn("sat_cap", coalesce(
        sum(when(col("saturated"), col("cap"))).over(whole), lit(0.0)))
      .withColumn("unsat_w",
        sum(when(!col("saturated"), col("w"))).over(whole))
      .withColumn("lambda",
        when(col("unsat_w") > 0, (col("budget") - col("sat_cap")) / col("unsat_w")))
      .withColumn("alloc_tokens",
        round(when(col("saturated"), col("cap")).otherwise(col("lambda") * col("w")), 6))
      .withColumn("epochs", round(col("alloc_tokens") / col("tokens"), 6))
      .select(col("source"), col("tokens").cast("long").as("tokens"),
        col("w").cast("int").as("weight"), col("cap"),
        col("alloc_tokens"), col("epochs"), col("saturated"))
  }

  /** Materialize an [[epochAllocation]] into the realized training mix:
    * each source's rows appear `floor(epochs)` times in full plus a
    * salted-hash sample of the fractional remainder, every copy tagged
    * with an `epoch` index (0-based) so the downstream [[shuffleOrder]]
    * can address copies independently. Fractions quantize to millionths —
    * the same contract as [[resampleToShares]], so the fractional pick
    * has a true SQL oracle and is rerun/layout/retry-stable; the
    * fractional epoch's salt folds in the epoch index, keeping its pick
    * independent of any other sample drawn from the same keys.
    *
    * Scale shape: the allocation table is |sources|-sized and broadcast;
    * the explode multiplies each row by its source's ⌈epochs⌉ — that
    * multiplication IS the requested output (the training set), not
    * overhead — and the fractional filter is the usual narrow hash
    * predicate. No shuffle anywhere.
    */
  def expandEpochs(
      docs: DataFrame,
      sourceCol: String,
      keyCol: String,
      allocation: DataFrame, // (source, epochs, …) as produced by epochAllocation
      salt: String = "",
  ): DataFrame = {
    val alloc = allocation
      .select(col("source").as("__src"), col("epochs").as("__epochs"))
    val joined = docs.join(
      broadcast(alloc), col(sourceCol).cast("string") === col("__src"), "inner")
    val full = floor(col("__epochs")).cast("int")
    val frac = col("__epochs") - floor(col("__epochs"))
    val cut = floor(frac * 1000000.0 + 0.5).cast("long")
    joined
      .withColumn("epoch", explode(sequence(lit(0), full)))
      .filter(col("epoch") < full ||
        pmod(saltedHash(concat(col(keyCol).cast("string"), lit("@e"),
          col("epoch").cast("string")), salt), lit(1000000L)) < cut)
      .drop("__src", "__epochs")
  }
}
