package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling — the DSIR recipe (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023, arXiv:2302.03169): represent every document as a bag of
  * HASHED n-grams (unigrams + bigrams bucketed into `B` hash buckets),
  * fit smoothed bucket distributions on a small TARGET corpus (the
  * distribution you want more of) and on the RAW corpus (what you have),
  * score each raw document by its importance log-weight
  * `sum log2(p_target(bucket) / p_raw(bucket))` over its n-gram
  * occurrences, and resample without replacement with Gumbel top-k so
  * the selected set is a draw from the importance-weighted distribution
  * rather than a hard threshold.
  *
  * Everything is deterministic and md5-derived (the
  * [[graft.functions.GraftFunctions.md5Long60]] convention shared with
  * the fingerprint/multimodal ops), so a DuckDB oracle recomputes
  * weights, Gumbel keys, and the selected set bit-for-bit — including
  * the "randomness", which comes from hashing a seed with the document
  * id instead of an RNG.
  *
  * Scale shape (100 TB): the bucket tables are at most `B` rows
  * (default 2048 — the paper uses 10k; collisions are part of the
  * method, not a defect), so the model side is always broadcast-sized
  * regardless of corpus size. Scoring is one explode + one broadcast
  * join + one map-side-combinable per-document sum — a single shuffle
  * keyed by the document id. Resampling is a TakeOrdered top-k, never a
  * global sort. Driver state is bounded by `B` doubles. The initial
  * physical plan repeats the model's bucket-count subtrees (ratios and
  * totals share lineage); the identical count shuffles are deduplicated
  * at runtime by AQE exchange-stage reuse, which
  * [[graft.SparkEntry.session]] pins on — the corpora are NOT scanned
  * once per repeated subtree.
  */
object Dsir {

  /** Bucketed n-gram (unigram + bigram) occurrences of a text column:
    * `array<long>` of hash buckets in `[0, buckets)`, multiplicity
    * preserved. Tokenization is the shared lowercase-alnum
    * [[TextOps.tokens]]; bigrams are the 2-token shingles of
    * [[graft.functions.GraftFunctions.wordShingles]] (space-joined, the
    * same convention the MinHash/decontamination oracles already pin
    * against DuckDB). Requires `GraftFunctions.register` (callers below
    * do it).
    */
  def hashedNgramBuckets(text: Column, buckets: Int): Column = {
    val ngrams = concat(
      TextOps.tokens(text),
      graft.functions.GraftFunctions.wordShingles(text, 2))
    transform(ngrams, g =>
      pmod(graft.functions.GraftFunctions.md5Long60(g.cast("binary")), lit(buckets.toLong)))
  }

  /** Hashed n-gram bucket counts over a corpus: one row per OCCUPIED
    * bucket (≤ `buckets` rows — broadcast-sized by construction). One
    * explode + one map-side-combinable count shuffle.
    */
  def bucketCounts(corpus: DataFrame, textCol: String, buckets: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    corpus
      .select(explode(hashedNgramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-occupied-bucket importance log-ratio table plus the scalar
    * frame of totals: returns `(ratios, scalars)` where `ratios` is
    * `(bucket, log_ratio)` over buckets occupied in EITHER corpus and
    * `scalars` is one row `(dsir_n_target, dsir_n_raw, dsir_default)` —
    * `dsir_default` being the log-ratio of a bucket unseen in both
    * corpora (`log2((Nr + aB) / (Nt + aB))`), which scoring applies to
    * any bucket outside the table. Smoothing is add-`alpha` over the
    * full `B` buckets: `p(b) = (c_t(b) + a) / (N_t + aB)`.
    */
  def logRatios(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int,
      alpha: Double = 1.0,
  ): (DataFrame, DataFrame) = {
    require(buckets >= 2, "buckets must be >= 2")
    require(alpha > 0, "alpha must be > 0 (zero-count buckets need mass)")
    val tc = bucketCounts(target, textCol, buckets).withColumnRenamed("n", "ct")
    val rc = bucketCounts(raw, textCol, buckets).withColumnRenamed("n", "cr")
    val joined = tc.join(rc, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    ratiosFromCounts(joined, buckets, alpha)
  }

  /** [[logRatios]] for the target-is-a-slice-of-raw case (`targetPred`
    * marks the target rows INSIDE `raw`): both bucket-count tables come
    * out of ONE n-gram pass over the raw corpus — `cr` counts every
    * occurrence, `ct` counts the occurrences whose row satisfies the
    * predicate. Same math, same outputs as the two-corpus form; one
    * fewer corpus-scale hash pass. Prefer this whenever the target is a
    * labeled/filtered subset (quality slice, language slice, curated
    * flag); the two-corpus [[logRatios]] remains for an EXTERNAL target
    * corpus, where the target pass is small anyway.
    */
  def logRatiosSubset(
      raw: DataFrame,
      targetPred: Column,
      textCol: String,
      buckets: Int,
      alpha: Double = 1.0,
  ): (DataFrame, DataFrame) = {
    require(buckets >= 2, "buckets must be >= 2")
    require(alpha > 0, "alpha must be > 0 (zero-count buckets need mass)")
    graft.functions.GraftFunctions.register(raw.sparkSession)
    val joined = raw
      .select(targetPred.as("__is_t"),
        explode(hashedNgramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        count_if(col("__is_t")).as("ct"),
        count(lit(1)).as("cr"))
    ratiosFromCounts(joined, buckets, alpha)
  }

  /** Shared tail of [[logRatios]]/[[logRatiosSubset]]: smoothed
    * log-ratio table + scalar totals from a (bucket, ct, cr) frame.
    */
  private def ratiosFromCounts(
      joined: DataFrame,
      buckets: Int,
      alpha: Double,
  ): (DataFrame, DataFrame) = {
    val scalars = joined.agg(
      sum(col("ct")).cast("double").as("dsir_n_target"),
      sum(col("cr")).cast("double").as("dsir_n_raw"))
      .withColumn("dsir_default",
        log2((col("dsir_n_raw") + lit(alpha * buckets)) /
          (col("dsir_n_target") + lit(alpha * buckets))))
    val ratios = joined.crossJoin(broadcast(scalars))
      .select(col("bucket"),
        (log2((col("ct") + lit(alpha)) / (col("dsir_n_target") + lit(alpha * buckets))) -
          log2((col("cr") + lit(alpha)) / (col("dsir_n_raw") + lit(alpha * buckets))))
          .as("log_ratio"))
    (ratios, scalars)
  }

  /** Score `docs` against a prebuilt `(ratios, scalars)` model — the
    * shared scoring tail of the [[logWeights]] variants: explode →
    * broadcast ratio lookup → one per-id sum shuffle. Measured (r14):
    * delegating to [[logWeightsStream]]'s literal-table fold is ~1.8×
    * SLOWER here — `aggregate` over a lambda is a non-codegen
    * (interpreted) expression, so the per-n-gram md5 work leaves
    * whole-stage codegen and the explode/join/partial-agg pipeline wins
    * despite its exchange (which carries one pre-aggregated row per
    * document, not n-grams). The stream twin keeps the fold because a
    * streaming source cannot run the model-collect action lazily.
    */
  def logWeightsWith(
      docs: DataFrame,
      ratios: DataFrame,
      scalars: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int = 2048,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol), explode(hashedNgramBuckets(col(textCol), buckets)).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"), "left")
      .crossJoin(broadcast(scalars.select(col("dsir_default"))))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_ngrams"),
        round(sum(coalesce(col("log_ratio"), col("dsir_default"))), 6).as("log_weight"))
  }

  /** Per-document DSIR importance log-weight of `docs` under
    * target-vs-raw hashed n-gram models:
    * `(idCol, n_ngrams, log_weight)` with the weight rounded to 6 dp
    * (the shared float-oracle convention). Documents with zero n-grams
    * are dropped (no defined weight — the [[Lm]] explode convention).
    *
    * Plan: explode → broadcast-join the ≤`B`-row ratio table → one
    * per-id sum shuffle. The ratio table rides a broadcast, never a
    * shuffle.
    */
  def logWeights(
      docs: DataFrame,
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int = 2048,
      alpha: Double = 1.0,
  ): DataFrame = {
    val (ratios, scalars) = logRatios(target, raw, textCol, buckets, alpha)
    logWeightsWith(docs, ratios, scalars, textCol, idCol, buckets)
  }

  /** [[logWeights]] when the target is a predicate-marked slice of the
    * raw corpus: one n-gram pass builds both count tables
    * ([[logRatiosSubset]]), one scores — two corpus-scale hash passes
    * total instead of three. Identical output to
    * `logWeights(raw, raw.filter(targetPred), raw, …)`.
    */
  def logWeightsSubset(
      raw: DataFrame,
      targetPred: Column,
      textCol: String,
      idCol: String,
      buckets: Int = 2048,
      alpha: Double = 1.0,
  ): DataFrame = {
    val (ratios, scalars) = logRatiosSubset(raw, targetPred, textCol, buckets, alpha)
    logWeightsWith(raw, ratios, scalars, textCol, idCol, buckets)
  }

  /** Deterministic uniform in (0, 1) from a seed and an id column — the
    * md5-derived coin every sampling op in [[Sample]] uses, here at 6
    * decimal digits of resolution (ample for a top-k race; both engines
    * recompute it exactly).
    */
  private def hashUniform(seed: String, id: Column): Column =
    (pmod(graft.functions.GraftFunctions.md5Long60(
      concat(lit(seed), lit("#"), id.cast("string")).cast("binary")),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)

  /** Gumbel top-`n` importance resampling (without replacement): select
    * the `n` documents maximizing `log_weight + Gumbel(0,1)` where the
    * Gumbel noise `-ln(-ln(u))` comes from the deterministic per-id
    * uniform. Equivalent to sampling n docs without replacement with
    * probability proportional to their importance weights (Vieira,
    * "Gumbel-max trick and weighted reservoir sampling", 2014) — soft
    * selection, so near-target documents win often but the tail keeps
    * diversity, which is the point of DSIR over a hard threshold.
    *
    * Output: `(idCol, n_ngrams, log_weight, sample_key)` for the
    * selected docs, `sample_key` rounded to 6 dp. The top-k runs on the
    * UNROUNDED key with the id as a deterministic tiebreak (the uniform
    * has only 1e6 distinct values, so equal-weight documents — e.g.
    * pre-dedup duplicates — DO tie at corpus scale) as a TakeOrdered —
    * no global sort at any scale, same selected set on every rerun and
    * cluster layout.
    */
  def resample(
      docs: DataFrame,
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      buckets: Int = 2048,
      alpha: Double = 1.0,
      seed: String = "dsir",
  ): DataFrame = {
    resampleFrom(logWeights(docs, target, raw, textCol, idCol, buckets, alpha),
      idCol, n, seed)
  }

  /** [[resample]] on the subset path ([[logWeightsSubset]]'s one-pass
    * model build).
    */
  def resampleSubset(
      raw: DataFrame,
      targetPred: Column,
      textCol: String,
      idCol: String,
      n: Int,
      buckets: Int = 2048,
      alpha: Double = 1.0,
      seed: String = "dsir",
  ): DataFrame =
    resampleFrom(logWeightsSubset(raw, targetPred, textCol, idCol, buckets, alpha),
      idCol, n, seed)

  /** The Gumbel top-`n` race over a precomputed weights frame — shared
    * tail of the [[resample]] variants.
    */
  def resampleFrom(
      weights: DataFrame,
      idCol: String,
      n: Int,
      seed: String = "dsir",
  ): DataFrame = {
    require(n >= 1, "n must be >= 1")
    graft.functions.GraftFunctions.register(weights.sparkSession)
    val gumbel = -log(-log(hashUniform(seed, col(idCol))))
    weights
      .withColumn("sample_key_raw", col("log_weight") + gumbel)
      .orderBy(col("sample_key_raw").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col("n_ngrams"), col("log_weight"),
        round(col("sample_key_raw"), 6).as("sample_key"))
  }

  /** Streaming twin of [[logWeights]]: score an unbounded document
    * stream against a PRETRAINED ratio model — completely STATELESS.
    * The ≤`B`-row ratio table collects once at query-build time into a
    * dense `Array[Double]` literal indexed by bucket (the
    * [[Lm.unigramBitsStream]] trade, and cheaper: the model is
    * bounded by `B`, not by vocabulary), and each document scores in
    * one projection — n-gram fold via `aggregate`, no explode, no
    * streaming aggregation, no state store, any output mode. Works
    * identically on a batch frame (the parity test uses that).
    */
  def logWeightsStream(
      docs: DataFrame,
      ratios: DataFrame,
      scalars: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int = 2048,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val default = scalars.select(col("dsir_default")).collect()(0).getDouble(0)
    val table = Array.fill(buckets)(default)
    val rows = ratios
      .select(col("bucket").cast("long"), col("log_ratio").cast("double"))
      .collect()
    // Validate the persisted model against the caller's `buckets` the
    // way bm25Stream validates its stats store: a store trained with a
    // different B would otherwise throw AIOOBE (larger B) or silently
    // score the out-of-range tail with the default ratio (smaller B).
    val maxBucket = if (rows.isEmpty) -1L else rows.map(_.getLong(0)).max
    require(maxBucket < buckets,
      s"logWeightsStream: ratio store has bucket $maxBucket but buckets=$buckets — " +
        "the persisted model was trained with a different bucket count")
    rows.foreach(r => table(r.getLong(0).toInt) = r.getDouble(1))
    val tableLit = typedLit(table.toSeq)
    val bks = hashedNgramBuckets(col(textCol), buckets)
    val weightSum = aggregate(bks, lit(0.0), (acc, b) =>
      acc + element_at(tableLit, (b + lit(1L)).cast("int")))
    docs
      // the empty-doc gate runs on the TOKEN count, not size(bks): the
      // two are equal by construction (hashedNgramBuckets is a 1:1
      // transform over tokens ++ shingles, and shingles are empty
      // whenever tokens are), but the token form skips the per-n-gram
      // md5 work — the filter operator can't share the projection's
      // bucket computation (codegen CSE doesn't span Filter→Project,
      // and a pre-projected column would be pushed back down anyway)
      .filter(size(TextOps.tokens(col(textCol))) > 0)
      .select(
        col(idCol),
        size(bks).cast("long").as("n_ngrams"),
        round(weightSum, 6).as("log_weight"))
  }

  /** Hashed n-gram distribution divergence between two corpora — the
    * mixture-drift meter: KL(A‖B), KL(B‖A), and the bounded symmetric
    * Jensen–Shannon divergence, all in BITS over the same smoothed
    * `B`-bucket models DSIR scores with. Use it to detect when a data
    * source shifts against a reference snapshot, to rank candidate
    * sources by distance to a target mix, or to sanity-check that a
    * resampled output actually moved toward the target (JS(output,
    * target) < JS(input, target)).
    *
    * The sum over the `B - n_occupied` buckets unseen in both corpora
    * is identical per bucket, so it is added in closed form — the
    * aggregate only touches occupied buckets. One row out:
    * `(n_buckets_occupied, kl_ab_bits, kl_ba_bits, js_bits)`, 6 dp.
    * Scale shape: two bucket-count shuffles (≤`B` rows each), then
    * scalar math — corpus size only affects the counting scans.
    */
  def ngramDivergence(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      buckets: Int = 2048,
      alpha: Double = 1.0,
  ): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    require(alpha > 0, "alpha must be > 0")
    val ac = bucketCounts(a, textCol, buckets).withColumnRenamed("n", "ca")
    val bc = bucketCounts(b, textCol, buckets).withColumnRenamed("n", "cb")
    val joined = ac.join(bc, Seq("bucket"), "full_outer")
      .select(
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val totals = joined.agg(
      sum(col("ca")).cast("double").as("na"),
      sum(col("cb")).cast("double").as("nb"))
    val aB = alpha * buckets
    val p = (col("ca") + lit(alpha)) / (col("na") + lit(aB))
    val q = (col("cb") + lit(alpha)) / (col("nb") + lit(aB))
    val m = (p + q) / lit(2.0)
    val occupied = joined.crossJoin(broadcast(totals))
      .agg(
        count(lit(1)).as("n_buckets_occupied"),
        first(col("na")).as("na"),
        first(col("nb")).as("nb"),
        sum(p * log2(p / q)).as("kl_ab_occ"),
        sum(q * log2(q / p)).as("kl_ba_occ"),
        sum(p * log2(p / m) / lit(2.0) + q * log2(q / m) / lit(2.0)).as("js_occ"))
    // closed-form remainder: every unoccupied bucket contributes the
    // same zero-count term
    val p0 = lit(alpha) / (col("na") + lit(aB))
    val q0 = lit(alpha) / (col("nb") + lit(aB))
    val m0 = (p0 + q0) / lit(2.0)
    val rest = (lit(buckets.toLong) - col("n_buckets_occupied")).cast("double")
    occupied.select(
      col("n_buckets_occupied"),
      round(col("kl_ab_occ") + rest * p0 * log2(p0 / q0), 6).as("kl_ab_bits"),
      round(col("kl_ba_occ") + rest * q0 * log2(q0 / p0), 6).as("kl_ba_bits"),
      round(col("js_occ") +
        rest * (p0 * log2(p0 / m0) / lit(2.0) + q0 * log2(q0 / m0) / lit(2.0)), 6)
        .as("js_bits"))
  }

  /** Mixture-weight optimizer toward a TARGET distribution — the
    * "what blend of my sources looks most like the data I want"
    * solver (the distribution-matching proxy for DoReMi-style mixture
    * tuning, over the same hashed-n-gram bucket space DSIR scores
    * with): find simplex weights `w` minimizing
    * `KL(target ‖ Σ_i w_i · p_i)` by exponentiated-gradient descent.
    * KL(t‖m) is convex in `w`, and EG keeps iterates on the simplex,
    * so a fixed iteration budget converges deterministically — no RNG,
    * no stopping-rule flakiness.
    *
    * Output: one row per source,
    * `(source, weight, kl_uniform_bits, kl_opt_bits)` — the optimized
    * weight (6 dp, sums to 1 before rounding) plus the target-KL of
    * the uniform blend and of the optimized blend (the improvement the
    * solve bought). Feed the weights straight into
    * [[Sample.mixCorpora]] as per-source fractions.
    *
    * Scale shape: each source costs ONE bucket-count pass (≤ `buckets`
    * rows collected — the [[logRatios]] model-lifecycle pattern); the
    * solve itself is driver arithmetic over `|sources| × buckets`
    * doubles. Corpus size only affects the counting scans. Iterative
    * argmin has no SQL mirror → rows-only driver row with contracted
    * recovery/improvement floors (DriverSuiteSpec).
    */
  def optimizeMixture(
      sources: Seq[(String, DataFrame)],
      target: DataFrame,
      textCol: String,
      buckets: Int = 2048,
      alpha: Double = 1.0,
      iterations: Int = 2000,
      learningRate: Double = 2.0,
  ): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    val spark = target.sparkSession
    // smoothed bucket distribution of one corpus, collected driver-side
    def dist(df: DataFrame): Array[Double] =
      smooth(buckets, alpha,
        bucketCounts(df, textCol, buckets).collect()
          .map(r => r.getLong(0).toInt -> r.getLong(1)))
    solveMixture(spark, sources.map(_._1), sources.map(c => dist(c._2)),
      dist(target), buckets, alpha, iterations, learningRate)
  }

  /** [[optimizeMixture]] when the sources are SLICES of one corpus
    * (labeled by `sliceCol`) and the target is one of them — the common
    * in-corpus rebalancing call: ONE grouped `(slice, bucket)` counting
    * pass builds every source distribution AND the target's, so the
    * whole solve costs a single corpus scan instead of one per slice.
    * Null-slice rows are excluded (no mixture identity).
    */
  def optimizeMixtureForSlice(
      docs: DataFrame,
      sliceCol: String,
      textCol: String,
      targetSlice: String,
      buckets: Int = 2048,
      alpha: Double = 1.0,
      iterations: Int = 2000,
      learningRate: Double = 2.0,
  ): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val counts = docs
      .filter(col(sliceCol).isNotNull)
      .select(col(sliceCol).cast("string").as("__slice"),
        explode(hashedNgramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy(col("__slice"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (slice, rows) =>
        slice -> rows.map(r => r.getLong(1).toInt -> r.getLong(2))
      }
    require(counts.contains(targetSlice),
      s"target slice '$targetSlice' has no rows (slices: ${counts.keySet})")
    val names = counts.keys.toSeq.sorted
    val ps = names.map(n => smooth(buckets, alpha, counts(n)))
    val t = smooth(buckets, alpha, counts(targetSlice))
    solveMixture(spark, names, ps, t, buckets, alpha, iterations, learningRate)
  }

  /** Add-`alpha` smoothed distribution from sparse (bucket, count) pairs. */
  private def smooth(
      buckets: Int, alpha: Double, counts: Seq[(Int, Long)]): Array[Double] = {
    val arr = Array.fill(buckets)(alpha)
    counts.foreach { case (b, n) => arr(b) += n.toDouble }
    val z = arr.sum
    arr.map(_ / z)
  }

  /** The shared EG solve over collected distributions — see
    * [[optimizeMixture]] for the contract.
    */
  private def solveMixture(
      spark: org.apache.spark.sql.SparkSession,
      names: Seq[String],
      ps: Seq[Array[Double]],
      t: Array[Double],
      buckets: Int,
      alpha: Double,
      iterations: Int,
      learningRate: Double,
  ): DataFrame = {
    require(alpha > 0.0, "alpha must be > 0 (zero smoothing makes empty " +
      "buckets divide by zero in the KL and the gradient)")
    require(iterations >= 1 && learningRate > 0.0, "bad solver params")
    def mix(w: Array[Double]): Array[Double] = {
      val m = new Array[Double](buckets)
      var i = 0
      while (i < ps.length) {
        val p = ps(i); val wi = w(i); var b = 0
        while (b < buckets) { m(b) += wi * p(b); b += 1 }
        i += 1
      }
      m
    }
    def klBits(m: Array[Double]): Double = {
      var s = 0.0; var b = 0
      while (b < buckets) { s += t(b) * math.log(t(b) / m(b)); b += 1 }
      s / math.log(2.0)
    }
    var w = Array.fill(names.size)(1.0 / names.size)
    val klUniform = klBits(mix(w))
    var it = 0
    while (it < iterations) {
      val m = mix(w)
      // ∂KL/∂w_i = −Σ_b t_b · p_ib / m_b (up to the simplex projection
      // EG performs); multiplicative update stays on the simplex
      val g = new Array[Double](w.length)
      var i = 0
      while (i < w.length) {
        val p = ps(i); var gi = 0.0; var b = 0
        while (b < buckets) { gi += t(b) * p(b) / m(b); b += 1 }
        g(i) = gi
        i += 1
      }
      // the update is invariant to a constant shift in g (the simplex
      // renormalization absorbs it) — shift by max(g) so exp never
      // overflows to Infinity/NaN at aggressive learning rates
      val gMax = g.max
      val upd = new Array[Double](w.length)
      i = 0
      while (i < w.length) {
        upd(i) = w(i) * math.exp(learningRate * (g(i) - gMax)); i += 1
      }
      val z = upd.sum
      i = 0
      while (i < w.length) { w(i) = upd(i) / z; i += 1 }
      it += 1
    }
    val klOpt = klBits(mix(w))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    import spark.implicits._
    names.zip(w.toSeq)
      .map { case (name, wi) => (name, r6(wi), r6(klUniform), r6(klOpt)) }
      .toDF("source", "weight", "kl_uniform_bits", "kl_opt_bits")
  }
}
