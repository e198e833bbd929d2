package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus language-model scoring — the CCNet-style quality signal: train
  * token statistics on a reference corpus, score every document by its
  * bits-per-token under the model, and split the corpus into
  * head / middle / tail quality buckets (Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data").
  *
  * The model here is an add-one-smoothed unigram LM over the shared
  * lowercase-alnum tokenization ([[TextOps.tokens]]) — deliberately the
  * simplest member of the family, because every piece (counts, smoothing,
  * log2, the percentile cut) is expressible in ANSI SQL, which buys the
  * operator a true DuckDB oracle. A production 5-gram KenLM slots into the
  * same shape: the per-token join below becomes a per-n-gram join against
  * a bigger count table; nothing else changes.
  *
  * Scale shape (100 TB): training is one explode + one map-side-combinable
  * count shuffle; scoring pre-aggregates per-document term frequencies
  * (compressing the join to distinct tokens per doc), joins on the token
  * key (AQE broadcasts the count table when the vocabulary is small), and
  * reduces per document. The only driver-sized piece is the 1-row totals
  * aggregate, broadcast explicitly.
  */
object Lm {

  /** Unigram counts over a training corpus: one row per distinct token.
    * One shuffle, partial-aggregated map-side.
    */
  def unigramCounts(train: DataFrame, textCol: String): DataFrame =
    train
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))

  /** Per-document bits-per-token under an add-one-smoothed unigram LM
    * trained on `train`: `-avg(log2 P(token))` with
    * `P(t) = (n(t) + 1) / (N + V)` (N = training token count, V = training
    * vocabulary size; unseen tokens get count 0). Lower = more like the
    * training corpus. Documents with zero tokens have no defined score and
    * are dropped (explode of an empty token list emits nothing).
    *
    * Output: (idCol, n_tokens, bits_per_token), bits rounded to 6 dp so
    * the score is comparable across engines (same convention as the other
    * float oracles).
    */
  def unigramBits(
      docs: DataFrame,
      train: DataFrame,
      textCol: String,
      idCol: String,
  ): DataFrame = {
    val counts = unigramCounts(train, textCol)
    val totals = counts.agg(
      sum(col("n")).cast("double").as("lm_n_total"),
      count(lit(1)).cast("double").as("lm_vocab"))
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.join(counts, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("bits",
        col("tf") * -log2(
          (coalesce(col("n"), lit(0L)) + lit(1.0)) /
            (col("lm_n_total") + col("lm_vocab"))))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        round(sum(col("bits")) / sum(col("tf")), 6).as("bits_per_token"))
  }

  /** Corpus bigram counts: one row per distinct word pair (stored as the
    * 2-shingle string "w1 w2" — the native [[graft.functions.GraftFunctions.wordShingles]]
    * form the oracles mirror). One map-side-combinable shuffle.
    */
  def bigramCounts(train: DataFrame, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    train
      .select(explode(
        graft.functions.GraftFunctions.wordShingles(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-document bits-per-transition under an add-one-smoothed BIGRAM
    * LM: `-avg(log2 P(w2 | w1))` over the document's `T - 1` adjacent
    * word pairs, with `P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)`
    * (c = training counts, V = training unigram vocabulary). The bigram
    * upgrade of [[unigramBits]] — sensitive to word ORDER, so shuffled or
    * concatenated text scores high even when its token histogram looks
    * natural. Documents with fewer than 2 tokens have no transitions and
    * are dropped.
    *
    * Scale shape mirrors [[unigramBits]]: two count shuffles at train
    * time, per-doc transition frequencies compress the joins (one on the
    * bigram, one on its first word), the 1-row totals broadcast.
    */
  def bigramBits(
      docs: DataFrame,
      train: DataFrame,
      textCol: String,
      idCol: String,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val big = bigramCounts(train, textCol)
    val uni = unigramCounts(train, textCol)
    val totals = uni.agg(count(lit(1)).cast("double").as("lm_vocab"))
    val tf = docs
      .select(col(idCol), explode(
        graft.functions.GraftFunctions.wordShingles(col(textCol), 2)).as("bigram"))
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    tf.join(big.withColumnRenamed("n", "n12"), Seq("bigram"), "left")
      .join(uni.withColumnRenamed("token", "w1").withColumnRenamed("n", "n1"),
        Seq("w1"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("bits",
        col("tf") * -log2(
          (coalesce(col("n12"), lit(0L)) + lit(1.0)) /
            (coalesce(col("n1"), lit(0L)) + col("lm_vocab"))))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_transitions"),
        round(sum(col("bits")) / sum(col("tf")), 6).as("bits_per_transition"))
  }

  /** Streaming twin of [[unigramBits]]: score an unbounded document
    * stream against a PRETRAINED static model (the (token, n) frame
    * [[unigramCounts]] produces) — completely STATELESS. The model
    * collects once at query-build time into a single map literal that
    * ships with the plan (the [[TextOps.decontaminateStream]] trade:
    * right for vocabulary-sized models, up to a few million entries; a
    * corpus-sized model belongs in the batch operator's join), and each
    * document scores in one projection — token fold via the `aggregate`
    * higher-order function, no explode, no streaming aggregation, no
    * state store, any output mode.
    *
    * Zero-token documents are dropped (undefined score), matching the
    * batch twin's explode semantics. Works identically on a batch frame
    * (used by the parity test).
    */
  def unigramBitsStream(
      docs: DataFrame,
      model: DataFrame,
      textCol: String,
      idCol: String,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val entries = model.select(col("token").cast("string"), col("n").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // an empty model would smooth every token to -log2(1/0) = -Infinity
    // silently; fail at build time instead
    require(entries.nonEmpty, "unigramBitsStream: the model has no token counts")
    val nTotal = entries.iterator.map(_._2).sum.toDouble
    val vocab = entries.length.toDouble
    val m = typedLit(entries.toMap)
    val toks = TextOps.tokens(col(textCol))
    // map_lookup_long probes a hash table built once from the literal —
    // element_at on a map literal is a LINEAR key scan per call, turning
    // vocabulary-sized models into O(tokens × vocab) per document
    val bitsSum = aggregate(toks, lit(0.0), (acc, t) =>
      acc + -log2(
        (graft.functions.GraftFunctions.mapLookupLong(m, t, default = 0L) + lit(1.0)) /
          lit(nTotal + vocab)))
    docs
      .filter(size(toks) > 0)
      .select(
        col(idCol),
        size(toks).cast("long").as("n_tokens"),
        round(bitsSum / size(toks), 6).as("bits_per_token"))
  }

  /** TF-IDF top-`k` terms per document — the classic keyword/topic signal
    * (salient-term extraction, per-document tagging, index keys).
    * `score = tf × (ln((n_docs + 1) / (df + 1)) + 1)` (the smoothed idf
    * that never goes negative); terms rank by (rounded score desc, token
    * asc) — ranking on the 6-dp-rounded score makes the order, and hence
    * the selected set, identical across engines (raw doubles can differ
    * in the last ulp between ln implementations).
    *
    * Scale shape: per-doc term frequencies and per-token document
    * frequencies are both map-side-combinable aggregates; the df join is
    * token-keyed (AQE broadcasts when the vocabulary is small); the 1-row
    * doc count broadcasts; the final top-k is a per-document window —
    * partitioned by id, so no global funnel.
    */
  def tfIdfTopTerms(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // tf is one row per (doc, token), so counting rows per token IS the
    // document frequency
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("tfidf_n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token"))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * (log((col("tfidf_n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("score"), col("rank"))
  }

  /** THE deterministic top-`topN` vocabulary head (count desc, token asc
    * tie-break) both vocabulary meters key on — one definition so
    * [[vocabCoverage]] and [[oovRate]] can never disagree on what "the
    * vocabulary" is. A TakeOrdered head, never a full sort; topN rows by
    * construction, so callers broadcast it. Carries an `__in` marker
    * column for membership tests via left join.
    */
  private def topVocab(train: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    unigramCounts(train, textCol)
      .orderBy(col("n").desc, col("token"))
      .limit(topN)
      .select(col("token"), lit(1).as("__in"))
  }

  /** Vocabulary coverage: the fraction of the score-corpus's token
    * OCCURRENCES whose token is in the training corpus's top-`topN`
    * vocabulary — the "how much of my data does this vocab actually
    * cover" meter behind vocab-size and OOV-budget decisions. Top-N is
    * deterministic ([[topVocab]]); one row out. An empty (or
    * all-empty-text) score corpus yields (0, 0, null) — counts total,
    * the rate undefined.
    *
    * Scale shape: train counts + a TakeOrdered head (never a full sort),
    * the head left-joins the score-side counts token-keyed (broadcast —
    * the head is topN rows by construction), then ONE final reduction
    * computes both numerator and denominator — the score corpus is
    * scanned once.
    */
  def vocabCoverage(
      docs: DataFrame,
      train: DataFrame,
      textCol: String,
      topN: Int,
  ): DataFrame = {
    val occ = docs
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("occ"))
    occ
      .join(broadcast(topVocab(train, textCol, topN)), Seq("token"), "left")
      .agg(
        coalesce(sum(when(col("__in").isNotNull, col("occ"))), lit(0L)).as("n_covered"),
        coalesce(sum(col("occ")), lit(0L)).as("n_total"))
      .select(col("n_covered"), col("n_total"),
        when(col("n_total") > 0,
          round(col("n_covered") / col("n_total"), 6)).as("coverage"))
  }

  /** Per-document out-of-vocabulary rate against the train corpus's
    * top-`topN` vocabulary — the corpus-level [[vocabCoverage]] meter's
    * per-document sibling, and the standard gate signal ("drop documents
    * with > X% OOV tokens": gibberish, wrong-language slips, encoding
    * damage). Zero-token documents are dropped (no defined rate — the
    * [[unigramBits]] convention).
    *
    * Scale shape: per-doc term frequencies compress the join; the top-N
    * vocab head broadcasts; one reduce per document.
    */
  def oovRate(
      docs: DataFrame,
      train: DataFrame,
      textCol: String,
      idCol: String,
      topN: Int,
  ): DataFrame = {
    val vocab = topVocab(train, textCol, topN)
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(when(col("__in").isNull, col("tf")).otherwise(lit(0L))).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
  }

  /** CCNet head/middle/tail split: tercile cutoffs over `bitsCol`, then a
    * value-based bucket per row (head = lowest bits = closest to the
    * training corpus). Cutoffs-then-compare rather than a global ntile:
    * a partition-less ntile window funnels the whole corpus through one
    * task, while the cutoff aggregate is one reduction + a broadcast —
    * the shape that survives 100 TB. `exact = true` uses exact
    * percentiles (oracle parity: DuckDB `quantile_cont` interpolates
    * identically); at scale flip to `exact = false` for
    * `approx_percentile` and the same plan with bounded memory.
    */
  def perplexityBuckets(
      scored: DataFrame,
      bitsCol: String,
      exact: Boolean = true,
  ): DataFrame = {
    val fn = if (exact) "percentile" else "approx_percentile"
    val cuts = scored.agg(
      expr(s"$fn($bitsCol, 1.0D / 3)").as("lm_cut_head"),
      expr(s"$fn($bitsCol, 2.0D / 3)").as("lm_cut_mid"))
    scored
      .crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col(bitsCol) <= col("lm_cut_head"), lit("head"))
          .when(col(bitsCol) <= col("lm_cut_mid"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("lm_cut_head", "lm_cut_mid")
  }

  /** Zipf-slope corpus-health meter: least-squares slope of
    * `ln(count) ~ ln(rank)` over the top-`k` token frequencies. Natural
    * text sits near the Zipfian −1 (Zipf 1949; Piantadosi 2014 review);
    * a much flatter slope flags templated/synthetic token salad, a much
    * steeper one flags boilerplate domination — a one-row fingerprint
    * worth tracking per crawl. Returns (n_ranks, slope, intercept),
    * intercept in ln-count units.
    *
    * Scale shape: the token count is [[TextOps.topTokens]]'s
    * partial-agg + TakeOrdered head; the regression runs over those ≤ k
    * rows (driver-sized) — one extra tiny aggregation, no new corpus
    * pass beyond the count shuffle.
    */
  def zipfSlope(df: DataFrame, textCol: String, k: Int = 100): DataFrame = {
    require(k >= 3, "need at least 3 ranks to fit a slope")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    val ranked = TextOps.topTokens(df, textCol, k)
      .withColumn("r", row_number().over(w))
      .select(log(col("r").cast("double")).as("x"), log(col("n").cast("double")).as("y"))
    ranked
      .agg(
        count(lit(1)).cast("double").as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(
        col("m").cast("long").as("n_ranks"),
        round((col("m") * col("sxy") - col("sx") * col("sy")) /
          (col("m") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - (col("m") * col("sxy") - col("sx") * col("sy")) /
          (col("m") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("m"), 6)
          .as("intercept"))
  }
}
