package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-relevance retrieval over a document corpus — the "select
  * training data by relevance to a target task" shape: score every
  * document against a literal query with Okapi BM25 (Robertson et al.,
  * "Okapi at TREC-3", 1994; idf in the Lucene lower-bounded form
  * `ln(1 + (N − df + 0.5)/(df + 0.5))`, never negative) and keep the
  * best. Data-selection-by-retrieval is a standard curation move
  * (domain-targeted corpus construction, eval-adjacent mining) and the
  * lexical complement of the embedding ANN ladder in [[Similarity]].
  *
  * Scale shape: the QUERY is driver-sized (a handful of literal terms),
  * so nothing ever builds a corpus-wide inverted index — per-document
  * term frequencies are a narrow codegen'd projection over the token
  * array, corpus statistics (N, Σdl, per-term df) collapse to ONE
  * map-side-combined aggregation row broadcast back to the scan, and
  * the top-k is a TakeOrdered, never a global sort. Two corpus scans
  * (stats + scoring), zero data-sized shuffles.
  */
object Retrieval {

  /** [[TextOps.tokens]]' exact lowercase-alnum tokenization applied to
    * the query string on the driver; duplicates collapse (BM25 is
    * defined over distinct query terms), first-occurrence order kept.
    */
  def queryTerms(query: String): Seq[String] =
    // Locale.ROOT: the default-locale toLowerCase diverges from Spark's
    // locale-independent lower() on e.g. tr-TR JVMs (I → dotless ı),
    // silently producing query terms no document token can match
    query.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq

  /** BM25 scores for every document matching ≥1 query term:
    * `(idCol, matched_terms, bm25)`, score rounded to 6 dp. `k1`
    * (term-frequency saturation) and `b` (length normalization) default
    * to the standard 1.2 / 0.75.
    */
  def bm25(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      query: String,
      k1: Double = 1.2,
      b: Double = 0.75,
  ): DataFrame =
    scored(docs, textCol, idCol, query, k1, b)
      .select(col(idCol), col("matched_terms"),
        round(col("__raw"), 6).as("bm25"))

  /** The `k` highest-scoring documents — [[bm25]] ordered on the
    * UNROUNDED score with the id as a deterministic tiebreak, as a
    * TakeOrdered (no global sort at any scale).
    */
  def bm25TopK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      query: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    scored(docs, textCol, idCol, query, k1, b)
      .orderBy(col("__raw").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("matched_terms"),
        round(col("__raw"), 6).as("bm25"))
  }

  /** Corpus statistics for [[bm25]] as a persistable ONE-ROW frame —
    * `(n, sumdl, df_0 … df_{k−1})` in [[queryTerms]] order. The
    * train-once state of the steady-state/streaming scorer (the same
    * store lifecycle as the IVF/PQ/BPE/classifier models): persist it
    * (parquet), hand it to [[bm25Stream]], refresh on corpus change.
    */
  def bm25Stats(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      query: String,
  ): DataFrame = {
    val qTerms = queryTerms(query)
    require(qTerms.nonEmpty, s"query '$query' has no tokens")
    val tf = withTf(docs, textCol, idCol, qTerms)
    val aggs = Seq(count(lit(1)).as("n"), sum(col("__dl")).as("sumdl")) ++
      qTerms.indices.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")) :+
      // the term list rides in the store so a scorer built with a
      // different term ORDER (same words!) refuses loudly instead of
      // silently crossing each term with the other's df
      first(typedLit(qTerms)).as("terms")
    tf.agg(aggs.head, aggs.tail: _*)
  }

  /** Persist a [[bm25Stats]] frame (one row) — the save/load lifecycle
    * every other model store here has (`saveIvf`/`savePq`/`saveBpe`/
    * `saveLinearWeights`).
    */
  def saveBm25Stats(stats: DataFrame, path: String): Unit =
    stats.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a stats store saved by [[saveBm25Stats]]; [[bm25Stream]]
    * verifies the stored term list against its query, so a stale or
    * mismatched store fails loudly (round-trip-tested).
    */
  def loadBm25Stats(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Stateless steady-state scorer over a PRECOMPUTED stats frame —
    * works identically on a batch frame or an unbounded STREAM (no
    * aggregation, no join, no state store, any output mode): the
    * bounded stats row (2 + |terms| longs) collects at query-build time
    * and the per-term idf constants ship as double literals, so each
    * document scores in one codegen'd projection. Exact [[bm25]] parity
    * when the stats came from the same corpus (both sides run the same
    * fixed-order double arithmetic — parity-tested).
    */
  def bm25Stream(
      docs: DataFrame,
      stats: DataFrame,
      textCol: String,
      idCol: String,
      query: String,
      k1: Double = 1.2,
      b: Double = 0.75,
  ): DataFrame = {
    val qTerms = queryTerms(query)
    require(qTerms.nonEmpty, s"query '$query' has no tokens")
    // verify the stored term list BEFORE selecting the positional df_i
    // columns: a store with fewer terms would otherwise die on an
    // unresolved-column error instead of this diagnostic
    val termRows = stats.select(col("terms")).collect()
    require(termRows.length == 1,
      s"bm25 stats frame must be exactly one row, got ${termRows.length}")
    val storedTerms = termRows(0).getSeq[String](0)
    require(storedTerms == qTerms,
      s"bm25 stats store was built for terms $storedTerms, scorer asked for " +
        s"$qTerms — term ORDER keys the df columns, rebuild or reorder")
    val row = stats.select(
      (Seq(col("n").cast("long"), col("sumdl").cast("long")) ++
        qTerms.indices.map(i => col(s"df_$i").cast("long"))): _*).collect()(0)
    val n = row.getLong(0)
    require(n > 0, "bm25 stats frame has an empty corpus (n = 0)")
    val avgdl = row.getLong(1).toDouble / n
    val k1p1 = k1 + 1.0
    val oneMb = 1.0 - b
    val withTfCols = withTf(docs, textCol, idCol, qTerms)
    def term(i: Int): Column = {
      val df = row.getLong(2 + i)
      // StrictMath.log, NOT math.log: Spark's in-plan `log` evaluates
      // StrictMath (fdlibm), and java.lang.Math.log is an intrinsic
      // that differs in the last ulp for ~5% of inputs — the bit-exact
      // batch parity this scorer promises requires the same libm
      val idf = StrictMath.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val tf = col(s"__tf_$i").cast("double")
      lit(idf) * (tf * lit(k1p1)) /
        (tf + lit(k1) * (lit(oneMb) + lit(b) * col("__dl").cast("double") / lit(avgdl)))
    }
    val matched = qTerms.indices
      .map(i => when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    withTfCols
      .withColumn("matched_terms", matched)
      .filter(col("matched_terms") > 0)
      .select(col(idCol), col("matched_terms"),
        round(qTerms.indices.map(term).reduce(_ + _), 6).as("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * ranked candidate lists — the standard hybrid-retrieval combiner:
    * each list contributes `1 / (k0 + rank)` per id (rank from its own
    * score column, descending, id tiebreak; ids absent from a list
    * contribute nothing), fused score = the sum, output the `topK` best
    * as `(idCol, n_lists, rrf)`. Fuse [[bm25TopK]] with an ANN top-k
    * (lexical ∪ embedding hybrid), or several BM25 lists from expanded
    * queries. `k0 = 60` per the paper.
    *
    * Scale shape: inputs are top-k lists BY CONSTRUCTION, so everything
    * here — including the single-partition rank window — operates on
    * k-sized frames, never the corpus. Ranks are taken on each list's
    * (rounded, engine-reproducible) score with the id tiebreak, so the
    * fusion is deterministic across engines and reruns.
    */
  def reciprocalRankFusion(
      lists: Seq[(DataFrame, String)],
      idCol: String,
      topK: Int,
      k0: Int = 60,
  ): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k0 >= 1, "k0 must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val contribs = lists.map { case (df, scoreCol) =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol),
        (lit(1.0) / (lit(k0) + row_number().over(w))).as("__c"))
    }.reduce(_ unionByName _)
    contribs
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("__c")).as("__s"))
      .orderBy(col("__s").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("n_lists"), round(col("__s"), 6).as("rrf"))
  }

  /** Per-doc token length + one tf column per query term — ONE narrow
    * projection (the token split is CSE'd across the tf counters),
    * shared by the batch scorer, the stats pass, and the stream scorer.
    */
  private def withTf(
      docs: DataFrame, textCol: String, idCol: String,
      qTerms: Seq[String]): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(
      (Seq(col(idCol), size(toks).cast("long").as("__dl")) ++
        qTerms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").as(s"__tf_$i")
        }): _*)
  }

  /** Shared scorer: `(idCol, matched_terms, __raw)` for matching docs.
    * All arithmetic is fixed-order double math over exact integer
    * counts (tf, df, N, dl as longs; Σdl exact; avgdl one division), so
    * the score is bit-reproducible across engines — the DuckDB oracle
    * mirrors this expression tree term for term.
    */
  private def scored(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      query: String,
      k1: Double,
      b: Double,
  ): DataFrame = {
    val qTerms = queryTerms(query)
    require(qTerms.nonEmpty, s"query '$query' has no tokens")
    val k1p1 = k1 + 1.0
    val oneMb = 1.0 - b
    val tfCols = withTf(docs, textCol, idCol, qTerms)
    // ONE stats row: N, Σdl, df per term — broadcast, never a shuffle
    // of the corpus
    val statAggs = Seq(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl")) ++
      qTerms.indices.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).as(s"__df_$i"))
    val stats = tfCols.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("__sumdl").cast("double") / col("__n")
    def term(i: Int): Column = {
      val tf = col(s"__tf_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df_$i") + lit(0.5)) / (col(s"__df_$i") + lit(0.5)))
      idf * (tf * lit(k1p1)) /
        (tf + lit(k1) * (lit(oneMb) + lit(b) * col("__dl").cast("double") / avgdl))
    }
    val matched = qTerms.indices
      .map(i => when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    tfCols
      .crossJoin(broadcast(stats))
      .withColumn("matched_terms", matched)
      .filter(col("matched_terms") > 0)
      .withColumn("__raw", qTerms.indices.map(term).reduce(_ + _))
      .select(col(idCol), col("matched_terms"), col("__raw"))
  }
}
