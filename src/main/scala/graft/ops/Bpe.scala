package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) — the
  * trainable-tokenizer step of a training-data pipeline, as a Spark
  * iterative algorithm.
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the corpus: one
  * corpus pass aggregates (word, freq) — vocabulary-sized, orders of
  * magnitude smaller than 100 TB of text — and every merge round then
  * runs over that small frame: adjacent-symbol pair counts weighted by
  * word frequency (map-side-combinable aggregate), an argmax collected to
  * the driver (one row), and a native single-pass [[graft.functions.MergePair]]
  * rewrite of the symbol arrays. Per-round lineage is truncated
  * ([[Dedup.Materialize]]-style localCheckpoint) exactly like the
  * connected-components loop, so `numMerges` rounds never stack plans.
  *
  * Ties in pair frequency break lexicographically (smallest pair wins) —
  * training is DETERMINISTIC for a given corpus, independent of
  * partitioning.
  */
object Bpe {

  /** One learned merge: rank r means "the r-th pair merged". */
  final case class Merge(rank: Int, left: String, right: String)

  /** The word-frequency table: the SAME corpus-count primitive the LM
    * trains on ([[Lm.unigramCounts]] — one definition of "how often each
    * token occurs"), renamed to BPE's vocabulary.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    Lm.unigramCounts(docs, textCol)
      .withColumnRenamed("token", "word").withColumnRenamed("n", "freq")

  /** Train `numMerges` BPE merges on the corpus's word-frequency table.
    * `maxVocabWords` caps the training dictionary to the most frequent
    * words (ties by word) — the standard practical bound that keeps every
    * round's frame driver-predictable without touching the corpus again.
    */
  def trainBpe(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocabWords: Int = 50000,
  ): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(maxVocabWords >= 1, "maxVocabWords must be >= 1")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    var vocab = wordCounts(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxVocabWords)
      .select(col("freq"),
        // each word starts as its character sequence
        split(col("word"), "").as("symbols"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      // adjacent pairs weighted by word frequency; the explode is over
      // the SMALL vocab frame
      val pairs = vocab
        .select(col("freq"), col("symbols"), posexplode(slice(col("symbols"), lit(1),
          greatest(size(col("symbols")) - 1, lit(0)))).as(Seq("__p", "__a")))
        .withColumn("__b", element_at(col("symbols"), col("__p") + 2))
      val top = pairs
        .groupBy(col("__a"), col("__b"))
        .agg(sum(col("freq")).as("__n"))
        .orderBy(col("__n").desc, col("__a"), col("__b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top.head.getString(0)
        val b = top.head.getString(1)
        merges += Merge(r, a, b)
        // per-round lineage truncation; the dropped rounds' checkpoint
        // blocks are released when the old Dataset is GC'd (Dataset
        // .unpersist does NOT free localCheckpoint RDD blocks — same
        // lifecycle as the connectedComponents loop), which is fine at
        // the vocab-table sizes this trains on
        vocab = vocab.withColumn("symbols",
          graft.functions.GraftFunctions.mergePair(col("symbols"), lit(a), lit(b)))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.toList
  }

  /** Persist a learned merge table as a tiny parquet of (rank, left,
    * right) — the [[Similarity.saveIvf]] / [[Similarity.savePq]]
    * lifecycle: train once, every later session / job [[loadBpe]]s the
    * tokenizer instead of retraining.
    */
  def saveBpe(merges: Seq[Merge], spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right)).toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table saved by [[saveBpe]] (rank order restored). */
  def loadBpe(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path).orderBy(col("rank")).collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2))).toSeq

  /** Apply learned merges to a text column: tokenize with the shared
    * lowercase-alnum tokenization, split each word into characters, and
    * replay the merges IN RANK ORDER (the BPE application rule). A pure
    * per-row projection — `numMerges` chained native single-pass rewrites,
    * no shuffle, stream-composable. Returns array<string> of subword
    * units.
    */
  def applyBpe(text: Column, merges: Seq[Merge]): Column = {
    val chars = transform(TextOps.tokens(text), w => split(w, ""))
    val merged = merges.sortBy(_.rank).foldLeft(chars: Column) { (acc, m) =>
      transform(acc, w =>
        graft.functions.GraftFunctions.mergePair(w, lit(m.left), lit(m.right)))
    }
    flatten(merged)
  }

  /** Subword count under a trained tokenizer — the "how many tokens is
    * this corpus under MY vocab" meter (cost estimation, packing budgets).
    */
  def subwordCount(text: Column, merges: Seq[Merge]): Column =
    size(applyBpe(text, merges))
}
