package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually runs, as one operator.
  *
  * Gates (language, composite quality, n-gram repetition) are all narrow
  * codegen'd projections over the same scan, so the filter phase is a
  * single pass with zero shuffles — at 100 TB the gate evaluates at IO
  * speed and drops most rows *before* anything wide happens. The only
  * shuffle is the exact-dedup window over the survivors' content hash
  * (and survivors are the minority by construction).
  *
  * Every signal is SQL-expressible, so the whole pipeline — gates plus
  * keep-first dedup — has a line-for-line DuckDB oracle.
  */
object Curate {

  /** The gate phase alone: language + composite-quality + repetition
    * filters with the signals attached. Entirely STATELESS (narrow
    * codegen'd projections + a filter), so it applies unchanged to batch
    * DataFrames and streaming sources — both curate twins below build on
    * it.
    */
  def gate(
      docs: DataFrame,
      textCol: String,
      lang: String = "en",
      minQuality: Double = 0.6,
      maxDup3: Double = 0.05,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val text = col(textCol)
    // native word_shingles for the repetition signal: projection collapse
    // substitutes gate expressions into the filter AND the outputs, so
    // the shingling runs several times per row — the fused single-pass
    // expression keeps that cheap where the interpreted HOF chain made
    // the whole gate CPU-bound
    val sh3 = graft.functions.GraftFunctions.wordShingles(text, 3)
    docs
      .withColumn("lang_pred", TextOps.languageId(text))
      .withColumn("quality", TextOps.qualityScore(text))
      .withColumn("dup_3gram_frac", TextOps.dupFracOfShingles(sh3))
      .filter(col("lang_pred") === lang &&
        col("quality") >= minQuality &&
        col("dup_3gram_frac") <= maxDup3)
  }

  /** Filter to documents that pass all quality gates, then keep the first
    * (lowest-id) document per distinct normalized text. Returns the
    * surviving rows with their gate signals attached.
    */
  def curate(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      lang: String = "en",
      minQuality: Double = 0.6,
      maxDup3: Double = 0.05,
  ): DataFrame =
    Dedup.exactKeepFirst(gate(docs, textCol, lang, minQuality, maxDup3), textCol, idCol)

  /** Streaming twin: the same stateless gates, then watermark-bounded
    * exact dedup ([[Dedup.exactDedupStream]]) instead of the batch
    * keep-first window — state tracks the arrival window, not the corpus,
    * so the pipeline ingests indefinitely. The earliest-arriving document
    * per distinct normalized text wins (micro-batch arrival order, not
    * id order — the one semantic difference from the batch twin).
    */
  def curateStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String = "1 hour",
      lang: String = "en",
      minQuality: Double = 0.6,
      maxDup3: Double = 0.05,
  ): DataFrame =
    Dedup.exactDedupStream(gate(docs, textCol, lang, minQuality, maxDup3),
      textCol, tsCol, watermarkDelay)
}
