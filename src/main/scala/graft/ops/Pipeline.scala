package graft.ops

import org.apache.spark.sql.DataFrame

/** The one-call training-data preparation chain: curation gates → exact
  * keep-first dedup → benchmark decontamination → deterministic
  * train/val/test split. Each stage is the already-oracled standalone
  * operator ([[Curate.curate]], [[TextOps.decontaminate]],
  * [[Sample.splitByHash]]), composed in the order a production corpus
  * build runs them — gates first (narrow, scan-speed, drops most rows
  * before anything wide), dedup and decontamination over the survivors
  * only, the split last as a free narrow projection.
  *
  * The composition itself is also oracle-checked end to end
  * (`q_pipeline_prepare`): the full chain — gates, QUALIFY keep-first,
  * NOT-IN decontamination, CASE split — recomputed as one DuckDB query.
  */
object Pipeline {

  def prepare(
      docs: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      lang: String = "en",
      minQuality: Double = 0.6,
      maxDup3: Double = 0.05,
      n: Int = 5,
      minOverlap: Int = 1,
  ): DataFrame =
    Sample.splitByHash(
      TextOps.decontaminate(
        Curate.curate(docs, textCol, idCol, lang, minQuality, maxDup3),
        bench, textCol, idCol, n, minOverlap),
      idCol, splits, salt)
}
