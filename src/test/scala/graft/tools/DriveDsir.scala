package graft.tools

import org.apache.spark.sql.functions._

/** Drive the DSIR operator family over real parquet: weights, Gumbel
  * resample, streaming scorer, divergence meter, plus the physical plan
  * of the scoring join. Run: sbt "Test/runMain graft.tools.DriveDsir"
  */
object DriveDsir {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.SparkEntry.session("drive-dsir")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val en = docs.filter(col("lang") === "en")

    println("== DSIR importance weights (target = en, raw = all): extremes ==")
    val w = graft.ops.Dsir.logWeights(docs, en, docs, "text", "doc_id")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    w.orderBy(col("log_weight").desc).show(5)
    w.orderBy(col("log_weight").asc).show(5)
    println("== language mix: raw corpus vs DSIR top-100 resample ==")
    docs.groupBy("lang").count().orderBy("lang").show()
    graft.ops.Dsir.resample(docs, en, docs, "text", "doc_id",
        n = 100, seed = "graft-r7")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy("lang").count().orderBy("lang").show()
    println("== divergence meter: en-vs-rest, and en-vs-en (zero) ==")
    graft.ops.Dsir.ngramDivergence(en, docs.filter(col("lang") =!= "en"), "text").show()
    graft.ops.Dsir.ngramDivergence(en, en, "text").show()
    println("== streaming scorer parity on the same frame ==")
    val (ratios, scalars) = graft.ops.Dsir.logRatios(en, docs, "text", buckets = 2048)
    val stream = graft.ops.Dsir.logWeightsStream(docs, ratios, scalars, "text", "doc_id")
    val batch = graft.ops.Dsir.logWeights(docs, en, docs, "text", "doc_id")
    val diff = stream.withColumnRenamed("log_weight", "lw_s")
      .join(batch, Seq("doc_id"))
      .filter(abs(col("lw_s") - col("log_weight")) > 1e-9).count()
    println(s"rows where streaming != batch: $diff (expect 0)")
    println("== physical plan of the scoring join ==")
    graft.ops.Dsir.logWeights(docs, en, docs, "text", "doc_id").explain("formatted")
    spark.stop()
  }
}
