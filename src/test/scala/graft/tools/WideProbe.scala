package graft.tools

import org.apache.spark.sql.functions._

/** Measurement probe for the wide (120-bit) SimHash family: output pair
  * count and per-keyBlocks timing at a given rung — the numbers behind
  * SCALING_r11.md §1d (output density vs the 60-bit radius-8 frontier,
  * and whether stepping past the 64-table budget pays).
  *
  *   sbt "Test/runMain graft.tools.WideProbe tools/sf10 [kb ...]"
  */
object WideProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tools/sf1")
    val kbs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 2, 3)
    val spark = graft.SparkEntry.session("graft-wide-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sims = docs.select(col("doc_id").as("id"),
      graft.ops.Dedup.simHashWide(col("text")).as("sims"))
    sims.write.format("noop").mode("overwrite").save() // warm the scan/JIT
    for (kb <- kbs) {
      val out = graft.ops.Dedup.simHashNearDupsWideFromSims(sims, maxHamming = 8, keyBlocks = kb)
      val t0 = System.nanoTime()
      val pairs = out.count()
      println(f"wide r8 kb=$kb: pairs=$pairs time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
