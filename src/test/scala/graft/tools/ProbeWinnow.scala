package graft.tools

import org.apache.spark.sql.functions._

/** Round-12 probe for the q_text_winnow_overlap scaling shape: measure
  * the CANDIDATE volume (Σ over surviving fingerprint-hash buckets of
  * C(size, 2) — the self-join's emission) and the OUTPUT pair count at a
  * rung, so the n² claim is a measured density, not an inference from
  * runtimes (the SimPairDensity discipline).
  *
  *   r12/javarun.sh 48g graft.tools.ProbeWinnow <sfDir>
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/tools/sf30"
    val spark = graft.SparkEntry.session("graft-probe-winnow")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val inv = docs.select(col("doc_id"),
      explode(graft.ops.TextOps.fingerprintWinnow(col("text"), 5, 4)).as("__h"))
    val buckets = inv.groupBy(col("__h")).agg(count(lit(1)).as("c"))
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      sum(when(col("c") <= 10000,
        (col("c") * (col("c") - 1) / 2).cast("long"))).as("candidates"),
      sum(when(col("c") > 10000, 1L).otherwise(0L)).as("dropped_buckets"),
      max(col("c")).as("hottest")).collect()(0)
    val t0 = System.nanoTime()
    val out = graft.ops.TextOps.winnowOverlap(docs, "text", "doc_id").count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"PROBE_WINNOW docs=$nDocs buckets=${stats.getLong(0)} " +
      f"candidates=${stats.getLong(1)} dropped=${stats.getLong(2)} " +
      f"hottest=${stats.getLong(3)} out_pairs=$out time=$dt%.2f s")
    spark.stop()
  }
}
