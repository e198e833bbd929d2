package graft.tools

import org.apache.spark.sql.functions._

/** Round-12 probe for q_text_span_dedup's scaling shape: count the
  * duplicated-span payload — the (id, pos) rows whose shingle hash has
  * df ≥ 2, i.e. the `__starts` volume the reassembly join must carry —
  * per rung, so the output-shaped part of the row's cost is a measured
  * count (the ProbeWinnow discipline).
  *
  *   r12/javarun.sh 48g graft.tools.ProbeSpan <sfDir>
  */
object ProbeSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/tools/sf30"
    val spark = graft.SparkEntry.session("graft-probe-span")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val shingleHashes = transform(
      graft.functions.GraftFunctions.wordShingles(col("text"), 8),
      s => graft.functions.GraftFunctions.md5Long60(s.cast("binary")))
    val inv = docs.select(col("doc_id"), posexplode(shingleHashes).as(Seq("__pos", "__h")))
    val t0 = System.nanoTime()
    // the operator's df is over DISTINCT docs per hash (dedupSpans)
    val dupHashes = inv.select(col("doc_id"), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select(col("__h"))
    val payload = inv.join(dupHashes, Seq("__h"), "left_semi").count()
    val total = inv.count()
    println(f"PROBE_SPAN docs=$nDocs shingle_positions=$total " +
      f"dup_positions=$payload time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
