package graft.tools

import org.apache.spark.sql.functions._

/** Round-12 probe for q_text_span_dedup's scaling shape: count the
  * duplicated-span payload — the (id, pos) rows whose shingle hash has
  * df ≥ 2, i.e. the `__starts` volume the reassembly join must carry —
  * per rung, so the output-shaped part of the row's cost is a measured
  * count (the ProbeWinnow discipline).
  *
  * Round 13: optional hash-space SLICING for rungs whose (id, hash)
  * distinct shuffle outgrows the box's free disk (sf300's single-pass
  * run died on spill: >40 GB scratch for a 1.8 GB parquet input). A
  * hash's document frequency is a pure function of the rows in its own
  * hash-range slice, so running `slices` sequential passes — each
  * filtering `pmod(__h, slices) = s` right after the explode — computes
  * the SAME exact totals while spilling 1/slices of the volume at a
  * time. Exact, not sampled.
  *
  *   r12/javarun.sh 48g graft.tools.ProbeSpan <sfDir> [slices]
  */
object ProbeSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/tools/sf30"
    val slices = if (args.length > 1) args(1).toInt else 1
    val spark = graft.SparkEntry.session("graft-probe-span")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val shingleHashes = transform(
      graft.functions.GraftFunctions.wordShingles(col("text"), 8),
      s => graft.functions.GraftFunctions.md5Long60(s.cast("binary")))
    val invAll = docs.select(col("doc_id"), posexplode(shingleHashes).as(Seq("__pos", "__h")))
    val t0 = System.nanoTime()
    var payload = 0L
    var total = 0L
    for (s <- 0 until slices) {
      val inv = if (slices == 1) invAll else invAll.filter(pmod(col("__h"), lit(slices)) === s)
      // the operator's df is over DISTINCT docs per hash (dedupSpans)
      val dupHashes = inv.select(col("doc_id"), col("__h")).distinct()
        .groupBy(col("__h")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("__h"))
      payload += inv.join(dupHashes, Seq("__h"), "left_semi").count()
      total += inv.count()
      if (slices > 1)
        println(f"PROBE_SPAN_SLICE $s/$slices payload_so_far=$payload total_so_far=$total")
    }
    println(f"PROBE_SPAN docs=$nDocs shingle_positions=$total " +
      f"dup_positions=$payload time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
