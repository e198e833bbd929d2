package graft.tools

import org.apache.spark.sql.functions._

/** Round-12 probe for the q_text_winnow_overlap scaling shape: measure
  * the CANDIDATE volume (Σ over surviving fingerprint-hash buckets of
  * C(size, 2) — the self-join's emission) and the OUTPUT pair count at a
  * rung, so the n² claim is a measured density, not an inference from
  * runtimes (the SimPairDensity discipline).
  *
  * Round 13: takes the winnow window as an argument (the solver dial —
  * [[graft.ops.TextOps.winnowConfigFor]]) and a join toggle, so rungs
  * where the w=4 emission exceeds the operator's candidate-volume guard
  * (sf300: predicted 3.3e9 > the 2e9 default ceiling) can still stamp
  * counts without paying — or being refused — the quadratic join. The
  * model's prediction is printed next to the measured count so the
  * calibration drift is a per-rung number in the logs.
  *
  *   r12/javarun.sh 48g graft.tools.ProbeWinnow <sfDir> [w] [runJoin 0|1]
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/tools/sf30"
    val w = if (args.length > 1) args(1).toInt else 4
    val runJoin = if (args.length > 2) args(2) == "1" else true
    val spark = graft.SparkEntry.session("graft-probe-winnow")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val inv = docs.select(col("doc_id"),
      explode(graft.ops.TextOps.fingerprintWinnow(col("text"), 5, w)).as("__h"))
    val buckets = inv.groupBy(col("__h")).agg(count(lit(1)).as("c"))
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      sum(when(col("c") <= 10000,
        (col("c") * (col("c") - 1) / 2).cast("long"))).as("candidates"),
      sum(when(col("c") > 10000, 1L).otherwise(0L)).as("dropped_buckets"),
      max(col("c")).as("hottest")).collect()(0)
    val predicted = graft.ops.TextOps.winnowPredictedCandidates(nDocs, w)
    val joinPart =
      if (!runJoin) "out_pairs=skipped time=skipped"
      else {
        val t0 = System.nanoTime()
        // guard ceiling lifted: the probe's whole point is to measure the
        // emission the production default would refuse
        val out = graft.ops.TextOps.winnowOverlap(docs, "text", "doc_id",
          w = w, maxCandidatePairs = -1L).count()
        val dt = (System.nanoTime() - t0) / 1e9
        f"out_pairs=$out time=$dt%.2f s"
      }
    println(f"PROBE_WINNOW docs=$nDocs w=$w buckets=${stats.getLong(0)} " +
      f"candidates=${stats.getLong(1)} predicted=${predicted}%.3e " +
      f"dropped=${stats.getLong(2)} hottest=${stats.getLong(3)} " + joinPart)
    spark.stop()
  }
}
