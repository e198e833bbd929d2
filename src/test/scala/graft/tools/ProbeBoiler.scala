package graft.tools

import org.apache.spark.sql.functions._

/** Round-12 diagnosis probe for the q_text_boilerplate sf100 super-linear
  * row (SCALING_r11 §6): split the operator's cost into its two passes —
  * the boilerplate-digest STORE BUILD (explode + DF aggregate) and the
  * SCRUB (broadcast store + per-segment binary-search filter) — so the
  * nonlinear pass is named by measurement, not hypothesis.
  *
  *   r12/javarun.sh 48g graft.tools.ProbeBoiler <sfDir>
  */
object ProbeBoiler {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/tools/sf30"
    val spark = graft.SparkEntry.session("graft-probe-boiler")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE_BOILER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // pass 1 alone: the store build (count forces the aggregate)
    var n = 0L
    timed("store_build_cold") {
      n = graft.ops.TextOps.boilerplateDigests(docs, "text", " the ", minDocs = 2).count()
    }
    println(s"PROBE_BOILER store_digests: $n")
    timed("store_build_warm") {
      graft.ops.TextOps.boilerplateDigests(docs, "text", " the ", minDocs = 2).count()
    }
    // pass 2 alone: scrub against a PRE-MATERIALIZED store (parquet round
    // trip, so the store build is not re-paid inside the measurement)
    val storePath = java.nio.file.Files.createTempDirectory("probe-boiler-").toString
    graft.ops.TextOps.boilerplateDigests(docs, "text", " the ", minDocs = 2)
      .write.mode("overwrite").parquet(storePath)
    val store = spark.read.parquet(storePath)
    timed("scrub_only_warmup") {
      noop(graft.ops.TextOps.removeBoilerplateWith(docs, store, "text", "doc_id", " the "))
    }
    timed("scrub_only") {
      noop(graft.ops.TextOps.removeBoilerplateWith(docs, store, "text", "doc_id", " the "))
    }
    // the full row, as the bench runs it
    timed("full_row") {
      noop(graft.ops.TextOps.removeBoilerplate(docs, "text", "doc_id", " the ", minDocs = 2))
    }
    spark.stop()
  }
}
