package graft.tools

/** Time a single SparkEntry query — for iterating on one operator's plan.
  *   sbt "Test/runMain graft.tools.BenchOne q_dedup_minhash /root/testdata/sf0.1 [explain]"
  * Uses the SAME pinned session (`SparkEntry.session`: AQE posture,
  * openCostInBytes scan splits) and the same noop-sink evaluation as
  * `graft.Bench`, so a number measured here predicts the bench — a plain
  * default-config session hides the scan-split and AQE behavior the
  * pinned posture exists to control.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // same derived heap rule as graft.Bench (refuses below the bound
    // unless SPARK_GRAFT_FORCE_HEAP=1) — an isolated measurement under a
    // silently starved heap would be exactly the confound this tool
    // exists to remove
    val (dataBytes, heapBytes) = graft.Bench.checkHeapPosture(sfDir)
    val spark = graft.SparkEntry.session("graft-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def evaluate(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // full cache cleanup between warmup and the measurement — graft.Bench's
    // clearAll: operators that persist intra-query sides (the r13
    // measure-then-choose reassembly, winnowOverlap's guarded index) must
    // rebuild them in the timed rep, or this tool reports a warm-cache
    // number no fresh query run would see
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // SPARK_GRAFT_NOWARM=1 skips the warmup evaluation and times the
    // FIRST run (codegen/JIT included — absolute numbers inflate ~10-20%
    // but rung-over-rung RATIOS stay comparable because both rungs share
    // the posture; halves the cost of wide cold sweeps). The output line
    // stamps the posture so artifacts can't silently mix the two.
    val nowarm = sys.env.getOrElse("SPARK_GRAFT_NOWARM", "0") == "1"
    if (!nowarm) {
      evaluate() // warm (JIT/codegen), then measure
      clearAll()
    }
    // scratch disk stamps around the timed rep (r13 ask #5): an isolated
    // number measured into a scratch-fouled or filling disk must say so —
    // the r13 sf300 span take ran with 3.4 GB free and its 289 s read as
    // a plan regression for a round
    val diskBefore = graft.Bench.scratchFreeBytes(spark)
    val t0 = System.nanoTime()
    evaluate()
    val dt = (System.nanoTime() - t0) / 1e9
    val diskAfter = graft.Bench.scratchFreeBytes(spark)
    println(f"$name: time=$dt%.2f s " +
      f"heap=${heapBytes / 1e9}%.1fg data=${dataBytes / 1e9}%.1fg " +
      f"disk_before=${diskBefore / 1e9}%.1fg disk_after=${diskAfter / 1e9}%.1fg" +
      (if (nowarm) " nowarm=1" else ""))
    if (args.length > 2 && args(2) == "explain") fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
