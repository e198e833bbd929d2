package graft.tools

/** Time QUERY CONSTRUCTION (fn(spark, dir) — plan building, parquet
  * footer/schema reads, any eager measure-then-choose actions) separately
  * from evaluation, for every SparkEntry query. The bench pays
  * construction once per rep (3× per query per run), so a systemic
  * construction cost (e.g. re-reading footers in `t()`) taxes all 207
  * rows.
  *   sbt "Test/runMain graft.tools.ProbeConstruct /root/testdata/sf0.1 [repeat]"
  */
object ProbeConstruct {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.SparkEntry.session("graft-probe-construct")
    spark.sparkContext.setLogLevel("ERROR")
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // one untimed warm pass (JIT, store generation side effects)
    graft.SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir) catch { case _: Throwable => () }
    }
    clearAll()
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (_ <- 1 to reps) {
      graft.SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir) catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = math.min(times.getOrElse(name, Double.MaxValue), dt)
        clearAll()
      }
    }
    val total = times.values.sum
    println(f"CONSTRUCT_TOTAL: $total%.2f s over ${times.size} queries (min of $reps)")
    times.toSeq.sortBy(-_._2).take(30).foreach { case (n, t) =>
      println(f"  $t%7.3f  $n")
    }
  }
}
