package graft.tools

/** Ad-hoc per-query probe for scale diagnostics: times named SparkEntry
  * queries against a data dir, reports wall seconds and output rows, and
  * (with -explain) dumps the formatted plan. Unlike Bench this runs ONLY
  * the named queries — the loop for iterating on one operator's sf1 shape
  * without paying the full 200-query sweep.
  *
  * Usage: Test/runMain graft.tools.ProbeR9 <dir> [-explain] <query> [query ...]
  */
object ProbeR9 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val explain = args.contains("-explain") || args.contains("-explainonly")
    val explainOnly = args.contains("-explainonly")
    val names = args.drop(1).filterNot(a => a == "-explain" || a == "-explainonly")
    val spark = graft.SparkEntry.session("graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      if (explain) df.explain("formatted")
      val n = if (explainOnly) -1L else df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-40s $sec%8.2f s  rows=$n%d")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
