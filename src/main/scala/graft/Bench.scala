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
    // full cleanup between measurements: SQL cache AND raw persisted RDD
    // blocks — localCheckpoint blocks live in the BlockManager, which
    // spark.catalog.clearCache() alone does not touch
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // warmup pass (untimed)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      clearAll()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // failed reps are excluded from the min (a fast failure must not
      // masquerade as a fast run); all-failed reports -1
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        clearAll()
        if (ok) Some(dt) else None
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
