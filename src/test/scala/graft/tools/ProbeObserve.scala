package graft.tools

import org.apache.spark.sql.functions._

/** One-question probe: does an eager localCheckpoint() deliver observed
  * metrics (Dataset.observe) in this Spark build? The fused
  * connectedComponents convergence check depends on it — if the metric
  * were NOT delivered, Observation.get would block forever, so this
  * probe guards with a timeout and prints a verdict instead of hanging.
  */
object ProbeObserve {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.session("probe-observe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 1000).toDF("x").withColumn("old", col("x"))
      .withColumn("comp", when(col("x") % 7 === 0, col("x") - 1).otherwise(col("x")))
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs, count(when(col("comp") =!= col("old"), 1)).as("changed"))
    val got = new java.util.concurrent.CompletableFuture[Long]()
    val t = new Thread(() => {
      val j = observed.localCheckpoint() // eager: runs the internal count action
      val n = obs.get("changed").asInstanceOf[Long]
      // downstream reads of the checkpointed frame must still see the data
      val rows = j.count()
      got.complete(if (rows == 1000) n else -2L)
    })
    t.setDaemon(true)
    t.start()
    try {
      val n = got.get(60, java.util.concurrent.TimeUnit.SECONDS)
      val expect = (1 to 1000).count(_ % 7 == 0)
      println(s"OBSERVE_RESULT=$n EXPECT=$expect VERDICT=" +
        (if (n == expect) "DELIVERED" else "WRONG"))
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        println("OBSERVE_RESULT=timeout VERDICT=NOT_DELIVERED")
    }
    spark.stop()
    sys.exit(0)
  }
}
