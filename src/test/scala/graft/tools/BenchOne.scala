package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query — for iterating on one operator's plan.
  *   sbt "Test/runMain graft.tools.BenchOne q_dedup_minhash /root/testdata/sf0.1"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // warm (JIT/codegen), then measure
    fn(spark, sfDir).count()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"$name: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    if (args.length > 2 && args(2) == "explain") fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
