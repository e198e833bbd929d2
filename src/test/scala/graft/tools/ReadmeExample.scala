package graft.tools

/** The README "worked example" snippet, verbatim — kept as a runnable
  * main so the documented entry point can never rot:
  *   sbt "Test/runMain graft.tools.ReadmeExample [sfDir]"
  * runs the crawl→training-sequences flagship (`q_pipeline_e2e`) against
  * the driver testdata and prints the packed-sequence head + row count.
  */
object ReadmeExample {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // --- README snippet starts here ---
    val spark = graft.SparkEntry.session("graft-example")
    val packed = graft.SparkEntry.queries("q_pipeline_e2e")(spark, dir)
    packed.show(5)
    println(s"packed training sequences: ${packed.count()} rows")
    // --- README snippet ends here ---
    spark.stop()
  }
}
