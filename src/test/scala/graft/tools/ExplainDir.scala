package graft.tools
object ExplainDir {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.SparkEntry.session("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.drop(1)) {
      println(s"======== $n")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
