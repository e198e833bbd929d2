package graft.tools

import org.apache.spark.sql.SparkSession

/** Manual measurement of every contracted recall/error driver row at the
  * correctness SFs — the numbers DriverSuiteSpec's floors pin. Run with:
  *   sbt "Test/runMain graft.tools.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Seq("q_sim_lsh_recall", "q_sim_ivf_recall", "q_sim_pq_recall",
      "q_sim_ivfpq_recall", "q_sim_sq_recall", "q_sim_bq_recall",
      "q_dedup_embedding_recall", "q_dedup_semantic_recall",
      "q_sim_hard_neg_lsh_recall", "q_sim_hard_pos_lsh_recall")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"); q <- rows) {
      val r = graft.SparkEntry.queries(q)(spark, dir).collect().head
      println(f"$q%-28s $dir%-24s n_true=${r.getAs[Long]("n_true")}%-7d " +
        f"n_found=${r.getAs[Long]("n_found")}%-7d recall=${r.getAs[Double]("recall")}")
    }
    spark.stop()
  }
}
