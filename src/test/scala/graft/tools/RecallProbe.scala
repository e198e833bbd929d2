package graft.tools

import org.apache.spark.sql.SparkSession

/** Manual measurement of every contracted recall/error driver row — the
  * numbers DriverSuiteSpec's floors pin. Run with:
  *   sbt "Test/runMain graft.tools.RecallProbe"                 # both correctness SFs
  *   sbt "Test/runMain graft.tools.RecallProbe tools/sf10 --json=RECALL_sf10.json"
  * Positional args are sf dirs (default: the two correctness SFs);
  * `--json=<path>` additionally writes the measurements as a JSON
  * artifact (the shape RECALL_r*.json uses, minus the config strings).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val jsonOut = args.collectFirst { case a if a.startsWith("--json=") =>
      a.stripPrefix("--json=") }
    val dirs0 = args.filterNot(_.startsWith("--json=")).toSeq
    val dirs = if (dirs0.nonEmpty) dirs0
               else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Seq("q_sim_lsh_recall", "q_sim_ivf_recall", "q_sim_pq_recall",
      "q_sim_ivfpq_recall", "q_sim_sq_recall", "q_sim_bq_recall",
      "q_dedup_embedding_recall", "q_dedup_semantic_recall",
      "q_dedup_semantic_white",
      "q_sim_hard_neg_lsh_recall", "q_sim_hard_pos_lsh_recall")
    val measured = for (dir <- dirs; q <- rows) yield {
      val r = graft.SparkEntry.queries(q)(spark, dir).collect().head
      val recall = r.getAs[Double]("recall")
      println(f"$q%-28s $dir%-24s n_true=${r.getAs[Long]("n_true")}%-7d " +
        f"n_found=${r.getAs[Long]("n_found")}%-7d recall=$recall")
      (q, dir.split('/').last, recall)
    }
    jsonOut.foreach { path =>
      val body = measured.map { case (q, sf, rc) =>
        s"""    {"query": "$q", "sf": "$sf", "recall": ${RecallContract.jsonNum(rc)},""" +
          s""" "floor": ${RecallContract.floor(q)}}"""
      }.mkString(",\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        s"""{\n  "rows": [\n$body\n  ]\n}\n""")
    }
    spark.stop()
  }
}
