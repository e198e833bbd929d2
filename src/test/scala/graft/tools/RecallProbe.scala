package graft.tools

/** Manual measurement of every contracted recall/error driver row — the
  * numbers DriverSuiteSpec's floors pin. Run with:
  *   sbt "Test/runMain graft.tools.RecallProbe"                 # both correctness SFs
  *   sbt "Test/runMain graft.tools.RecallProbe tools/sf10 --json=RECALL_sf10.json"
  * Positional args are sf dirs (default: the two correctness SFs);
  * `--json=<path>` additionally writes the measurements as a JSON
  * artifact (the shape RECALL_r*.json uses, minus the config strings).
  * `--skip=<q1,q2>` omits rows whose APPROX side is a documented scale
  * frontier at the probed rung (e.g. the mid-threshold SemDeDup rows at
  * sf10, intrinsically ~n²/cells — SCALING_r10.md §2 — which the sf10
  * family bench skips under the same posture); skipped names are
  * stamped into the artifact so a partial ladder is self-describing.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val jsonOut = args.collectFirst { case a if a.startsWith("--json=") =>
      a.stripPrefix("--json=") }
    val skip: Set[String] = args.collectFirst { case a if a.startsWith("--skip=") =>
      a.stripPrefix("--skip=").split(',').map(_.trim).filter(_.nonEmpty).toSet }
      .getOrElse(Set.empty)
    val dirs0 = args.filterNot(a => a.startsWith("--json=") || a.startsWith("--skip=")).toSeq
    val dirs = if (dirs0.nonEmpty) dirs0
               else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    // the PINNED production posture (AQE + skew join + UTC), same as
    // Bench/Verify — a raw builder without AQE let the sf10 truth join
    // plan as a sort-merge join over 1e8 vector-carrying pair rows
    // (>58 GB of sort spill, ENOSPC) where the pinned session broadcasts
    // the plateaued ~500-probe side
    val spark = graft.SparkEntry.session("graft-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Seq("q_sim_lsh_recall", "q_sim_ivf_recall", "q_sim_pq_recall",
      "q_sim_ivfpq_recall", "q_sim_sq_recall", "q_sim_bq_recall",
      "q_dedup_embedding_recall", "q_dedup_semantic_recall",
      "q_dedup_semantic_white",
      "q_sim_hard_neg_lsh_recall", "q_sim_hard_pos_lsh_recall")
    val measured = for (dir <- dirs; q <- rows if !skip(q)) yield {
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
      val skipLine =
        if (skip.isEmpty) ""
        else s"""  "skip": [${skip.toSeq.sorted.map("\"" + _ + "\"").mkString(", ")}],\n"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        s"""{\n$skipLine  "rows": [\n$body\n  ]\n}\n""")
    }
    spark.stop()
  }
}
