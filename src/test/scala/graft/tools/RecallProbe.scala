package graft.tools

import org.apache.spark.sql.SparkSession

/** Print recall@5 of the ANN driver configs (and a few tuning variants)
  * at both correctness SFs — sizes the recall floor asserted in
  * DriverSuiteSpec. Run: sbt "Test/runMain graft.tools.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val probes = emb.filter(col("vec_id") < 10)
      val exact = graft.ops.Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", k = 5)
      def show(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
        val r = graft.ops.Similarity.recallAtK(exact, approx).collect().head
        println(f"$dir $name: recall=${r.getAs[Double]("recall")}%.3f")
      }
      show("lsh 6x12 (driver)", graft.ops.Similarity.lshTopK(emb, probes, "embedding", "vec_id", 5, planes = 6, tables = 12))
      show("lsh 5x16", graft.ops.Similarity.lshTopK(emb, probes, "embedding", "vec_id", 5, planes = 5, tables = 16))
      show("lsh 6x24", graft.ops.Similarity.lshTopK(emb, probes, "embedding", "vec_id", 5, planes = 6, tables = 24))
      show("lsh 5x24", graft.ops.Similarity.lshTopK(emb, probes, "embedding", "vec_id", 5, planes = 5, tables = 24))
      val idx16 = graft.ops.Similarity.trainIvf(emb, "embedding", "vec_id", nlist = 16)
      show("ivf 16/4", graft.ops.Similarity.ivfSearch(idx16, emb, probes, "embedding", "vec_id", 5, nprobe = 4))
      show("ivf 16/6 (driver)", graft.ops.Similarity.ivfSearch(idx16, emb, probes, "embedding", "vec_id", 5, nprobe = 6))
      show("ivf 16/8", graft.ops.Similarity.ivfSearch(idx16, emb, probes, "embedding", "vec_id", 5, nprobe = 8))
      // banded hard miners vs their exact twins (recallAtK compares
      // (probe, neighbor) pairs, so it works for any ranked pair output)
      val exNeg = graft.ops.Similarity.hardNegatives(emb, probes, "embedding", "vec_id",
        k = 5, maxCos = 0.25, minCos = 0.05)
      val exPos = graft.ops.Similarity.hardPositives(emb, probes, "embedding", "vec_id",
        k = 5, minCos = 0.25)
      for ((pl, tb) <- Seq((5, 16), (5, 24), (4, 16))) {
        def negLsh = graft.ops.Similarity.hardNegativesLsh(emb, probes, "embedding", "vec_id",
          k = 5, maxCos = 0.25, minCos = 0.05, planes = pl, tables = tb)
        def posLsh = graft.ops.Similarity.hardPositivesLsh(emb, probes, "embedding", "vec_id",
          k = 5, minCos = 0.25, planes = pl, tables = tb)
        val rn = graft.ops.Similarity.recallAtK(exNeg, negLsh).collect().head.getAs[Double]("recall")
        val rp = graft.ops.Similarity.recallAtK(exPos, posLsh).collect().head.getAs[Double]("recall")
        println(f"$dir hardneg-lsh ${pl}x$tb: recall=$rn%.3f  hardpos-lsh: recall=$rp%.3f")
      }
    }
    spark.stop()
  }
}
