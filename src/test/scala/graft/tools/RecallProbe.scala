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
      show("ivf 16/4 (driver)", graft.ops.Similarity.ivfSearch(idx16, emb, probes, "embedding", "vec_id", 5, nprobe = 4))
      show("ivf 16/6", graft.ops.Similarity.ivfSearch(idx16, emb, probes, "embedding", "vec_id", 5, nprobe = 6))
      show("ivf 16/8", graft.ops.Similarity.ivfSearch(idx16, emb, probes, "embedding", "vec_id", 5, nprobe = 8))
    }
    spark.stop()
  }
}
