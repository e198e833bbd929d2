package graft.tools

import org.apache.spark.sql.functions._

/** Drive D4 diversification over the real embeddings table: cell sizes,
  * prototypicality spread, kept-vs-dropped quota, and the physical
  * plans. Run: sbt "Test/runMain graft.tools.DriveD4"
  */
object DriveD4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.SparkEntry.session("drive-d4")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val index = graft.ops.Similarity.trainIvf(emb, "embedding", "vec_id", nlist = 8)

    println("== prototypicality: per-cell count + proto range ==")
    val proto = graft.ops.Dedup.prototypicality(emb, "embedding", "vec_id", index)
    proto.groupBy("cell").agg(count(lit(1)).as("n"),
      round(min("proto"), 3).as("min_proto"), round(max("proto"), 3).as("max_proto"))
      .orderBy("cell").show()
    println("== diversify(drop 25%): kept per cell (expect n - ceil(n/4)) ==")
    val kept = graft.ops.Dedup.diversify(emb, "embedding", "vec_id", index, 0.25)
    kept.groupBy("cell").agg(count(lit(1)).as("kept_n"),
      round(max("proto"), 3).as("max_kept_proto")).orderBy("cell").show()
    println(s"total: ${emb.count()} in, ${kept.count()} kept")
    println("== physical plan: prototypicality (expect no Exchange) ==")
    proto.explain("formatted")
    println("== physical plan: diversify (expect ONE hash exchange) ==")
    kept.explain("formatted")
    spark.stop()
  }
}
