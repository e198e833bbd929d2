package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Shingles}

/** Stage-wise timing of the MinHash near-dup pipeline. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val (nh, bands, k) = (128, 32, 5)
    val rows = nh / bands
    val shingled = docs.select(col("doc_id").as("id"),
        Shingles.wordShingles(col("text"), k).as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingles only")(shingled.count())
    time("shingles again (warm)")(shingled.count())
    val withSig = shingled.withColumn("sig", Dedup.signatureOfShingles(col("shingles"), nh))
    time("sig")(withSig.count())
    time("sig warm")(withSig.count())
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows)).as("bucket"))
    }
    val banded = withSig.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    time("banded")(banded.count())
    time("banded warm")(banded.count())
    val full = Dedup.minHashNearDups(docs, "text", "doc_id", numHashes = nh, bands = bands,
      shingleSize = k, threshold = 0.5)
    time("full op")(full.count())
    time("full op warm")(full.count())
    spark.stop()
  }
}
