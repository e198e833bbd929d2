package graft.tools

import org.apache.spark.sql.functions._

/** Sampled pairwise-hamming density of a corpus's simhash sketches — the
  * number that decides whether radius-r near-dup OUTPUT is itself
  * quadratic (in which case no banding scheme can beat it) or the
  * candidate volume is banding overhead. A uniform sample of m sketches
  * gives C(m,2) exact hamming measurements; density(≤r) × C(n,2)
  * estimates the true pair output.
  *
  * Usage: sbt "Test/runMain graft.tools.SimPairDensity <sfDir> [sampleSize]"
  */
object SimPairDensity {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val m = if (args.length > 1) args(1).toInt else 5000
    val spark = graft.SparkEntry.session("graft-simpairdensity")
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    // deterministic sample: hash-ordered first m (no Math.random in tools
    // either — reruns must agree)
    val sims = docs
      .select(col("doc_id"), graft.ops.Dedup.simHash(col("text")).as("sim"))
      .orderBy(xxhash64(col("doc_id")))
      .limit(m)
      .select(col("sim"))
      .collect()
      .map(_.getLong(0))
    var hist = new Array[Long](61)
    var i = 0
    while (i < sims.length) {
      var j = i + 1
      while (j < sims.length) {
        val h = java.lang.Long.bitCount(sims(i) ^ sims(j))
        hist(math.min(h, 60)) += 1
        j += 1
      }
      i += 1
    }
    val pairs = sims.length.toLong * (sims.length - 1) / 2
    val totalPairs = n * (n - 1) / 2
    println(s"SIMDENSITY n=$n sample=${sims.length} samplePairs=$pairs")
    var cum = 0L
    for (r <- 0 to 20) {
      cum += hist(r)
      val density = cum.toDouble / pairs
      val est = density * totalPairs
      println(f"SIMDENSITY r=$r%-3d cumPairs=$cum%-9d density=$density%.3e estTrueOutput=$est%.3e")
    }
    spark.stop()
  }
}
