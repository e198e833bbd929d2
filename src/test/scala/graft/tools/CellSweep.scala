package graft.tools

import org.apache.spark.sql.functions._

/** Cell-count sweep for the SemDeDup rows at a given dir: measures pair
  * recall vs the sampled exact truth and wall seconds per nClusters, so
  * the scale-aware cell divisor is chosen from data, not hope.
  */
object CellSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val configs = args.drop(1).map { a =>
      val p = a.split(":"); (p(0).toInt, if (p.length > 1) p(1).toInt else 2)
    }
    val spark = graft.SparkEntry.session("graft-cellsweep")
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val probeOneIn = math.max(4L, n / 500L).toInt
    val truth = graft.ops.Dedup.exactCosinePairs(emb, "embedding", "vec_id",
      threshold = 0.45, probeOneIn = probeOneIn).persist()
    truth.count()
    for ((c, np) <- configs) {
      val t0 = System.nanoTime()
      val r = graft.ops.Dedup.pairRecall(truth,
        graft.ops.Dedup.semanticDedup(emb, "embedding", "vec_id",
          nClusters = c, threshold = 0.45, nProbe = np)).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CELLSWEEP cells=$c%-4d nProbe=$np%-2d recall=${r.getAs[Double]("recall")}%.4f " +
        f"n_true=${r.getAs[Long]("n_true")} sec=$sec%.2f")
    }
    spark.stop()
  }
}
