package graft.tools

import org.apache.spark.sql.functions.col

/** One-shot generator for the COMMITTED ANN index fixtures — the
  * model-checkpoint lifecycle (`q_bpe_apply_fixed`'s pattern applied to
  * the ANN searches): train once here, save via the production
  * `saveIvf`/`savePq` writers, commit the few-KB parquet to the repo, and
  * every later session — Spark query AND DuckDB oracle — reads the same
  * artifact instead of retraining. That turns "search under a committed
  * index" into a deterministic, fully oracle-able pipeline, which
  * per-session k-means training (aggregation-order-sensitive across
  * physical layouts, see `trainIvf`'s determinism scope) can never be.
  *
  *   sbt "Test/runMain graft.tools.AnnFixtures [sfDir] [outDir]"
  *
  * Defaults: train on /root/testdata/sf0.1 (2,000 vectors — the larger
  * driver correctness SF), write /root/repo/fixtures/ann. Configs match
  * the driver rows: IVF nlist=16, PQ m=16 ksub=16.
  */
object AnnFixtures {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/fixtures/ann"
    val spark = graft.SparkEntry.session("graft-ann-fixtures")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ivf = graft.ops.Similarity.trainIvf(emb, "embedding", "vec_id", nlist = 16)
    graft.ops.Similarity.saveIvf(ivf, spark, s"$outDir/ivf16")
    val pq = graft.ops.Similarity.trainPq(emb, "embedding", "vec_id", m = 16, ksub = 16)
    graft.ops.Similarity.savePq(pq, spark, s"$outDir/pq16x16")
    // the SemDeDup steady-state quantizer at the correctness-SF cell
    // count (semanticCellsFor = 8 at both driver SFs)
    val sem = graft.ops.Similarity.trainIvf(emb, "embedding", "vec_id", nlist = 8)
    graft.ops.Similarity.saveIvf(sem, spark, s"$outDir/sem8")
    println(s"ANN fixtures written to $outDir (trained on $sfDir): " +
      s"ivf16 nlist=${ivf.nlist}, pq16x16 m=${pq.m} ksub=${pq.ksub} dim=${pq.dim}, " +
      s"sem8 nlist=${sem.nlist}")
    spark.stop()
  }
}
