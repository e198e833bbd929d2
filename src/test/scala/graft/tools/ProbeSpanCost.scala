package graft.tools

import org.apache.spark.sql.functions._

/** Stage-cost decomposition of dedupSpans at a rung (round-14 ask #1
  * diagnosis): the operator's cold wall-time splits across (a) the
  * shingle+hash fingerprint scan, (b) the df-gate aggregation over
  * near-unique hash groups, (c) the starts build (scan #2 + broadcast
  * semi-join + per-doc aggregation), (d) the reassembly join. ProbeSpan
  * proved the PAYLOAD linear across rungs; if the wall-time ratio is
  * super-linear, one of these stages is paying an execution-layer cost
  * (per-task aggregation-table spill is the suspect: groups/task grows
  * with the corpus on a fixed-size box) — this names which.
  *
  *   Test/runMain graft.tools.ProbeSpanCost <sfDir>
  */
object ProbeSpanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SparkEntry.session("probe-span-cost")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val k = 8
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val shingleHashes = transform(
      graft.functions.GraftFunctions.wordShingles(col("text"), k),
      s => graft.functions.GraftFunctions.md5Long60(s.cast("binary")))
    def inv = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), posexplode(shingleHashes).as(Seq("__pos", "__h")))

    // (a) fingerprint scan alone: no shuffle, counts positions
    time("a_fingerprint_scan")(
      inv.select(count(lit(1))).collect())
    // (b) df-gate aggregation (the near-unique-groups shuffle + agg)
    val dup = time("b_dfgate_agg") {
      val d = inv.groupBy(col("__h"))
        .agg(min(col("doc_id")).as("__i0"), max(col("doc_id")).as("__i1"))
        .filter(col("__i0") =!= col("__i1"))
        .select(col("__h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  dup_hashes=${d.count()}")
      d
    }
    // (c) starts build: fingerprint scan #2 + broadcast semi + per-doc agg
    val starts = time("c_starts_build") {
      val s0 = inv.join(broadcast(dup), Seq("__h"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("__pos"))).as("__starts"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  dup_docs=${s0.count()}")
      s0
    }
    // (d) reassembly join + span filter over the broadcast starts
    time("d_reassembly") {
      val toks = graft.ops.TextOps.tokens(col("text"))
      docs.join(broadcast(starts), Seq("doc_id"), "left")
        .withColumn("__starts", coalesce(col("__starts"), array()))
        .withColumn("__kept", filter(toks, (t, i) =>
          !exists(col("__starts"), s => s <= i && i < s + k)))
        .select(col("doc_id"),
          array_join(col("__kept"), " ").as("text_dedup"),
          size(toks).cast("long").as("n_tokens"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
