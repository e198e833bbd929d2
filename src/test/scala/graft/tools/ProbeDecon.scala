package graft.tools

import org.apache.spark.sql.functions._

/** Round-13 probe for q_text_decontam's scaling shape: the row measured
  * 4.78× at sf300/sf100 (floor 3×), and the suspected mechanism is
  * OUTPUT-shaped — the driver query's benchmark side is a 2% corpus
  * sample (grows with the corpus) and the synthetic 30-word vocabulary
  * bounds the distinct 5-gram space at 30^5 = 24.3M, so the benchmark
  * hash set saturates the space and the matched-(id, hash) join emission
  * grows super-linearly until saturation. This measures that emission
  * (Σ n_overlap = the join's output rows) and the benchmark's distinct
  * hash count per rung, the ProbeWinnow discipline.
  *
  *   r12/javarun.sh 48g graft.tools.ProbeDecon <sfDir>
  */
object ProbeDecon {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/tools/sf100"
    val spark = graft.SparkEntry.session("graft-probe-decon")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val benchHashes = bench
      .select(explode(array_distinct(transform(
        graft.functions.GraftFunctions.wordShingles(col("text"), 5),
        s => xxhash64(s)))).as("__h"))
      .dropDuplicates("__h").count()
    val t0 = System.nanoTime()
    val m = graft.ops.TextOps.contaminationCounts(docs, bench, "text", "doc_id", n = 5)
      .agg(count(lit(1)).as("docs_hit"),
        coalesce(sum(col("n_overlap")), lit(0L)).as("emission")).collect().head
    println(f"PROBE_DECON docs=$nDocs bench_distinct_hashes=$benchHashes " +
      f"docs_hit=${m.getLong(0)} emission=${m.getLong(1)} " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
