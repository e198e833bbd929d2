package graft.tools

import org.apache.spark.sql.functions._

/** Two-phase driver for the durable-bucketed-catalog proof (run by
  * SourcesSpec in TWO SEPARATE JVMs, so the second session can only see
  * the table metadata through the derby metastore on disk):
  *
  *  - `write <warehouse> <dataDir>`: durable-catalog session, bucket two
  *    projections of documents on doc_id, verify the zero-exchange join
  *    in THIS session, print `WRITE_OK <rows>`.
  *  - `read <warehouse> <expectedRows>`: fresh durable-catalog session
  *    in a fresh JVM; `spark.table` must resolve from the metastore,
  *    the join must still plan bucketed with zero exchanges, rows must
  *    match. Prints `READ_OK <rows>`.
  *
  * Exits nonzero (via exception) on any failed assertion.
  */
object BucketedCatalog {
  def main(args: Array[String]): Unit = {
    val Array(phase, warehouse, arg3) = args
    val spark = graft.SparkEntry.session(s"bucketed-$phase", Some(warehouse))
    spark.sparkContext.setLogLevel("WARN")
    try {
      phase match {
        case "write" =>
          val docs = spark.read.parquet(s"$arg3/documents.parquet")
          graft.sources.GraftSource.writeBucketed(docs.select(col("doc_id"), col("lang")),
            "bkp_meta", s"$warehouse/data/meta", Seq("doc_id"), nBuckets = 4)
          graft.sources.GraftSource.writeBucketed(docs.select(col("doc_id"), col("n_chars")),
            "bkp_len", s"$warehouse/data/len", Seq("doc_id"), nBuckets = 4)
          val n = joinAndAssert(spark)
          println(s"WRITE_OK $n")
        case "read" =>
          val n = joinAndAssert(spark)
          require(n == arg3.toLong, s"read $n rows, expected $arg3")
          println(s"READ_OK $n")
      }
    } finally spark.stop()
  }

  /** The bucketed join under a pinned no-broadcast posture: SortMergeJoin,
    * zero Exchange, bucketed scan on both sides.
    */
  private def joinAndAssert(spark: org.apache.spark.sql.SparkSession): Long = {
    val a = spark.table("bkp_meta")
    val b = spark.table("bkp_len")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = a.join(b, Seq("doc_id"))
    val jp = joined.queryExecution.executedPlan.toString
    require(jp.contains("SortMergeJoin"), jp)
    require(!jp.contains("Exchange"), jp)
    require(jp.contains("Bucketed: true"), jp)
    require(jp.contains("SelectedBucketsCount: 4 out of 4"), jp)
    // the asserted plan is also the artifact: print it so a cluster-mode
    // run leaves a committed witness of the zero-exchange bucketed join
    println("PLAN_BEGIN")
    println(jp)
    println("PLAN_END")
    joined.count()
  }
}
