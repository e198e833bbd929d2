package graft.tools

import org.apache.spark.sql.SparkSession

/** Drive GraftExtensions through the public extensions config + spark.sql
  * over real parquet. Run: sbt "Test/runMain graft.tools.DriveExtensions"
  */
object DriveExtensions {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    println("== vec_dot self-similarity (should be ~norm²) ==")
    spark.sql("SELECT vec_id, round(vec_dot(embedding, embedding), 4) AS norm2 FROM embeddings LIMIT 3").show()
    println("== simhash60 + word_shingles over documents ==")
    spark.sql("""SELECT doc_id, simhash60(text) AS sim,
                 size(word_shingles(text, 5)) AS n_shingles,
                 element_at(minhash_sig(transform(word_shingles(text, 5), s -> xxhash64(s)), 4), 1) AS mh1
                 FROM documents LIMIT 3""").show()
    println("== probe: wrong arg type gives analysis error ==")
    try { spark.sql("SELECT vec_dot(1, 2)").collect() }
    catch { case e: Exception => println("error (expected): " + e.getMessage.linesIterator.next()) }
    try { spark.sql("SELECT word_shingles(array(1), 2)").collect() }
    catch { case e: Exception => println("error (expected): " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
