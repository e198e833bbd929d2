package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: compare Rocchio vs logistic AUC across hyperparameters. */
object LrTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.session("lr-tune")
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def auc(score: org.apache.spark.sql.Column): Double =
      graft.ops.Stats.rocAuc(d, col("lang") === "en", score)
        .select(col("auc")).collect()(0).getDouble(0)

    val wRows = graft.ops.Embeddings.trainLinearWeights(d, "text", col("lang") === "en").collect()
    val wr = new Array[Int](64)
    wRows.foreach(r => wr(r.getInt(0)) = r.getInt(1))
    val rocchioAuc = auc(round(graft.ops.Embeddings.linearScore(col("text"), wr, 1000.0, 0.0), 6))
    println(s"ROCCHIO auc=$rocchioAuc")

    for (epochs <- Seq(16, 24); lr <- Seq(512.0, 768.0); lrB <- Seq(4.0)) {
      val t0 = System.nanoTime()
      val m = graft.ops.Embeddings.trainLogisticWeights(d, "text", col("lang") === "en",
        epochs = epochs, lr = lr, lrBias = lrB).collect()
      val w = new Array[Int](64)
      var bq = 0
      m.foreach(r => if (r.getInt(0) >= 0) w(r.getInt(0)) = r.getInt(1) else bq = r.getInt(1))
      val bias = bq / 1048576.0
      val a = auc(round(graft.ops.Embeddings.linearScore(col("text"), w, 1000.0, bias), 6))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"LR epochs=$epochs lr=$lr%.0f lrB=$lrB%.0f auc=$a%.5f bq=$bq train=$dt%.1fs wmax=${w.map(math.abs).max}")
    }
    spark.stop()
  }
}
