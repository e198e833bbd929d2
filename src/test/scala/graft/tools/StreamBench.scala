package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Micro-batch latency meter for the streaming serving twins (round-9
  * verdict ask #8): the streaming paths are parity-TESTED against their
  * batch twins but were never TIMED. This main drives the four headline
  * twins with MemoryStream batches of a fixed size and records, per
  * micro-batch, the trigger-execution latency and the state-store
  * footprint from Structured Streaming's own progress telemetry
  * (StreamingQueryProgress.durationMs / stateOperators) — the numbers an
  * operator would watch on a production ingest.
  *
  * Twins measured (batch = `rows` documents/events from the sf dir,
  * `batches` consecutive micro-batches):
  *  - exact_dedup: [[graft.ops.Dedup.exactDedupStream]] — watermark-bounded
  *    dropDuplicatesWithinWatermark state
  *  - neardup_serve: [[graft.ops.Dedup.minHashNearDupsStream]] vs a
  *    corpus-sized static history signature store (stream-static join)
  *  - bm25_score: [[graft.ops.Retrieval.bm25Stream]] vs the static stats
  *    store (stateless scoring projection)
  *  - window_anomaly: [[graft.streaming.EventStream.windowAnomalyStream]]
  *    — windowed aggregation + broadcast baseline, complete mode
  *
  * Usage: Test/runMain graft.tools.StreamBench <sfDir> <outJson>
  *   [rowsPerBatch] [batches]
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val rows = if (args.length > 2) args(2).toInt else 200
    val batches = if (args.length > 3) args(3).toInt else 20
    val spark = graft.SparkEntry.session("graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // the events parquet carries ts as TIMESTAMP_NTZ (LocalDateTime) after
    // the nanosAsLong normalization — convert to java.sql.Timestamp for the
    // MemoryStream tuple encoder regardless of which temporal class we get
    def toSqlTs(a: Any): java.sql.Timestamp = a match {
      case t: java.sql.Timestamp    => t
      case i: java.time.Instant     => java.sql.Timestamp.from(i)
      case l: java.time.LocalDateTime =>
        java.sql.Timestamp.valueOf(l)
      case other => sys.error(s"unexpected ts class ${other.getClass}")
    }
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), toSqlTs(r.get(1)), r.getLong(2), r.getString(3),
        r.getDouble(4)))

    def docBatch(b: Int): Seq[(Long, String, java.sql.Timestamp)] = {
      val ts = new java.sql.Timestamp(3600000L + b * 60000L)
      (0 until rows).map { i =>
        val (id, tx) = docs((b * rows + i) % docs.length)
        (b * 1000000L + id, tx, ts)
      }
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // ---- exact dedup twin ----
    results += "exact_dedup" -> run(spark, batches, { () =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = graft.ops.Dedup.exactDedupStream(
          input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
        .writeStream.format("noop").outputMode("append").start()
      (q, b => input.addData(docBatch(b): _*))
    })

    // ---- near-dup serving twin: stream vs corpus-sized history store ----
    val histSigs = graft.ops.Dedup.minHashSignatures(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id",
      numHashes = 128).persist()
    histSigs.count()
    results += "neardup_serve" -> run(spark, batches, { () =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = graft.ops.Dedup.minHashNearDupsStream(
          input.toDF().toDF("doc_id", "text", "ts"), histSigs,
          "text", "doc_id", "ts", numHashes = 128, bands = 32, threshold = 0.5)
        .writeStream.format("noop").outputMode("append").start()
      (q, b => input.addData(docBatch(b): _*))
    })

    // ---- BM25 scoring twin: stateless projection vs static stats ----
    val stats = graft.ops.Retrieval.bm25Stats(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id",
      "dup hash scan").persist()
    stats.count()
    results += "bm25_score" -> run(spark, batches, { () =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.ops.Retrieval.bm25Stream(
          input.toDF().toDF("doc_id", "text"), stats, "text", "doc_id",
          "dup hash scan")
        .writeStream.format("noop").outputMode("append").start()
      (q, b => input.addData(docBatch(b).map(r => (r._1, r._2)): _*))
    })

    // ---- windowed anomaly twin: stateful agg + broadcast baseline ----
    val batchEv = graft.streaming.EventStream.readEventsBatch(
      spark, s"$sfDir/events.parquet")
    val baseline = graft.streaming.EventStream.windowBaseline(batchEv).persist()
    baseline.count()
    results += "window_anomaly" -> run(spark, batches, { () =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val q = graft.streaming.EventStream.windowAnomalyStream(
          input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
          baseline, zThreshold = 2.0)
        .writeStream.format("memory").queryName(s"sb_anom_${System.nanoTime}")
        .outputMode("complete").start()
      (q, b => input.addData((0 until rows).map { i =>
        events((b * rows + i) % events.length)
      }: _*))
    })

    val json = results.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\n \"rows_per_batch\": " + rows + ",\n \"batches\": " + batches +
        ",\n \"sf\": \"" + sfDir + "\",\n ", ",\n ", "\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }

  /** Drive one twin for `batches` micro-batches; returns a JSON object of
    * p50/p95/max trigger latency (ms) and final state rows/bytes. The
    * first batch is recorded separately (it pays stream start + codegen).
    */
  private def run(
      spark: SparkSession,
      batches: Int,
      build: () => (StreamingQuery, Int => Unit),
  ): String = {
    val (q, feed) = build()
    val wall = scala.collection.mutable.ArrayBuffer.empty[Double]
    // per-batch state-row series: the long-run eviction witness (a
    // watermark-bounded operator must PLATEAU once event time outruns the
    // horizon; linear growth here is a state leak) — recentProgress only
    // keeps the last ~100 updates, so the curve is sampled in the loop
    val stateCurve = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      for (b <- 0 until batches) {
        val t0 = System.nanoTime()
        feed(b)
        q.processAllAvailable()
        wall += (System.nanoTime() - t0) / 1e6
        stateCurve += Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      }
      // progress telemetry: trigger latency per processed micro-batch and
      // the last state snapshot
      val progress = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
      val trig = progress.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toDouble))
      val state = progress.lastOption.toSeq
        .flatMap(_.stateOperators.toSeq)
      val stateRows = state.map(_.numRowsTotal).sum
      val stateBytes = state.map(_.memoryUsedBytes).sum
      def pct(xs: Seq[Double], p: Double): Double =
        if (xs.isEmpty) -1
        else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))
      val steady = wall.drop(1).toSeq // first batch pays start+codegen
      s"""{"first_batch_ms": ${f(wall.headOption.getOrElse(-1.0))}, """ +
        s""""wall_p50_ms": ${f(pct(steady, 0.5))}, "wall_p95_ms": ${f(pct(steady, 0.95))}, """ +
        s""""wall_max_ms": ${f(if (steady.isEmpty) -1 else steady.max)}, """ +
        s""""trigger_p50_ms": ${f(pct(trig, 0.5))}, "trigger_p95_ms": ${f(pct(trig, 0.95))}, """ +
        s""""state_rows": $stateRows, "state_bytes": $stateBytes, """ +
        s""""batches_processed": ${trig.size}, """ +
        s""""state_curve": [${stateCurve.mkString(", ")}]}"""
    } finally q.stop()
  }

  private def f(d: Double): String = BigDecimal(d)
    .setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
}
