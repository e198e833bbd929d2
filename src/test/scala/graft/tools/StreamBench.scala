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
    // state-contract bookkeeping (round-11 verdict ask #6): the STREAM_r11
    // forensic run PROVED every stateful twin's curve plateaus; this run
    // FREEZES that as a regression gate. Each twin carries a state-rows
    // bound derived from its ingest rate × watermark horizon (never corpus
    // size), and the final-quartile slope of its state curve must be ≈ 0.
    // Violations fail the tool (exit 3) when the run is long enough to
    // have left the watermark horizon (the round-9 false alarm was a
    // 20-batch run living entirely inside it) — so a future watermark or
    // config change that reopens a leak fails THIS tool instead of
    // needing a fresh 200-batch forensic session.
    val violations = scala.collection.mutable.ListBuffer.empty[String]
    // doc twins: ts advances 60 s/batch against a 1 h watermark → ~62
    // batches of event time inside the horizon; 4× slack covers
    // operator-internal state multiplicities (e.g. dedup side state),
    // NOT growth — growth is what the slope gate catches.
    val docHorizonBatches = 62L

    // ---- exact dedup twin ----
    results += "exact_dedup" -> run(spark, batches, violations, "exact_dedup",
      maxStateRows = rows.toLong * docHorizonBatches * 4, { () =>
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
    results += "neardup_serve" -> run(spark, batches, violations, "neardup_serve",
      maxStateRows = rows.toLong * docHorizonBatches * 4, { () =>
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
    // stateless scoring projection: any state at all is a violation
    results += "bm25_score" -> run(spark, batches, violations, "bm25_score",
      maxStateRows = 0L, { () =>
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
    // complete-mode windowed agg: the events replay a FIXED historical
    // span, so state is bounded by the distinct (window, event_type)
    // groups of that span — a data-derived bound, not a horizon one
    // (the baseline itself is per-TYPE, 5 rows — not the right unit)
    val anomalyGroups = batchEv
      .select(window(col("ts"), "1 hour"), col("event_type")).distinct().count()
    results += "window_anomaly" -> run(spark, batches, violations, "window_anomaly",
      maxStateRows = 2L * anomalyGroups, { () =>
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
        ",\n \"sf\": \"" + sfDir + "\",\n \"state_contract_enforced\": " +
        (batches >= ContractMinBatches) + ",\n ", ",\n ", "\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
    // enforce AFTER the artifact is written, so a failing run still
    // leaves its curves on disk for forensics
    if (batches >= ContractMinBatches && violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[stream-bench] STATE CONTRACT: $v"))
      sys.exit(3)
    } else if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(
        s"[stream-bench] state contract NOT ENFORCED (batches < $ContractMinBatches, " +
          s"run may sit inside the watermark horizon): $v"))
    }
  }

  /** Runs shorter than this never fail the contract: the doc twins' 1 h
    * watermark at 60 s/batch means ~62 batches pass before eviction can
    * even begin — the round-9 "leak" was a 20-batch run read as one.
    * At 80+ the final quartile sits entirely past the horizon.
    */
  private val ContractMinBatches = 80

  /** Drive one twin for `batches` micro-batches; returns a JSON object of
    * p50/p95/max trigger latency (ms) and final state rows/bytes. The
    * first batch is recorded separately (it pays stream start + codegen).
    *
    * State contract (evaluated per twin, enforced by main when the run is
    * long enough): (1) PLATEAU — over the final quartile of the
    * state-rows curve, growth ≤ max(2% of the final value, one batch of
    * rows): a watermark-bounded operator past its horizon adds ≈ what it
    * evicts, so sustained final-quartile growth is a leak, not noise;
    * (2) BOUND — final state rows ≤ `maxStateRows` (ingest-rate ×
    * watermark horizon × slack, or a data-derived cap — NEVER corpus
    * size). Both land in the JSON (`plateau_delta`, `state_bound`,
    * `contract_ok`) so the artifact self-describes.
    */
  private def run(
      spark: SparkSession,
      batches: Int,
      violations: scala.collection.mutable.ListBuffer[String],
      name: String,
      maxStateRows: Long,
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
      // the state contract (scaladoc above): final-quartile slope + bound
      val quartile = stateCurve.drop(stateCurve.size * 3 / 4).toSeq
      val plateauDelta =
        if (quartile.size < 2) 0L else quartile.last - quartile.head
      val rowsPerBatchApprox =
        if (stateCurve.nonEmpty && stateCurve.head > 0) stateCurve.head else 200L
      val plateauOk = quartile.size < 2 ||
        plateauDelta <= math.max(0.02 * quartile.last, rowsPerBatchApprox.toDouble)
      val boundOk = stateRows <= maxStateRows
      if (!plateauOk) violations += s"$name: final-quartile state grew by " +
        s"$plateauDelta rows (${quartile.head} -> ${quartile.last}) — leak, not noise"
      if (!boundOk) violations += s"$name: final state $stateRows rows exceeds the " +
        s"horizon-derived bound $maxStateRows"
      s"""{"first_batch_ms": ${f(wall.headOption.getOrElse(-1.0))}, """ +
        s""""wall_p50_ms": ${f(pct(steady, 0.5))}, "wall_p95_ms": ${f(pct(steady, 0.95))}, """ +
        s""""wall_max_ms": ${f(if (steady.isEmpty) -1 else steady.max)}, """ +
        s""""trigger_p50_ms": ${f(pct(trig, 0.5))}, "trigger_p95_ms": ${f(pct(trig, 0.95))}, """ +
        s""""state_rows": $stateRows, "state_bytes": $stateBytes, """ +
        s""""batches_processed": ${trig.size}, """ +
        s""""plateau_delta": $plateauDelta, "state_bound": $maxStateRows, """ +
        s""""contract_ok": ${plateauOk && boundOk}, """ +
        s""""state_curve": [${stateCurve.mkString(", ")}]}"""
    } finally q.stop()
  }

  private def f(d: Double): String = BigDecimal(d)
    .setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
}
