package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Streaming operators driven end-to-end: file source over the real events
  * parquet → streaming aggregation → memory sink, checked against the
  * equivalent batch plan (stream/batch parity).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("windowed streaming aggregation matches the batch result") {
    // the file stream source wants a directory; stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val path = dir.toString
    val stream = EventStream.windowedAggregate(EventStream.readEvents(spark, path))
    val q = stream.writeStream
      .format("memory").queryName("win_out").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select($"window_start", $"event_type", $"n_events", $"sum_value")
        .collect().map(_.toString).sorted

      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batch = spark.read.schema(EventStream.eventSchema)
        .parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", timestamp_micros(($"ts" / 1000).cast("long")))
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
        .select($"w.start".as("window_start"), $"event_type", $"n_events", $"sum_value")
        .collect().map(_.toString).sorted

      assert(streamed.nonEmpty)
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("sessionization closes sessions at the gap and keeps state across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionize(input.toDS(), gapMillis = 60000)
    val q = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode("append")
      .start()
    try {
      def ev(id: Long, tMillis: Long, user: Long, v: Double) =
        EventStream.Event(id, new java.sql.Timestamp(tMillis), user, "click", v)

      // batch 1: user 1 has two events 10s apart (one open session)
      input.addData(ev(1, 0, 1, 1.0), ev(2, 10000, 1, 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // still open

      // batch 2: a third event 2 minutes later closes the first session
      input.addData(ev(3, 130000, 1, 4.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[EventStream.SessionAgg].collect()
      assert(closed.length == 1)
      assert(closed.head.n_events == 2 && closed.head.total_value == 3.0)
      assert(closed.head.session_start.getTime == 0 && closed.head.session_end.getTime == 10000)
    } finally q.stop()
  }
}
