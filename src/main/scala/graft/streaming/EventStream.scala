package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events stream.
  *
  * The reference has no streaming surface; these are part of the
  * training-pipeline extension set. Design: the streaming plan is the same
  * declarative shape as the batch `q_events_window` aggregation, so a
  * pipeline can run identical logic in both modes (the lambda/kappa parity
  * Spark's unified API exists for). State is bounded by watermarks; the
  * shuffle key is (window, event_type) — partial aggregation applies
  * map-side before the state store, so state size scales with distinct
  * keys, not event volume.
  */
object EventStream {

  /** Event row schema. The events table's `ts` has shipped in two physical
    * forms across testdata generations — nanosecond int64 and plain
    * `timestamp[us]` — so the schema is parameterized on the stored type;
    * `normalizeTs` converts either to microsecond TimestampType.
    */
  def eventSchema(tsType: DataType = TimestampType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Normalize the `ts` column to microsecond TimestampType regardless of
    * which physical form the parquet stored. Integer `div` keeps the ns→µs
    * arithmetic in long — a double-valued division loses precision on ns
    * epochs (~1.7e18 > 2^53) and can shift an event across a window
    * boundary.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // NTZ decodes when the footer lacks isAdjustedToUTC; watermarks and
    // window() require TimestampType. The cast interprets the wall-clock
    // in the session timezone — callers pin it to UTC, making the cast an
    // identity on the stored microseconds.
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df // TimestampType: already microseconds
  }

  /** Streaming read of an events parquet path (file-source). The stream
    * schema must be declared up front, so probe the on-disk `ts` type with
    * a batch footer read (falling back to TimestampType for an
    * as-yet-empty directory) and normalize after.
    *
    * SESSION-CONFIG SIDE EFFECT (shared with [[readEventsBatch]]): this
    * sets `spark.sql.session.timeZone=UTC` and
    * `spark.sql.legacy.parquet.nanosAsLong=true` on the CALLER'S session
    * and leaves them set — the ns→µs long arithmetic and the NTZ cast in
    * [[normalizeTs]] are only correct under UTC, and a scoped save/restore
    * would race concurrent queries on the same session (Spark session
    * config is session-global, not per-query). Any timestamp
    * parsing/rendering elsewhere in the session switches to UTC after the
    * first events read. Callers that need a different session timezone
    * should read events through `SparkSession.newSession()` (separate
    * conf, shared catalog/cache), or pin UTC session-wide up front as
    * `Bench.main` and `SparkEntry.session` do.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val tsType = scala.util
      .Try(spark.read.parquet(path).schema("ts").dataType)
      .getOrElse(TimestampType: DataType)
    normalizeTs(spark.readStream.schema(eventSchema(tsType)).parquet(path))
  }

  /** Batch read of an events parquet path with the same ts normalization
    * as the stream — batch/streaming parity for the events family. Shares
    * [[readEvents]]'s documented session-config side effect (UTC session
    * timezone + nanosAsLong stay set on the caller's session).
    */
  def readEventsBatch(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeTs(spark.read.parquet(path))
  }

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * state. Append mode emits a window once the watermark passes its end.
    */
  def windowedAggregate(
      events: DataFrame,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "2 hours",
  ): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Per-(event_type, window) stats — the shared front of the anomaly
    * meter, batch form: one corpus-scale windowed aggregation down to a
    * `|types × windows|`-bounded frame. `sum_value` is rounded to 4 dp
    * (the [[windowedAggregate]] convention) so downstream baselines are
    * engine-reproducible.
    */
  def windowStats(
      events: DataFrame,
      windowDuration: String = "1 hour",
  ): DataFrame =
    events
      // typeless events carry no monitoring identity: excluded up front
      // so the batch join path and the stream map-literal path (which
      // cannot hold a null key) agree on exactly the same rows
      .filter(col("event_type").isNotNull)
      .groupBy(window(col("ts"), windowDuration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("event_type"), col("w.start").as("window_start"),
        col("n_events"), col("sum_value"))

  /** The per-type BASELINE over [[windowStats]] windows — `(event_type,
    * mean_n, std_n, mean_v, std_v)` (population stddev: a single-window
    * type has std 0, not null). Persist it (parquet) and hand it to
    * [[windowAnomalyStream]] — the train-once store of the monitoring
    * lifecycle; refresh on regime change.
    */
  def windowBaseline(
      events: DataFrame,
      windowDuration: String = "1 hour",
  ): DataFrame =
    windowStats(events, windowDuration)
      .groupBy(col("event_type"))
      .agg(
        avg(col("n_events")).as("mean_n"), stddev_pop(col("n_events")).as("std_n"),
        avg(col("sum_value")).as("mean_v"), stddev_pop(col("sum_value")).as("std_v"))

  /** Windowed anomaly meter — the monitoring shape over an event table:
    * each (event_type, window) scores `z = (x − mean) / std` against the
    * per-type baseline for BOTH the event count and the value sum, and
    * flags windows with `|z| ≥ zThreshold` on either. A type whose
    * baseline is flat (std 0) never flags on that signal (z is null
    * there, not ±∞). Batch form derives the baseline from the frame
    * itself; use [[windowAnomalyStream]] with a PERSISTED baseline for
    * the live twin.
    *
    * Scale shape: the corpus collapses in the ONE windowed aggregation;
    * the baseline is a per-type broadcast; flags are a projection over
    * the windows frame — nothing downstream of the first agg is
    * corpus-sized.
    */
  def windowAnomaly(
      events: DataFrame,
      windowDuration: String = "1 hour",
      zThreshold: Double = 3.0,
  ): DataFrame = {
    val w = windowStats(events, windowDuration)
    anomalyFlags(
      w.join(broadcast(windowBaseline(events, windowDuration)), Seq("event_type")),
      zThreshold)
  }

  /** Trailing-baseline variant of [[windowAnomaly]] — regime-change
    * robust: each (type, window) scores against the mean/std of its own
    * PRECEDING `lookback` windows instead of the all-time per-type
    * baseline, so a permanent level shift alarms once and then
    * re-baselines rather than flagging forever. Windows with fewer
    * than `minPrior` predecessors (the warm-up head of each type) emit
    * null z and never flag. "Preceding" counts observed windows (rows),
    * not wall-clock periods — a silent gap simply doesn't contribute.
    *
    * Scale shape: the trailing window function runs over the
    * |types × windows| stats frame, never the corpus; one corpus
    * aggregation + one small-frame window pass.
    */
  def windowAnomalyTrailing(
      events: DataFrame,
      windowDuration: String = "1 hour",
      lookback: Int = 24,
      minPrior: Int = 3,
      zThreshold: Double = 3.0,
  ): DataFrame = {
    require(lookback >= 1, "lookback must be >= 1")
    require(minPrior >= 1 && minPrior <= lookback,
      "minPrior must be in [1, lookback]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("window_start"))
      .rowsBetween(-lookback, -1)
    def gated(c: Column): Column = when(col("__np") >= minPrior, c)
    anomalyFlags(
      windowStats(events, windowDuration)
        .withColumn("__np", count(lit(1)).over(w))
        .withColumn("mean_n", gated(avg(col("n_events")).over(w)))
        .withColumn("std_n", gated(stddev_pop(col("n_events")).over(w)))
        .withColumn("mean_v", gated(avg(col("sum_value")).over(w)))
        .withColumn("std_v", gated(stddev_pop(col("sum_value")).over(w))),
      zThreshold)
  }

  /** Streaming twin of [[windowAnomaly]] against a PRECOMPUTED
    * [[windowBaseline]] frame: the per-type baseline (driver-sized by
    * construction) collects at query-build time and ships as map
    * literals, so the plan is one watermarked windowed aggregation plus
    * a stateless projection — no stream-side join after the aggregation
    * (which append mode would reject), any append-capable sink. Works
    * identically on a batch frame (parity-tested).
    */
  def windowAnomalyStream(
      stream: DataFrame,
      baseline: DataFrame,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "2 hours",
      zThreshold: Double = 3.0,
  ): DataFrame = {
    val rows = baseline
      .select(col("event_type").cast("string"), col("mean_n").cast("double"),
        col("std_n").cast("double"), col("mean_v").cast("double"),
        col("std_v").cast("double"))
      .collect()
    // per-stat maps skip null cells (an all-null-value type has null
    // mean_v/std_v): the missing key reads back as null via element_at,
    // so z is null and the flag false — the same outcome the batch
    // path's join produces, instead of a Row.getDouble crash here
    def m(i: Int) = typedLit(
      rows.filter(r => !r.isNullAt(0) && !r.isNullAt(i))
        .map(r => r.getString(0) -> r.getDouble(i)).toMap)
    val stats = windowStats(
      stream.withWatermark("ts", watermarkDelay), windowDuration)
    anomalyFlags(
      stats
        .withColumn("mean_n", element_at(m(1), col("event_type")))
        .withColumn("std_n", element_at(m(2), col("event_type")))
        .withColumn("mean_v", element_at(m(3), col("event_type")))
        .withColumn("std_v", element_at(m(4), col("event_type"))),
      zThreshold)
  }

  /** Shared flag tail: z-scores (null when the baseline std is 0 or the
    * type is unknown to the baseline) + the either-signal flag.
    */
  private def anomalyFlags(joined: DataFrame, zThreshold: Double): DataFrame = {
    val zN = when(col("std_n") > 0,
      (col("n_events") - col("mean_n")) / col("std_n"))
    val zV = when(col("std_v") > 0,
      (col("sum_value") - col("mean_v")) / col("std_v"))
    joined.select(
      col("event_type"), col("window_start"), col("n_events"), col("sum_value"),
      round(zN, 6).as("z_volume"), round(zV, 6).as("z_value"),
      (coalesce(abs(zN) >= zThreshold, lit(false)) ||
        coalesce(abs(zV) >= zThreshold, lit(false))).as("anomalous"))
  }

  /** Batch twin of [[sessionize]]: gap-based sessions as a declarative
    * plan — a lag-derived session-boundary flag, a running sum for the
    * session id, then a per-(user, session) aggregate. Two window passes
    * and one aggregation, all partitioned by user_id, so the only wide
    * operation is a single shuffle on the user key; each user's events
    * stream through in timestamp order (no full-partition
    * materialization beyond one user's rows).
    *
    * Session bounds are emitted as microsecond epochs: numeric outputs
    * compare exactly across engines, where timestamp rendering may not.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = gapMinutes * 60L * 1000000L
    val tsUs = unix_micros(col("ts"))
    val newSession =
      when(tsUs - lag(tsUs, 1).over(w) > gapUs, 1).otherwise(0) // first event → 0
    events
      .withColumn("session_id", sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(tsUs).as("session_start_us"),
        max(tsUs).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
      )
  }

  /** Per-user funnel stage: how far each user progresses through the
    * ordered `steps` — the classic product-analytics conversion query
    * as ONE user-keyed aggregation. Greedy first-match semantics (the
    * standard convention): the chain anchors at the user's FIRST
    * step-1 event, then each later step matches its earliest
    * strictly-later occurrence; with `withinMinutes`, every subsequent
    * step must land within that window of the anchor (greedy — the
    * anchor does not re-try later step-1 events; exact for the
    * unwindowed case, the documented product-analytics convention for
    * the windowed one).
    *
    * Output: `(userCol, stage)` where stage ∈ [0, steps.length] is the
    * number of steps completed.
    *
    * Scale shape: one hash shuffle on the user; events fold per user
    * via sorted `collect_list` + the `aggregate` HOF — state per user
    * is one (stage, ts, ts) struct, comparisons on exact
    * `unix_micros` longs. Only STEP-TYPE events are collected (a
    * `when(...isin(steps))` inside the `collect_list` — nulls are
    * skipped, so non-step events never ride the array while every
    * user still appears, stage 0 on an empty list). This bounds the
    * per-user array by that user's funnel-relevant events, not their
    * full history — a bot firing millions of unrelated events costs
    * one counter, not one giant array in a single task. A user hot in
    * the step types themselves remains the caller's skew to know
    * about (same posture as [[sessionizeBatch]]); no window function,
    * no self-join per step.
    */
  def funnelStages(
      events: DataFrame,
      steps: Seq[String],
      withinMinutes: Option[Long] = None,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
  ): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val k = steps.length
    val stepsLit = typedLit(steps)
    val withinUs = withinMinutes.map(_ * 60L * 1000000L)
    val evs = sort_array(collect_list(when(
      col(typeCol).isin(steps.map(s => s: Any): _*),
      struct(unix_micros(col(tsCol)).as("t"), col(typeCol).as("ty")))))
    // acc: (stage, t_anchor) — t_prev is the fold's last-advanced t; we
    // fold with (stage, tprev, tanchor)
    val init = struct(lit(0).as("stage"), lit(Long.MinValue).as("tprev"),
      lit(Long.MinValue).as("tanchor"))
    def step(acc: Column, e: Column): Column = {
      val stage = acc.getField("stage")
      val tprev = acc.getField("tprev")
      val tanchor = acc.getField("tanchor")
      val t = e.getField("t")
      val wantedType = element_at(stepsLit, stage + 1) === e.getField("ty")
      val ordered = stage === 0 || t > tprev
      val inWindow = withinUs match {
        case Some(us) => stage === 0 || t - tanchor <= us
        case None => lit(true)
      }
      when(stage < k && wantedType && ordered && inWindow,
        struct(
          (stage + 1).as("stage"),
          t.as("tprev"),
          when(stage === 0, t).otherwise(tanchor).as("tanchor")))
        .otherwise(acc)
    }
    events
      .groupBy(col(userCol))
      .agg(aggregate(evs, init, step _).getField("stage").as("stage"))
  }

  /** The funnel REPORT over [[funnelStages]]: one row per step with the
    * number of users who completed at least that step (cumulative by
    * construction — step k's users are a subset of step k−1's). The
    * per-stage histogram is |steps|+1 rows; the reverse-cumulative sum
    * runs on that driver-sized frame, never on users.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      withinMinutes: Option[Long] = None,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
  ): DataFrame = {
    val stages = funnelStages(events, steps, withinMinutes, userCol, tsCol, typeCol)
    val hist = stages.groupBy(col("stage")).agg(count(lit(1)).as("n"))
    // users at deeper stages also completed this step → reverse cumsum
    val w = Window.orderBy(col("step"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val spark = events.sparkSession
    import spark.implicits._
    steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }
      .toDF("step", "event_type")
      .join(hist.withColumnRenamed("stage", "step"), Seq("step"), "left")
      .withColumn("n_users", sum(coalesce(col("n"), lit(0L))).over(w))
      .select(col("step"), col("event_type"), col("n_users"))
  }

  /** Cohort retention — the third classic alongside [[sessionizeBatch]]
    * and [[funnel]]: users cohorted by the calendar date of their FIRST
    * `cohortEvent`, then for each day offset `0..maxDays`, how many of
    * the cohort were active (any event) exactly that many days later.
    * Output: `(cohort_date, day_offset, n_active, n_cohort)` — one row
    * per (cohort, offset) that had any activity; `day_offset = 0` is
    * the cohort day itself, so `n_active = n_cohort` there by
    * construction.
    *
    * Scale shape: events collapse to distinct (user, date) activity
    * rows at the scan; the cohort frame is one user-keyed min-
    * aggregation; the join keys on the user; counts are map-side
    * combined. Output is |cohorts| × |offsets| rows — calendar-sized,
    * never user-sized.
    */
  def retention(
      events: DataFrame,
      cohortEvent: String,
      maxDays: Int = 30,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
  ): DataFrame = {
    require(maxDays >= 0, "maxDays must be >= 0")
    val cohorts = events
      .filter(col(typeCol) === cohortEvent)
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    val cohortSizes = cohorts.groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("n_cohort"))
    val activity = events
      .select(col(userCol), to_date(col(tsCol)).as("active_date"))
      .dropDuplicates(userCol, "active_date")
    cohorts
      .join(activity, Seq(userCol))
      .withColumn("day_offset", datediff(col("active_date"), col("cohort_date")))
      .filter(col("day_offset") >= 0 && col("day_offset") <= maxDays)
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(cohortSizes, Seq("cohort_date"))
      .select(col("cohort_date"), col("day_offset"), col("n_active"), col("n_cohort"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionAgg(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  // not private: the state encoder's generated code needs public accessors
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): a user's session closes when `gapMillis`
    * passes without an event; closed sessions are emitted downstream.
    * State per user is O(1); the shuffle key is user_id.
    */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._

    def update(userId: Long, it: Iterator[Event], state: GroupState[SessionState]): Iterator[SessionAgg] = {
      val sorted = it.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionAgg]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMillis =>
            cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
          case Some(s) =>
            closed ::= SessionAgg(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach(state.update)
      closed.reverseIterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
