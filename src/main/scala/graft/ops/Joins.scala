package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks natively, built scale-first.
  */
object Joins {

  /** As-of join: for every left row, the latest right row with the same
    * key and `right.ts <= left.ts` (inclusive — a right row AT the left
    * timestamp matches, the same rule as DuckDB/kdb ASOF). Left rows with
    * no prior right row keep nulls. The event-enrichment primitive:
    * "attach the most recent sensor reading / price / click to each
    * transaction".
    *
    * Why not a join: Spark has no as-of operator, and expressing it as a
    * range join (`l.ts >= r.ts` + row_number) explodes to every
    * (left, right) pair within each key before pruning — quadratic in
    * per-key row counts. This instead UNIONs both sides tagged, sorts
    * once per key, and carries the last non-null right value forward
    * (`last(..., ignoreNulls)` over an unbounded-preceding window): ONE
    * shuffle on the key, linear work, no candidate blow-up — the same
    * plan shape at any scale. At equal timestamps right rows sort before
    * left rows, which is what makes the match inclusive.
    *
    * Precondition (same class as capPerGroup's): `right` has at most one
    * row per (key, ts) — with several, which one wins the tie is
    * partition-order-dependent. Dedupe first (e.g. keep-max by a
    * tiebreaker column); the operator cannot see a violation cheaply.
    *
    * SKEW note: the window partitions by the join key, so one pathological
    * key (a null-ish sentinel id, a bot user) funnels its whole timeline
    * through one task — the same single-hot-key shape as
    * [[Sample.capTokensPerGroup]]. The work stays linear in that key's row
    * count (sort + one carry-forward pass, no quadratic blow-up), so the
    * funnel is a straggler, not an explosion; run [[Stats.keySkew]] first
    * and pre-split or drop sentinel keys when the top key dominates.
    *
    * Returns every left row + (`prefix`+c for each of `valueCols`,
    * `prefix`+tsCol) from the matched right row. Real enrichment attaches
    * several columns at once: the carry is ONE struct of all value
    * columns plus the right timestamp, so the window pass stays a single
    * `last(ignoreNulls)` regardless of how many columns ride along.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      prefix: String,
  ): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    require(!valueCols.contains(tsCol),
      s"$tsCol rides along as $prefix$tsCol already; drop it from valueCols")
    val lStruct = org.apache.spark.sql.types.StructType(left.schema.fields)
    val carryType = org.apache.spark.sql.types.StructType(
      valueCols.map(c =>
        org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)) :+
        org.apache.spark.sql.types.StructField("__rts", right.schema(tsCol).dataType))
    val lpart = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(carryType).as("__carry"),
      struct(left.columns.map(col): _*).as("__lrow"))
    val rpart = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      struct(valueCols.map(col) :+ col(tsCol).as("__rts"): _*).as("__carry"),
      lit(null).cast(lStruct).as("__lrow"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lpart.unionByName(rpart)
      .withColumn("__c", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col("__lrow." + c).as(c)) ++
        valueCols.map(c => col("__c." + c).as(prefix + c)) :+
        col("__c.__rts").as(prefix + tsCol): _*)
  }

  /** Single-value-column convenience form of [[asofJoin]]. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      prefix: String = "asof_",
  ): DataFrame =
    asofJoin(left, right, keyCol, tsCol, Seq(valueCol), prefix)

  /** Range (interval) join: every (point, interval) pair — optionally
    * within the same `keyCols` — with `lo <= point < hi` (half-open;
    * callers wanting inclusive `hi` pass `hi + 1` on integer domains).
    * The interval-attribution primitive: "which session / price band /
    * validity window does each event fall into".
    *
    * Why not `a.join(b, p >= lo && p < hi)`: a bare range predicate
    * (even with equi-keys, when per-key row counts are large) degenerates
    * to a nested-loop pairing of everything against everything in scope —
    * quadratic, and with no keys Spark literally plans
    * BroadcastNestedLoopJoin. This instead discretizes the domain into
    * `bucketWidth`-sized buckets: each point lands in exactly one bucket,
    * each interval replicates to the buckets it overlaps, and the match
    * becomes an EQUI-join on (keys, bucket) + a residual range filter —
    * one hash shuffle, partition-parallel, no blow-up. Each true pair
    * meets in exactly one bucket (the point's), so no post-join dedup is
    * needed.
    *
    * Pick `bucketWidth` near the typical interval length: replication
    * factor per interval is `(hi - lo) / bucketWidth + 1` (so cost scales
    * with `intervals × spans`), while a too-wide bucket piles unrelated
    * rows into the same join partition. Degenerate inputs (an interval
    * spanning millions of buckets) belong pre-split or capped upstream —
    * the replication is visible as the `sequence()` length in the plan.
    *
    * Points and intervals pass all their columns through. A non-empty
    * `intervalPrefix` renames EVERY non-key interval column; it is
    * REQUIRED (enforced) whenever a non-key interval column shares a name
    * with a point column — an unprefixed collision would make the
    * residual filter's references ambiguous at analysis time.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      keyCols: Seq[String] = Nil,
      intervalPrefix: String = "",
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = intervals.columns.filterNot(keyCols.contains)
      .toSet.intersect(points.columns.toSet)
    require(intervalPrefix.nonEmpty || collisions.isEmpty,
      s"interval columns ${collisions.mkString(", ")} collide with point columns; " +
        "pass a non-empty intervalPrefix")
    def bucket(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / bucketWidth).cast("long")
    def pfx(c: String): String = if (keyCols.contains(c)) c else intervalPrefix + c
    // the prefix itself must not map an interval column onto a point
    // column (e.g. prefix "p_" turning "rice" into an existing "p_rice"):
    // the duplicate output column would make the residual filter ambiguous
    val prefixedCollisions = intervals.columns.filterNot(keyCols.contains)
      .map(pfx).toSet.intersect(points.columns.toSet)
    require(prefixedCollisions.isEmpty,
      s"prefixed interval columns ${prefixedCollisions.mkString(", ")} collide " +
        "with point columns; choose a different intervalPrefix")
    val pointSide = points.withColumn("__b", bucket(col(pointCol)))
    val ivSide = intervals
      .select(intervals.columns.map(c => col(c).as(pfx(c))): _*)
      .withColumn("__b", explode(sequence(bucket(col(pfx(loCol))), bucket(col(pfx(hiCol))))))
    pointSide
      .join(ivSide, keyCols :+ "__b")
      .filter(col(pointCol) >= col(pfx(loCol)) && col(pointCol) < col(pfx(hiCol)))
      .drop("__b")
  }
}
