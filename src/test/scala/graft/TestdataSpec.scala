package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types.TimestampType

/** Guard against testdata regeneration drift. Round 5 lost 9 driver
  * queries because the driver regenerated `/root/testdata` with
  * `events.ts` as `timestamp[us]` where the previous generation stored
  * nanosecond int64 — the load helper assumed one physical form and every
  * events-family query failed analysis. This spec loads every table the
  * driver generates through the *same helpers SparkEntry uses*, so any
  * future schema drift fails `sbt test` instead of silently dropping
  * driver rows.
  */
class TestdataSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("every testdata table loads and analyzes through the driver helpers") {
    for (name <- tables) {
      val df =
        if (name == "events") SparkEntry.events(spark, dir)
        else SparkEntry.t(spark, dir, name)
      // force analysis + one real row so a physical-read incompatibility
      // (not just a footer mismatch) also surfaces
      assert(df.queryExecution.analyzed != null, s"$name failed analysis")
      assert(df.limit(1).count() == 1L, s"$name is empty or unreadable")
    }
  }

  test("events ts normalizes to TimestampType under either physical form") {
    val df = SparkEntry.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    // and the normalized column is actually usable in a window expression
    // (the exact shape that broke in round 5)
    val n = df
      .groupBy(org.apache.spark.sql.functions.window(df("ts"), "1 hour"))
      .count()
      .count()
    assert(n > 0)
  }

  test("table memo pins the first listing; clearTableMemo is the invalidation rule") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("memo_stale").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(s"$tmp/gen.parquet")
    assert(SparkEntry.t(spark, tmp, "gen").count() == 1L)
    // regenerate the directory with MORE rows: the memo must keep serving
    // the first listing (write-once invariant) until explicitly cleared —
    // spark.catalog.refresh* cannot see the private memo
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/gen.parquet")
    val stale = try SparkEntry.t(spark, tmp, "gen").count() catch {
      // a vanished first-listing file is also an acceptable stale outcome
      case _: Throwable => -1L
    }
    assert(stale != 3L, "memo unexpectedly saw the regenerated directory")
    SparkEntry.clearTableMemo()
    assert(SparkEntry.t(spark, tmp, "gen").count() == 3L,
      "clearTableMemo must force a fresh listing")
  }
}
