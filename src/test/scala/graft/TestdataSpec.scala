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
}
