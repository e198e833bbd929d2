package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row

import graft.schema.Schema

/** End-to-end: the reference's five worked examples
  * (reference: examples/001-005.js) compiled by graft and executed by Spark
  * over the mages fixture (reference: examples/fixture.json), asserting the
  * actual result sets — stronger than the reference's pipeline-JSON goldens.
  */
class ExamplesSpec extends AnyFunSuite {
  import SparkSpec.{mages, magesSchemaJson}

  private def run(query: String) = {
    val schema = Schema.fromString(magesSchemaJson).fold(e => fail(e), identity)
    val compiled = Compiler.compile(schema, query).fold(e => fail(s"$query → $e"), identity)
    compiled.run(mages)
  }

  test("example 001: bad guys") {
    val got = run("""SELECT name WHERE bad_guy = true""").collect().map(_.getString(0)).toSet
    assert(got == Set("sephiroth", "kefka palazzo", "ultimecia"))
  }

  test("example 002: minimal age of female mages (global agg collects names)") {
    val rows = run(
      """SELECT name, MIN(details.biographical.age) AS min_age
        |WHERE details.physical.gender = "female"
        |GROUP BY NULL""".stripMargin.replace("\n", " ")).collect()
    assert(rows.length == 1)
    val row = rows.head
    val names = row.getAs[Seq[String]]("name").toSet
    assert(names == Set("yuna", "garnet til alexandros xvii", "beatrix", "ultimecia"))
    assert(row.getAs[Double]("min_age") == 16.0)
    assert(row.isNullAt(row.fieldIndex("_id")))
  }

  test("example 003: average power for mages under 170cm, by class") {
    val rows = run(
      """SELECT AVG(spells_power) AS power
        |FROM ( SELECT AVG(spells.power), details.biographical.class AS class
        |WHERE details.physical.height < 170 )
        |GROUP BY class""".stripMargin.replace("\n", " ")).collect()
    val byClass = rows.map(r => r.getAs[String]("_id") -> r.getAs[Double]("power")).toMap
    assert(byClass.keySet == Set("sorcerer", "soldier", "summoner"))
    assert(math.abs(byClass("sorcerer") - 3254.0833333333335) < 1e-9)
    assert(math.abs(byClass("soldier") - 5162.15) < 1e-9)
    assert(math.abs(byClass("summoner") - 1200.0) < 1e-9)
  }

  test("example 004: good male mages by age, first two") {
    val rows = run(
      """SELECT name, details.biographical.class AS class, details.biographical.age AS age
        |WHERE NOT(bad_guy) AND details.physical.gender = "male"
        |ORDER BY details.biographical.age
        |LIMIT 2""".stripMargin.replace("\n", " ")).collect()
    assert(rows.map(r => (r.getAs[String]("name"), r.getAs[String]("class"), r.getAs[Double]("age"))).toList ==
      List(("vivi ornitier", "sorcerer", 9.0), ("zidane tribal", "thief", 16.0)))
  }

  test("example 005: first three females by height, names and average height") {
    val rows = run(
      """SELECT name, AVG(details.physical.height)
        |WHERE details.physical.gender = "female"
        |GROUP BY NULL
        |ORDER BY details.physical.height
        |LIMIT 3""".stripMargin.replace("\n", " ")).collect()
    assert(rows.length == 1)
    val row = rows.head
    assert(row.getAs[Seq[String]]("name").toSet == Set("yuna", "beatrix", "garnet til alexandros xvii"))
    assert(math.abs(row.getAs[Double]("details_physical_height") - 161.66666666666666) < 1e-9)
  }

  test("LIMIT applies before OFFSET (reference stage order)") {
    // LIMIT 2 OFFSET 1 over the age-ordered good male mages: rows 2..2 of
    // the 2-row prefix → exactly one row (zidane).
    val rows = run(
      """SELECT name WHERE NOT(bad_guy) AND details.physical.gender = "male"
        |ORDER BY details.biographical.age LIMIT 2 OFFSET 1""".stripMargin.replace("\n", " ")).collect()
    assert(rows.map(_.getString(0)).toList == List("zidane tribal"))
  }

  test("flat array reductions on a derived bonus array") {
    import org.apache.spark.sql.functions._
    val df = mages.select(col("name"), expr("transform(spells, s -> s.power)").as("bonus"))
    val row = Compiler.queryOrThrow(df,
        "SELECT name, SUM(bonus) AS total, MAX(bonus) AS best, MIN(bonus) AS worst, AVG(bonus) AS mean, COUNT(bonus) AS n")
      .filter(col("name") === "vivi ornitier").collect().head
    assert(row.getAs[Double]("total") == 4400.0) // 100+300+1000+3000
    assert(row.getAs[Double]("best") == 3000.0)
    assert(row.getAs[Double]("worst") == 100.0)
    assert(row.getAs[Double]("mean") == 1100.0)
    assert(row.getAs[Double]("n") == 4.0)
  }

  test("output schema inference matches planned DataFrame schema") {
    val schema = Schema.fromString(magesSchemaJson).toOption.get
    val q = "SELECT name, MAX(spells.power) AS best WHERE bad_guy = false"
    val compiled = Compiler.compile(schema, q).toOption.get
    val planned = compiled.run(mages)
    assert(Schema.toStructType(compiled.outputSchema).fieldNames.toList ==
      planned.schema.fieldNames.toList)
  }
}
