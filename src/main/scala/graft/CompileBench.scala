package graft

import graft.schema.Schema

/** Compile-throughput benchmark mirroring the reference's Benchmark.js
  * suite (reference: test/benchmark.js:7-70, numbers in BASELINE.md):
  * the same five queries against the same schema, measured as full
  * compile passes (tokenize → parse → analyze → plan) per second.
  *
  * Run: sbt "runMain graft.CompileBench"
  * Prints one JSON line per workload.
  */
object CompileBench {

  private val schemaJson =
    """{ "age": "number", "class": "string", "is_master": "boolean",
      |  "bonus": ["number"], "spells": [{ "name": "string", "power": "number" }] }""".stripMargin

  /** (workload, query, reference ops/sec from BASELINE.md's table —
    * reference: README.md:281-294, test/benchmark.js:7-70).
    */
  private val workloads: Seq[(String, String, Long)] = Seq(
    ("select_field", "SELECT age", 9795L),
    ("select_alias_count", "SELECT class AS klass, COUNT(bonus)", 4791L),
    ("group_by_avg", "SELECT AVG(age) GROUP BY class", 5754L),
    ("where_and", "SELECT is_master WHERE age > 14 AND age < 20", 4586L),
    ("nested_from", "SELECT AVG(spells_power) AS avg_power FROM (SELECT AVG(spells.power), age) WHERE age > 18 GROUP BY NULL", 2378L),
  )

  def main(args: Array[String]): Unit =
    println(run(warmupOps = 20000, opsPerRound = 20000, rounds = 5))

  /** Run the five workloads and return the JSON line. [[Bench]] embeds a
    * shortened run (fewer ops) into every per-round BENCH artifact so
    * front-end throughput regressions are driver-visible; `main` keeps the
    * full-length run for the standalone COMPILE_r{N}.json artifact.
    */
  def run(warmupOps: Int, opsPerRound: Int, rounds: Int): String = {
    val schema = Schema.fromString(schemaJson)
      .fold(e => sys.error(e), identity)
    val results = workloads.map { case (name, query, baseline) =>
      // sanity: must compile
      Compiler.compile(schema, query).fold(e => sys.error(s"$name: $e"), identity)
      // warmup (JIT)
      (1 to warmupOps).foreach(_ => Compiler.compile(schema, query))
      val times = (1 to rounds).map { _ =>
        val t0 = System.nanoTime()
        (1 to opsPerRound).foreach(_ => Compiler.compile(schema, query))
        opsPerRound / ((System.nanoTime() - t0) / 1e9)
      }
      (name, times.max.round, baseline)
    }
    // one stable JSON line, directly diffable against BASELINE.md's table:
    // measured ops/sec, the reference's published ops/sec, and the ratio
    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val base = results.map { case (k, _, b) => s""""$k":$b""" }.mkString("{", ",", "}")
    val ratio = results.map { case (k, v, b) =>
      s""""$k":${math.round(v.toDouble / b * 100) / 100.0}"""
    }.mkString("{", ",", "}")
    s"""{"metric":"compile_ops_per_sec","queries":$qs,"baseline":$base,"ratio_vs_baseline":$ratio}"""
  }
}
