package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.ops.Similarity

/** Native vec_dot expression: correctness vs the HOF formulation, codegen
  * and interpreted paths, float and double arrays, null behavior.
  */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("vec_dot equals HOF dot bit-for-bit on float arrays") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.25f)),
    ).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.vecDot($"a", $"b").as("native"),
      Similarity.dot($"a", $"b").as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.head.getDouble(0) == 32.0)
  }

  test("vec_dot handles double arrays and mixed types") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.0, 2.0), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(GraftFunctions.vecDot($"a", $"b")).collect().head.getDouble(0) == 11.0)
  }

  test("vec_dot is null on null input") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(GraftFunctions.vecDot($"a", $"b")).collect().head.isNullAt(0))
  }

  test("vec_dot rejects non-array arguments at analysis") {
    GraftFunctions.register(spark)
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] { df.select(GraftFunctions.vecDot($"a", $"b")).collect() }
  }

  test("vec_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // parquet-backed input: a local relation would be constant-folded away
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.select(GraftFunctions.vecDot($"embedding", $"embedding").as("d"))
    // the Project containing vec_dot must sit inside a WholeStageCodegen node
    val hasCodegen = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("vec_dot") => w
    }.nonEmpty
    assert(hasCodegen)
    assert(q.filter($"d" > 0).count() > 0)
  }

  test("brute-force top-k on real embeddings matches HOF-computed cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.filter($"vec_id" === 0)
    val native = Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", k = 3).collect()
    // independent check: HOF cosine of the top neighbor
    val top = native.head
    val hof = emb.as("c").crossJoin(probes.as("p"))
      .filter($"c.vec_id" === top.getAs[Long]("neighbor_id"))
      .select(round(Similarity.cosine($"p.embedding", $"c.embedding"), 6))
      .collect().head.getDouble(0)
    assert(top.getAs[Double]("cosine") == hof)
  }
}
