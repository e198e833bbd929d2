package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** DSIR importance resampling + n-gram divergence meter, on planted
  * fixtures where the importance ordering is known.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // two clearly separated topic clusters — "spark" docs are the target
  private lazy val sparkDocs = Seq(
    (0L, "spark catalyst optimizer rewrites the logical plan into physical operators"),
    (1L, "catalyst rules push filters below the shuffle in the spark physical plan"),
    (2L, "the spark optimizer prunes columns and broadcasts the small join side"),
  )
  private lazy val cookingDocs = Seq(
    (10L, "simmer the onions in butter then add garlic and fresh thyme to the pan"),
    (11L, "whisk the eggs with cream and fold them gently into the warm sauce"),
  )
  private lazy val raw = (sparkDocs ++ cookingDocs).toDF("doc_id", "text")
  private lazy val target = sparkDocs.toDF("doc_id", "text")

  test("DSIR log-weights rank target-like documents above off-target ones") {
    val w = Dsir.logWeights(raw, target, raw, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 5)
    val sparkMin = sparkDocs.map(d => w(d._1)).min
    val cookMax = cookingDocs.map(d => w(d._1)).max
    assert(sparkMin > cookMax,
      s"target-cluster min $sparkMin should exceed off-target max $cookMax")
  }

  test("DSIR weight of a one-token doc matches the closed form") {
    // one doc "alpha" in the target, one doc "omega" in the raw side;
    // B = 2048 makes an alpha/omega bucket collision all but impossible
    // (verified by the asserted value: a collision would zero it)
    val t = Seq((0L, "alpha")).toDF("doc_id", "text")
    val r = Seq((1L, "omega")).toDF("doc_id", "text")
    val doc = Seq((2L, "alpha")).toDF("doc_id", "text")
    val B = 2048
    val w = Dsir.logWeights(doc, t, r, "text", "doc_id", buckets = B)
      .collect().head.getDouble(2)
    // p = (1+1)/(1+B), q = (0+1)/(1+B)  =>  log2(p/q) = 1
    assert(w == 1.0)
    // and a doc with no n-grams is dropped, not scored
    val empty = Seq((3L, "!!!")).toDF("doc_id", "text")
    assert(Dsir.logWeights(empty, t, r, "text", "doc_id", buckets = B).count() == 0)
  }

  test("gumbel resample is deterministic, seed-sensitive, and weight-biased") {
    val a = Dsir.resample(raw, target, raw, "text", "doc_id", n = 3, seed = "s1")
      .collect().map(_.getLong(0)).toSet
    val a2 = Dsir.resample(raw, target, raw, "text", "doc_id", n = 3, seed = "s1")
      .collect().map(_.getLong(0)).toSet
    assert(a == a2, "same seed must select the same set")
    assert(a.size == 3)
    // the weight gap between clusters (several bits) dominates Gumbel
    // noise at these sizes: at least 2 of the 3 winners are target-like
    assert(a.count(_ < 10L) >= 2)
    // keys are the rounded (log_weight + gumbel) race values
    val keyed = Dsir.resample(raw, target, raw, "text", "doc_id", n = 5, seed = "s1")
      .collect().map(r => r.getLong(0) -> r.getDouble(3))
    assert(keyed.map(_._2).distinct.length == 5)
  }

  test("subset path is bit-identical to the two-corpus form") {
    // logWeightsSubset / resampleSubset fold the target count into the
    // raw pass (one corpus scan fewer); the math must not move
    val pred = col("doc_id") < 10L
    val general = Dsir.logWeights(raw, raw.filter(pred), raw, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val subset = Dsir.logWeightsSubset(raw, pred, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(subset == general)
    val rs = Dsir.resampleSubset(raw, pred, "text", "doc_id", n = 3, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
    val rg = Dsir.resample(raw, raw.filter(pred), raw, "text", "doc_id",
        n = 3, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
    assert(rs == rg)
  }

  test("streaming scorer matches the batch weights on the same frame") {
    val (ratios, scalars) = Dsir.logRatios(target, raw, "text", buckets = 2048)
    val streamed = Dsir.logWeightsStream(raw, ratios, scalars, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dsir.logWeights(raw, target, raw, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }

  test("streaming scorer runs as a stateless stream projection") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (ratios, scalars) = Dsir.logRatios(target, raw, "text", buckets = 2048)
    val input = MemoryStream[(Long, String)]
    val q = Dsir.logWeightsStream(
        input.toDF().toDF("doc_id", "text"), ratios, scalars, "text", "doc_id")
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      val data = Seq(
        (20L, "spark catalyst plan"), (21L, "butter and cream sauce"))
      input.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("dsir_stream").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toMap
      val batch = Dsir.logWeightsStream(
          data.toDF("doc_id", "text"), ratios, scalars, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(streamed == batch)
      assert(streamed(20L) > streamed(21L))
    } finally q.stop()
  }

  test("divergence is zero on identical corpora and positive across topics") {
    val same = Dsir.ngramDivergence(target, target, "text").collect().head
    assert(same.getDouble(1) == 0.0 && same.getDouble(2) == 0.0 && same.getDouble(3) == 0.0)
    val diff = Dsir.ngramDivergence(target, cookingDocs.toDF("doc_id", "text"), "text")
      .collect().head
    assert(diff.getDouble(1) > 0.0 && diff.getDouble(2) > 0.0)
    // JS is symmetric and bounded by 1 bit
    assert(diff.getDouble(3) > 0.0 && diff.getDouble(3) <= 1.0)
    val flipped = Dsir.ngramDivergence(cookingDocs.toDF("doc_id", "text"), target, "text")
      .collect().head
    assert(flipped.getDouble(3) == diff.getDouble(3))
    assert(flipped.getDouble(1) == diff.getDouble(2))
  }

  test("resampling moves the output toward the target distribution") {
    // JS(selected, target) < JS(raw, target): the selection actually
    // shifted the mix — the end-to-end property DSIR exists for
    val sel = Dsir.resample(raw, target, raw, "text", "doc_id", n = 3, seed = "s1")
      .select("doc_id")
    val selected = raw.join(sel, Seq("doc_id"))
    val jsBefore = Dsir.ngramDivergence(raw, target, "text").collect().head.getDouble(3)
    val jsAfter = Dsir.ngramDivergence(selected, target, "text").collect().head.getDouble(3)
    assert(jsAfter < jsBefore, s"JS should shrink: before $jsBefore after $jsAfter")
  }
  test("mixture optimizer recovers a pure-source target, improves on uniform, deterministic") {
    val cook = cookingDocs.toDF("doc_id", "text")
    // light smoothing: the planted corpora are tiny, and the default
    // add-one prior (2048 pseudo-counts vs ~60 real n-grams) would
    // flatten the gradient the test wants to see
    def solve() = Dsir.optimizeMixture(
        Seq("spark" -> target, "cooking" -> cook), target, "text",
        alpha = 0.01)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val got = solve()
    // the target IS the spark source: essentially all weight lands there
    assert(got("spark")._1 > 0.95, got)
    assert(math.abs(got("spark")._1 + got("cooking")._1 - 1.0) < 1e-3)
    // the optimized blend strictly beats the uniform blend on target KL
    assert(got("spark")._3 < got("spark")._2, got)
    // both rows report the SAME before/after KLs (frame-level scalars)
    assert(got("spark")._2 == got("cooking")._2 && got("spark")._3 == got("cooking")._3)
    // fixed iteration budget, no RNG: bit-identical on rerun
    assert(solve() == got)
  }

  test("slice-form mixture solve equals the multi-frame form") {
    val docs = (sparkDocs.map(t => (t._1, t._2, "spark")) ++
        cookingDocs.map(t => (t._1, t._2, "cooking")))
      .toDF("doc_id", "text", "slice")
    val bySlice = Dsir.optimizeMixtureForSlice(docs, "slice", "text", "spark",
        alpha = 0.01)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val multi = Dsir.optimizeMixture(
        Seq("spark" -> target, "cooking" -> cookingDocs.toDF("doc_id", "text")),
        target, "text", alpha = 0.01)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bySlice == multi, s"$bySlice vs $multi")
    // an unknown target slice fails loudly, not with an empty model
    intercept[IllegalArgumentException] {
      Dsir.optimizeMixtureForSlice(docs, "slice", "text", "nope")
    }
  }

}
