package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - brute-force top-k: broadcast the (small) probe set against the corpus
  *    — one narrow pass over the corpus, no shuffle of the corpus itself;
  *    exact, the correctness baseline.
  *  - SRP-LSH (signed random projections): hash vectors to hyperplane-sign
  *    buckets, join probes to corpus within buckets, re-rank exactly.
  *    The shuffle key is the bucket, so cost scales with bucket collision
  *    counts, not corpus size — the 100 TB path.
  *
  * The dot product is a codegen'd higher-order-function fold (`zip_with` +
  * `aggregate`), not a UDF.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double.
    * HOF formulation — works without session-level function registration;
    * the operators below use the native codegen'd `vec_dot` expression
    * (bit-identical results, no intermediate array).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native-expression cosine (requires GraftFunctions.register on the
    * session, done by the operators below).
    */
  private[ops] def cosineNative(a: Column, b: Column): Column = {
    import graft.functions.GraftFunctions.vecDot
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))
  }

  /** True iff the vector is non-null with a positive squared norm — the
    * prefilter that keeps [[cosineNative]]'s divisor nonzero (ANSI mode
    * turns 0/0 into a runtime error, not a NaN). Null vectors fail the
    * predicate too (null > 0 is null).
    */
  private[ops] def nonZeroVec(v: Column): Column = {
    import graft.functions.GraftFunctions.vecDot
    vecDot(v, v) > lit(0.0)
  }

  /** Deterministic Rademacher (±1) hyperplane weights: splitmix64 of the
    * (plane, dim) index. Computed driver-side once and shipped as array
    * literals — the per-row work is then `planes` native vec_dot calls
    * instead of a large interpreted higher-order-function tree (which also
    * costs tens of seconds of codegen compilation on first use).
    */
  private def planeWeights(plane: Int, dims: Int, table: Int): Array[Double] = {
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    Array.tabulate(dims) { d =>
      if ((splitmix(table.toLong << 48 | plane.toLong << 32 | d) & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** Signed-random-projection bucket: the sign pattern of `planes`
    * hyperplane projections packs into a long bucket id. Stable across
    * runs and cluster layouts. `dims` must equal the vector length — the
    * hyperplanes are shipped as literal weight arrays and `vec_dot`
    * returns null on a length mismatch, so a wrong `dims` yields null
    * buckets (dropped by the bucket equi-join) rather than silently
    * hashing a truncated prefix. The operators below infer `dims` from the
    * data. `table` selects an independent hyperplane family for
    * multi-table LSH. Requires GraftFunctions.register on the session
    * (done by the operators below).
    */
  def srpBucket(vec: Column, planes: Int, dims: Int = 64, table: Int = 0): Column = {
    import graft.functions.GraftFunctions.vecDot
    val bits = (0 until planes).map { p =>
      val weights = typedLit(planeWeights(p, dims, table))
      val d = vecDot(vec, weights)
      // two-sided when: a null dot (length mismatch) stays null instead of
      // collapsing to bit 0 — bucket 0 would silently pool everything
      when(d >= 0, lit(1L << p)).when(d < 0, lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** The (uniform) vector length of a column, read from one non-null row
    * — the driver-side probe that sizes the literal hyperplane weights.
    * 0 when no non-null vector exists (operators then produce empty
    * results via null buckets rather than throwing).
    */
  private[ops] def vecDims(df: DataFrame, vecCol: String): Int =
    df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** Rank the k best scored rows per probe with the bounded heap
    * aggregate: partial aggregation keeps an O(k) buffer per probe on each
    * map task and the shuffle moves k-entry buffers, never the scored
    * rows. (The naive alternative — `row_number` over
    * `partitionBy(probe_id)` — materializes every scored row of a probe
    * in one window partition: |corpus| rows per probe, a scale-killer.)
    * Ordering matches `ORDER BY cosine DESC, neighbor_id` (or `ASC` with
    * `asc = true`, implemented by negating the score into the heap and
    * negating back on output — ties still break by ascending neighbor
    * id); ranks are 1-based positions.
    *
    * Null scores are dropped EXPLICITLY before ranking (the filter is
    * visible in the plan): a null cosine means a corrupt/length-mismatched
    * vector, which must not occupy a top-k slot. (A `row_number` window
    * would have ranked nulls last and could emit them when a probe has
    * fewer than k valid neighbors — that behavior is deliberately gone.)
    */
  private def rankTopK(scored: DataFrame, k: Int, asc: Boolean = false): DataFrame =
    scored
      .filter(col("cosine").isNotNull)
      .groupBy(col("probe_id"))
      .agg(graft.functions.GraftFunctions.topKByScore(
        if (asc) negate(col("cosine")) else col("cosine"),
        col("neighbor_id"), k).as("tk"))
      .select(col("probe_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("probe_id"), col("e.id").as("neighbor_id"),
        round(if (asc) negate(col("e.score")) else col("e.score"), 6).as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Exact cosine top-k: for each probe row, the k nearest corpus rows.
    * The probe set must be small (it is broadcast); the corpus streams.
    * Returns (probe_id, neighbor_id, cosine, rank), self-matches excluded.
    *
    * Zero vectors are dropped on BOTH sides before scoring — the same
    * discipline as [[lshTopK]]'s candidate stage. This matters doubly
    * here because bruteForceTopK is the TRUTH side of [[recallAtK]]: a
    * zero corpus vector's NaN cosine sorts above every real number in the
    * exact top-k while the approximate side (which prefilters) never
    * returns it, asymmetrically depressing measured recall.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .filter(nonZeroVec(col("cvec")))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .filter(nonZeroVec(col("pvec")))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("pvec"), col("cvec")))
    rankTopK(scored, k)
  }

  /** Approximate top-k via SRP buckets: probes only meet corpus vectors
    * in their own bucket (per table), then exact cosine re-ranks. Recall
    * < 1 by design; `planes`/`tables` are the precision/recall dials —
    * a pair at angle θ collides in one table with p = (1-θ/π)^planes and
    * is found with 1-(1-p)^tables, so more planes shrink buckets (faster,
    * lower recall) and more tables OR independent hash families together
    * (higher recall, `tables`× the banded rows). This is the scale path:
    * the corpus shuffles once by (table, bucket) instead of being
    * broadcast-crossed, so cost follows bucket collision counts, not
    * corpus size. Candidate (probe, neighbor) pairs found by several
    * tables are deduplicated before ranking — a multi-table hit must not
    * occupy several top-k slots.
    */
  def lshTopK(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      planes: Int = 12,
      tables: Int = 1,
      maxBucketSize: Int = 10000,
  ): DataFrame =
    rankTopK(lshScored(corpus, probes, vecCol, idCol, planes, tables,
      maxBucketSize), k)

  /** The SRP-banded candidate generation + exact scoring stage shared by
    * [[lshTopK]] and the corpus-scale hard-band miners: banded rows carry
    * ids only, candidate pairs dedup across tables, vectors re-join
    * candidate-sized, exact cosine scores the survivors. Zero vectors are
    * dropped on both sides before scoring (norm 0 makes cosine 0/0 — an
    * ANSI-mode runtime error; their buckets are hash noise anyway).
    * Returns (probe_id, neighbor_id, cosine).
    */
  private def lshScored(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      planes: Int,
      tables: Int,
      maxBucketSize: Int,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val dims = vecDims(corpus, vecCol)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .filter(nonZeroVec(col("cvec")))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .filter(nonZeroVec(col("pvec")))
    // Banded rows carry IDS ONLY: the tables×-exploded LSH join and the
    // candidate-pair dedup shuffle narrow (table, bucket, id) rows, never
    // the embedding vectors — the same discipline as the Dedup banding
    // (shuffling a vector `tables` times per row would multiply exchange
    // volume by tables × vector width). Vectors re-join only for the much
    // smaller deduplicated candidate set.
    // all tables' buckets in ONE fused native loop (srp_bands, bit-identical
    // to the per-table Column-tree form it replaces — see the expression's
    // scaladoc for the codegen-ceiling mechanism)
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), posexplode(graft.functions.GraftFunctions.srpBands(
        col(vec), planes, tables, math.max(dims, 1))).as(Seq("table", "bucket")))
    // Degenerate-bucket guard: a corpus bucket over `maxBucketSize` is
    // dropped before the probe join (an over-full bucket is LSH noise — at
    // useful plane counts it means the hash family cannot discriminate
    // that region, and joining it costs |bucket| rows PER probe landing
    // there). The guard is part of the lazy plan (no metric action on the
    // interactive search path); its recall effect is observable through
    // recallAtK, and the counts branch re-reads only the narrow banded
    // ids, not the vectors.
    val bandedC = Dedup.dropOverfullBuckets(banded(c, "neighbor_id", "cvec"),
      Seq("table", "bucket"), maxBucketSize, "lshTopK", logMetric = false)
    val candidates = bandedC
      .join(banded(p, "probe_id", "pvec"), Seq("table", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .dropDuplicates("probe_id", "neighbor_id")
    candidates
      .join(c, Seq("neighbor_id"))
      .join(p, Seq("probe_id"))
      .withColumn("cosine", cosineNative(col("pvec"), col("cvec")))
      .select(col("probe_id"), col("neighbor_id"), col("cosine"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse k-means quantizer
    * splits the corpus into `nlist` cells; each probe searches only its
    * `nprobe` nearest cells, then exact cosine re-ranks.
    *
    * Scale design:
    *  - training runs on a deterministic hash-sample of the corpus
    *    (seeded xxhash64 filter — one scan, no sort, same sample on any
    *    cluster layout), k-means itself on the small sample;
    *  - the learned centroids ship as *literal* weight arrays inside
    *    codegen'd `vec_dot` expressions, so cell assignment is a pure
    *    scan-side projection — no MLlib UDF in the per-row path, no
    *    model broadcast;
    *  - the only wide operation is the (cell) equi-join: corpus shuffles
    *    once by cell id, probes explode to `nprobe` cells. Cost scales
    *    with cell occupancy (|corpus| × nprobe / nlist per probe), not
    *    corpus size.
    *
    * Recall < 1 by design (a true neighbor can live in an unprobed cell);
    * raise `nprobe` toward `nlist` to trade speed for recall. Assignment
    * maximizes the dot-product score `v·c − |c|²/2` (argmin L2 distance,
    * constant |v|² dropped), ties broken by cell index. Sampling and
    * seeding are deterministic; k-means centroids are float reductions,
    * so they are exactly reproducible for a fixed partition layout (the
    * per-query assignment and ranking are deterministic given the
    * centroids).
    */
  def ivfTopK(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nlist: Int = 32,
      nprobe: Int = 4,
      sampleOneIn: Int = 1,
  ): DataFrame = {
    val index = trainIvf(corpus, vecCol, idCol, nlist, sampleOneIn)
    ivfSearch(index, corpus, probes, vecCol, idCol, k, nprobe)
  }

  /** A trained IVF coarse quantizer: just the centroid matrix. Train once
    * (one sampled scan + k-means on the sample), persist the few KB of
    * centroids, and reuse across every query against the corpus — the
    * index build is decoupled from search exactly as in a production ANN
    * service.
    */
  final case class IvfIndex(centroids: Array[Array[Double]]) {
    def nlist: Int = centroids.length
  }

  /** Train the IVF quantizer on a deterministic hash-sample of the corpus
    * (`sampleOneIn = 1` → full scan; at 100 TB pick it so ~100k-1M rows
    * survive — a seeded xxhash64 filter, one scan, no sort, same sample
    * on any cluster layout).
    *
    * Determinism scope: the SAMPLE is layout-independent, and the seeded
    * k-means is bit-reproducible for a FIXED physical layout of the
    * training frame — but Lloyd's distributed FP reductions are
    * aggregation-order-sensitive, so rewriting the corpus file (different
    * row groups/partitioning) can drift centroids in the last ulps and
    * flip boundary cell assignments. Persist the index ([[saveIvf]])
    * when exact repeatability across layouts matters — the production
    * lifecycle anyway.
    */
  def trainIvf(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      nlist: Int = 32,
      sampleOneIn: Int = 1,
  ): IvfIndex = {
    require(sampleOneIn >= 1, "sampleOneIn must be >= 1")
    val training = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(sampleOneIn.toLong)) === 0)
      .select(org.apache.spark.ml.functions.array_to_vector(col(vecCol)).as("features"))
    require(!training.isEmpty,
      s"IVF training sample is empty (corpus empty, or sampleOneIn=$sampleOneIn too aggressive)")
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(42L).setMaxIter(20).setFeaturesCol("features")
    IvfIndex(km.fit(training).clusterCenters.map(_.toArray))
  }

  /** Persist a trained IVF index as a tiny parquet table of
    * (cell, centroid) rows — the production lifecycle: train once,
    * save, and let every later session / job [[loadIvf]] instead of
    * retraining. Centroids are a few KB; the write is one task.
    */
  def saveIvf(index: IvfIndex, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load an IVF index saved by [[saveIvf]]. Cell order is restored from
    * the stored ids, so a loaded index searches identically to the
    * in-memory original (asserted by the round-trip test).
    */
  def loadIvf(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(spark.read.parquet(path)
      .orderBy(col("cell"))
      .collect()
      .map(_.getSeq[Double](1).toArray))

  /** Search a trained IVF index: assign corpus rows to their cell, explode
    * probes to their `nprobe` best cells, equi-join on the cell id, exact
    * cosine re-rank via the bounded top-k aggregate.
    */
  def ivfSearch(
      index: IvfIndex,
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nprobe: Int = 4,
  ): DataFrame = {
    require(nprobe >= 1, "need nprobe >= 1")
    require(index.nlist >= 1, "index has no centroids (empty training sample?)")
    // clamp rather than reject: k-means can legally return fewer than the
    // requested nlist centroids on small or duplicate-heavy samples
    val nprobeEff = math.min(nprobe, index.nlist)
    graft.functions.GraftFunctions.register(corpus.sparkSession)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cell", bestCell(index, col("cvec")))
    // probes explode to their nprobe best cells (sort desc, take nprobe)
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .withColumn("cell", probeCells(index, col("pvec"), nprobeEff))
    val scored = c.join(p, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("pvec"), col("cvec")))
    rankTopK(scored, k)
  }

  /** Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    * space splits into `m` subspaces of `dsub = dim / m` dims, each with
    * its own `ksub`-codeword quantizer. A vector compresses to `m` small
    * codes — with m=8, ksub=16 that is 8 nibbles (~4 bytes) per vector
    * instead of 256 bytes of floats, the memory lever that lets a
    * billion-vector index live where raw vectors cannot.
    */
  final case class PqCodebooks(
      dim: Int, m: Int, ksub: Int,
      codewords: Array[Array[Array[Double]]], // m × ksub × dsub
  ) {
    def dsub: Int = dim / m
  }

  /** Train PQ codebooks: per subspace, k-means over the (hash-sampled,
    * L2-normalized) corpus's subvectors — `m` small driver-coordinated
    * fits at build time, the [[trainIvf]] lifecycle (train once, search
    * many; persist like [[saveIvf]] if needed).
    */
  def trainPq(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int = 8,
      ksub: Int = 16,
      sampleOneIn: Int = 1,
  ): PqCodebooks = {
    require(sampleOneIn >= 1, "sampleOneIn must be >= 1")
    val dim = vecDims(corpus, vecCol)
    require(dim > 0, "cannot train PQ on an all-null vector column")
    require(dim % m == 0, s"m=$m must divide the vector dim $dim")
    val dsub = dim / m
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val normed = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(sampleOneIn.toLong)) === 0)
      .select(Embeddings.l2Normalize(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
    require(!normed.isEmpty,
      s"PQ training sample is empty (corpus empty, all-null vectors, or sampleOneIn=$sampleOneIn too aggressive)")
    val codebooks = (0 until m).map { j =>
      val sub = normed.select(
        org.apache.spark.ml.functions.array_to_vector(
          slice(col("v"), j * dsub + 1, dsub)).as("features"))
      new org.apache.spark.ml.clustering.KMeans()
        .setK(ksub).setSeed(42L + j).setMaxIter(20).setFeaturesCol("features")
        .fit(sub).clusterCenters.map(_.toArray)
    }.toArray
    PqCodebooks(dim, m, ksub, codebooks)
  }

  /** Cell score per centroid as a literal-weight dot product; argmax via
    * array_max over (score, cell) structs — lexicographic, codegen'd.
    * Shared by [[ivfSearch]], [[ivfPqTopK]], and (with `withCosine`)
    * [[Dedup.prototypicality]]. The optional third `cos` field is the
    * row-to-centroid cosine; it sits AFTER (score, cell) in the struct,
    * so the lexicographic argmax is bit-identical with or without it —
    * one definition of the assignment tie-break for every caller.
    */
  private[ops] def cellScores(
      index: IvfIndex, vec: Column, withCosine: Boolean = false): Column = {
    import graft.functions.GraftFunctions.vecDot
    val rowNorm = sqrt(vecDot(vec, vec))
    array(index.centroids.zipWithIndex.map {
      case (c, i) =>
        val norm2 = c.map(x => x * x).sum
        val d = vecDot(vec, typedLit(c))
        val base = Seq((d - lit(norm2 / 2.0)).as("score"), lit(i).as("cell"))
        struct((if (withCosine)
          base :+ (d / (lit(math.sqrt(norm2).max(1e-12)) * rowNorm)).as("cos")
        else base): _*)
    }: _*)
  }

  private def bestCell(index: IvfIndex, vec: Column): Column =
    array_max(cellScores(index, vec)).getField("cell")

  /** Public cell assignment against a trained [[IvfIndex]] — the same
    * literal-centroid argmax the IVF searches use, for operators that
    * partition BY cluster (e.g. [[Dedup.semanticDedup]]).
    */
  def assignCell(index: IvfIndex, vec: Column): Column = bestCell(index, vec)

  /** The vector's `nprobe` best cells as an array — [[assignCell]]'s
    * multi-probe generalization. SemDeDup's overlapping-cell dial: rows
    * assigned to their top-n cells turn cluster-BOUNDARY misses into
    * shared-cell hits at n× candidate cost.
    */
  def topCells(index: IvfIndex, vec: Column, nprobe: Int): Column =
    slice(reverse(sort_array(cellScores(index, vec))), 1, nprobe)
      .getField("cell")

  /** The probe's `nprobe` best cells, exploded (sort desc, take nprobe). */
  private def probeCells(index: IvfIndex, vec: Column, nprobe: Int): Column =
    explode(slice(reverse(sort_array(cellScores(index, vec))), 1, nprobe)
      .getField("cell"))

  /** Persist PQ codebooks as a tiny parquet table of (subspace, code,
    * codeword) rows — the [[saveIvf]] lifecycle: train once, every later
    * session [[loadPq]]s instead of retraining. m × ksub rows of dsub
    * doubles: kilobytes.
    */
  def savePq(cb: PqCodebooks, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    (for (j <- cb.codewords.indices; c <- cb.codewords(j).indices)
      yield (j, c, cb.codewords(j)(c).toSeq)).toDF("subspace", "code", "codeword")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load PQ codebooks saved by [[savePq]] (order restored from the
    * subspace/code columns).
    */
  def loadPq(spark: org.apache.spark.sql.SparkSession, path: String): PqCodebooks = {
    val rows = spark.read.parquet(path)
      .orderBy(col("subspace"), col("code"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
    val cws = rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2)).toArray
    require(cws.nonEmpty, s"no PQ codebooks at $path")
    PqCodebooks(cws.map(_.head.length).sum, cws.length, cws.head.length, cws)
  }

  /** The codebook as ONE nested-array literal — a single plan constant
    * shared by encode and the probe LUT build. Inlining per-codeword
    * literal dot products instead (m × ksub of them) blows whole-stage
    * codegen past the JVM method limit at production codebook sizes.
    */
  private def cbLiteral(cb: PqCodebooks): Column =
    typedLit(cb.codewords.map(_.map(_.toSeq).toSeq).toSeq)

  /** Encode vectors to PQ codes: per subspace, the nearest codeword
    * (argmax of `dot − ‖c‖²/2` ≡ min L2), as the single native
    * [[graft.functions.PqEncode]] expression — a pure scan-side codegen'd
    * projection, no shuffle, O(m·ksub·dsub) per row in one compiled loop.
    * Null / zero vectors encode to null and are dropped (same
    * "no embedding" convention as [[Embeddings.l2Normalize]]).
    * Returns (idCol, pq_code: array<int>).
    */
  def pqEncode(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      cb: PqCodebooks,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val v = Embeddings.l2Normalize(col(vecCol))
    corpus
      .filter(v.isNotNull)
      .select(col(idCol),
        graft.functions.GraftFunctions.pqEncode(v, cbLiteral(cb)).as("pq_code"))
  }

  /** PQ top-k by asymmetric distance computation (ADC): each probe builds
    * per-subspace lookup tables of its subvector's dot products with
    * every codeword; a corpus CODE then scores with `m` table lookups —
    * no vector arithmetic, no vector IO. The scan touches `m` small codes
    * per corpus row (the compression is also the bandwidth win); the
    * `rerank × k` best candidates per probe re-join their TRUE vectors by
    * id for exact cosine re-ranking, which both fixes quantization error
    * at the top and keeps vector fetches candidate-sized. Probes
    * broadcast (same contract as [[bruteForceTopK]]). Approximate by
    * contract — monitor with [[recallAtK]].
    */
  /** Per-probe ADC lookup tables from the ONE codebook literal: LUT[j][c]
    * = dot(probe subvector j, codeword c). Probe rows are few, so the
    * interpreted HOF is irrelevant — what matters is the per-corpus-row
    * ADC staying a compiled loop. Shared by [[pqTopK]] and [[ivfPqTopK]].
    */
  private def pqLuts(cb: PqCodebooks, vec: Column): Column = {
    val cbl = cbLiteral(cb)
    transform(sequence(lit(0), lit(cb.m - 1)), j =>
      transform(element_at(cbl, j + 1), cw =>
        aggregate(zip_with(slice(vec, j * cb.dsub + 1, lit(cb.dsub)), cw,
          (x, y) => x * y), lit(0.0), (acc, v) => acc + v)))
  }

  /** The shared tail of both PQ searches: keep each probe's `rerank × k`
    * best ADC scores (bounded heap), re-join the TRUE vectors by id for
    * exact cosine, rank the final k. Vector fetches stay candidate-sized.
    */
  private def adcRerank(
      adc: DataFrame, // (probe_id, neighbor_id, approx)
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      rerank: Int,
  ): DataFrame = {
    import graft.functions.GraftFunctions.topKByScore
    val candidates = adc
      .groupBy(col("probe_id"))
      .agg(topKByScore(col("approx"), col("neighbor_id"), k * rerank).as("tk"))
      .select(col("probe_id"), explode(col("tk").getField("id")).as("neighbor_id"))
    val scored = candidates
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")), Seq("neighbor_id"))
      .join(broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))), Seq("probe_id"))
      .withColumn("cosine", cosineNative(col("pvec"), col("cvec")))
    rankTopK(scored, k)
  }

  def pqTopK(
      cb: PqCodebooks,
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      rerank: Int = 4,
  ): DataFrame = {
    require(k >= 1 && rerank >= 1, "need k >= 1 and rerank >= 1")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val codes = pqEncode(corpus, vecCol, idCol, cb)
      .select(col(idCol).as("neighbor_id"), col("pq_code"))
    val pv = Embeddings.l2Normalize(col(vecCol))
    // the ADC frame needs only (probe_id, luts) — broadcasting the probe
    // vector here would double the broadcast for nothing (the re-rank
    // fetches it separately)
    val p = probes
      .filter(pv.isNotNull)
      .select(col(idCol).as("probe_id"), pqLuts(cb, pv).as("luts"))
    val adc = codes.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("approx",
        graft.functions.GraftFunctions.pqAdc(col("luts"), col("pq_code")))
    adcRerank(adc, corpus, probes, vecCol, idCol, k, rerank)
  }

  /** IVF + PQ combined — the canonical billion-scale ANN layout (FAISS's
    * IVFADC): the IVF quantizer prunes the corpus to `nprobe` cells per
    * probe, and WITHIN the matched cells the scan reads PQ codes, not
    * vectors — cell pruning bounds how much is scanned, PQ bounds the
    * bytes per scanned row, and the exact re-rank of `rerank × k`
    * candidates fixes quantization error at the top. One scan projects
    * (id, cell, code); the cell equi-join replaces [[pqTopK]]'s
    * broadcast-cross of the whole corpus; everything downstream is the
    * same candidate-sized machinery.
    */
  def ivfPqTopK(
      index: IvfIndex,
      cb: PqCodebooks,
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nprobe: Int = 4,
      rerank: Int = 4,
  ): DataFrame = {
    require(k >= 1 && rerank >= 1 && nprobe >= 1, "need k, rerank, nprobe >= 1")
    require(index.nlist >= 1, "index has no centroids (empty training sample?)")
    val nprobeEff = math.min(nprobe, index.nlist)
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val v = Embeddings.l2Normalize(col(vecCol))
    val c = corpus
      .filter(v.isNotNull)
      .select(col(idCol).as("neighbor_id"),
        bestCell(index, col(vecCol)).as("cell"),
        graft.functions.GraftFunctions.pqEncode(v, cbLiteral(cb)).as("pq_code"))
    val p = probes
      .filter(v.isNotNull)
      .select(col(idCol).as("probe_id"), pqLuts(cb, v).as("luts"),
        probeCells(index, col(vecCol), nprobeEff).as("cell"))
    val adc = c.join(p, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("approx",
        graft.functions.GraftFunctions.pqAdc(col("luts"), col("pq_code")))
    adcRerank(adc, corpus, probes, vecCol, idCol, k, rerank)
  }

  /** Per-dimension scalar-quantization (SQ) parameters: the affine int8
    * code `c_d = round((x_d − min_d)·255/(max_d − min_d))`, learned from
    * one min/max aggregation pass. The coarse, simple sibling of
    * [[PqCodebooks]]: 8 bits per DIMENSION (4× less bandwidth than
    * float32, 8× less than float64) with no training beyond min/max —
    * the standard first rung of the ANN memory ladder (SQ8 in FAISS
    * terms), before PQ's sub-vector codebooks.
    */
  final case class SqParams(mins: Array[Double], maxs: Array[Double]) {
    require(mins.length == maxs.length, "mins/maxs length mismatch")
    def dim: Int = mins.length
    /** code scale per dim: 255/(max−min), 0 on degenerate dims. */
    def scales: Array[Double] =
      mins.indices.map(d =>
        if (maxs(d) > mins(d)) 255.0 / (maxs(d) - mins(d)) else 0.0).toArray
    /** dequantization width per dim: (max−min)/255, 0 on degenerate. */
    def widths: Array[Double] =
      mins.indices.map(d =>
        if (maxs(d) > mins(d)) (maxs(d) - mins(d)) / 255.0 else 0.0).toArray
  }

  /** Learn SQ parameters: per-dimension min/max in ONE exploded
    * aggregation (map-side combined — the corpus collapses to dim-sized
    * partials before the single shuffle). `normalize = true` (the search
    * configuration) learns over L2-normalized vectors so codes live in
    * cosine space; `false` quantizes the raw column (the storage /
    * compression configuration, exactly SQL-mirrorable).
    */
  def trainSq(
      corpus: DataFrame,
      vecCol: String,
      normalize: Boolean = true,
  ): SqParams = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val v0 = col(vecCol).cast("array<double>")
    val v = if (normalize) Embeddings.l2Normalize(v0) else v0
    val rows = corpus
      .select(v.as("v")).filter(col("v").isNotNull)
      .select(posexplode(col("v")).as(Seq("__d", "__x")))
      .groupBy(col("__d"))
      .agg(min(col("__x")).as("mn"), max(col("__x")).as("mx"))
      .orderBy(col("__d"))
      .collect()
    require(rows.nonEmpty, "cannot train SQ on an empty/all-null vector column")
    SqParams(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Quantize a vector column to int8 codes (as array<int>, values
    * 0-255): `clamp(floor((x − min)·scale + 0.5))` per dimension —
    * deterministic IEEE arithmetic, so a SQL engine recomputes the codes
    * BIT-identically (the `q_emb_sq_codes` oracle does). Vectors of a
    * different length than the params produce null elements (zip_with
    * padding) — filter or fail upstream; the search path never sees them
    * because [[trainSq]] and the scan share one corpus.
    */
  def sqQuantizeCol(vec: Column, p: SqParams): Column = {
    val diffs = zip_with(vec.cast("array<double>"), typedLit(p.mins.toSeq),
      (x, mn) => x - mn)
    zip_with(diffs, typedLit(p.scales.toSeq), (d, s) =>
      least(greatest(floor(d * s + lit(0.5)).cast("int"), lit(0)), lit(255)))
  }

  /** Dequantize int8 codes back to doubles: `min_d + c_d·width_d`. */
  def sqDequantizeCol(code: Column, p: SqParams): Column =
    zip_with(
      zip_with(code, typedLit(p.widths.toSeq), (c, w) => c * w),
      typedLit(p.mins.toSeq), (cw, mn) => mn + cw)

  /** Persist SQ params as a tiny parquet of (dim, mn, mx) — the
    * [[saveIvf]]/[[savePq]] lifecycle. */
  def saveSq(p: SqParams, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    p.mins.indices.map(d => (d, p.mins(d), p.maxs(d))).toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load SQ params saved by [[saveSq]]. */
  def loadSq(spark: org.apache.spark.sql.SparkSession, path: String): SqParams = {
    val rows = spark.read.parquet(path).orderBy(col("dim")).collect()
    require(rows.nonEmpty, s"no SQ params at $path")
    SqParams(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** SQ top-k: the corpus scan touches int8 CODES only — the probe's
    * approximate score folds the affine dequantization into one per-probe
    * constant (`Σ p_d·min_d`, a [[graft.functions.FloatVecDot]] against
    * the mins literal) plus the native `sq_dot` code loop over per-probe
    * weights `p_d·width_d` (built once per probe row, the small side).
    * The `rerank × k` best candidates re-join their true vectors for
    * exact cosine re-ranking — [[pqTopK]]'s discipline at a coarser,
    * training-free compression point. `params` must be trained with
    * `normalize = true` over this corpus. Approximate by contract —
    * monitor with [[recallAtK]] (`q_sim_sq_recall`).
    */
  def sqTopK(
      params: SqParams,
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      rerank: Int = 4,
  ): DataFrame = {
    require(k >= 1 && rerank >= 1, "need k >= 1 and rerank >= 1")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    import graft.functions.GraftFunctions.{sqDot, vecDot}
    val cv = Embeddings.l2Normalize(col(vecCol))
    val codes = corpus
      .filter(cv.isNotNull)
      .select(col(idCol).as("neighbor_id"), sqQuantizeCol(cv, params).as("sq_code"))
    val pvec = Embeddings.l2Normalize(col(vecCol))
    val p = probes
      .filter(pvec.isNotNull)
      .select(col(idCol).as("probe_id"),
        vecDot(pvec, typedLit(params.mins.toSeq)).as("bias"),
        zip_with(pvec, typedLit(params.widths.toSeq), (x, w) => x * w).as("pw"))
    val adc = codes.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("approx", col("bias") + sqDot(col("sq_code"), col("pw")))
    adcRerank(adc, corpus, probes, vecCol, idCol, k, rerank)
  }

  /** Sign-bit binary code column: the vector's signs packed 64 dims per
    * long (`sign_pack`). Signs are invariant under L2 normalization, so
    * this quantizes raw and normalized vectors identically — and a SQL
    * engine recomputes the words bit-exactly (`q_emb_bq_codes`).
    * Training-free: no parameters to learn, persist, or drift.
    */
  def bqQuantizeCol(vec: Column): Column =
    graft.functions.GraftFunctions.signPack(vec)

  /** Binary-quantization top-k: the 1-bit rung of the compression ladder
    * (below SQ8 and PQ — 32-64× less scan bandwidth than float vectors).
    * Corpus rows carry ONE packed sign code (64 dims/long); each probe
    * broadcasts its own code; the approximate score is `−hamming(a, b)`,
    * one fused XOR+POPCNT loop per pair (for sign codes, Hamming is a
    * monotone proxy for angle: cos θ̂ = cos(π·h/dim), the SRP estimator
    * with identity hyperplanes). The `rerank × k` best candidates re-join
    * their true vectors for exact cosine re-ranking. Coarser than SQ —
    * use a larger `rerank`; approximate by contract, monitor with
    * [[recallAtK]] (`q_sim_bq_recall`).
    */
  def bqTopK(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      rerank: Int = 16,
  ): DataFrame = {
    require(k >= 1 && rerank >= 1, "need k >= 1 and rerank >= 1")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    import graft.functions.GraftFunctions.hammingDist
    val codes = corpus
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), bqQuantizeCol(col(vecCol)).as("bq_code"))
    val p = probes
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("probe_id"), bqQuantizeCol(col(vecCol)).as("probe_code"))
    val adc = codes.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("approx",
        -hammingDist(col("bq_code"), col("probe_code")).cast("double"))
    adcRerank(adc, corpus, probes, vecCol, idCol, k, rerank)
  }

  /** Hard-negative mining for contrastive training: for each probe
    * (anchor), the k corpus rows MOST similar to it while still below the
    * positive threshold — the near-miss non-positives a contrastive loss
    * learns the most from (the "hard" band of in-batch negative mining,
    * e.g. DPR, Karpukhin et al. 2020). `maxCos` is the exclusive positive
    * boundary: pairs with cosine >= maxCos are presumed positives and
    * excluded; `minCos` (optional) floors the band so trivially-unrelated
    * pairs don't occupy slots when fewer than k hard ones exist.
    *
    * Scale shape: identical to [[bruteForceTopK]] — broadcast probes,
    * one narrow corpus pass, bounded-heap top-k (the band filter runs
    * BEFORE ranking, so the heap only sees candidate negatives). For
    * corpus-scale anchor sets swap the crossJoin for any banded candidate
    * generator ([[lshTopK]]'s) and keep the same band + rank tail.
    * Output: (probe_id, neighbor_id, cosine, rank), rank 1 = hardest.
    *
    * The band filters on the 6-decimal-ROUNDED cosine — the same value the
    * output reports — so a consumer asserting `cosine < maxCos` on the
    * output never sees a violation from a raw 0.7999996 printing as 0.8.
    * Zero vectors are dropped BEFORE scoring (norm 0 makes cosine 0/0:
    * an ANSI-mode runtime error, and NaN otherwise — which Spark orders
    * above every number, so it would rank as the #1 "hardest" row); a
    * NaN-element vector still scores NaN and is dropped explicitly after.
    */
  def hardNegatives(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      maxCos: Double,
      minCos: Double = -1.0,
  ): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(minCos < maxCos, s"empty band: minCos $minCos >= maxCos $maxCos")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .filter(nonZeroVec(col("cvec")))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .filter(nonZeroVec(col("pvec")))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("pvec"), col("cvec")))
      .filter(!isnan(col("cosine")))
      .filter(round(col("cosine"), 6) < maxCos &&
        round(col("cosine"), 6) >= minCos)
    rankTopK(scored, k)
  }

  /** Hard-positive mining: for each probe, the k corpus rows LEAST
    * similar among those above the positive threshold `minCos` — the
    * borderline positives (rank ascending by cosine; rank 1 = hardest,
    * i.e. lowest cosine that still counts as positive). The complement of
    * [[hardNegatives]]: together they assemble the (anchor, hard-positive,
    * hard-negative) triplets of a triplet/contrastive training set. Same
    * broadcast-scan + bounded-heap shape (the heap ranks on negated
    * cosine, so partial aggregation still moves k-entry buffers only).
    * The floor filters on the rounded cosine and NaNs are dropped — see
    * [[hardNegatives]] for why both matter.
    */
  def hardPositives(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      minCos: Double,
  ): DataFrame = {
    require(k >= 1, "need k >= 1")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .filter(nonZeroVec(col("cvec")))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .filter(nonZeroVec(col("pvec")))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineNative(col("pvec"), col("cvec")))
      .filter(!isnan(col("cosine")))
      .filter(round(col("cosine"), 6) >= minCos)
    rankTopK(scored, k, asc = true)
  }

  /** Contrastive-training triplet assembly: the composition the two hard
    * miners exist for. For each anchor, the kPos hardest positives cross
    * the kNeg hardest negatives → (anchor_id, pos_id, neg_id, pos_cosine,
    * neg_cosine, pos_rank, neg_rank), kPos×kNeg rows per anchor — the
    * (a, p, n) rows a triplet/InfoNCE loss consumes directly.
    *
    * Scale shape: both miners are broadcast-probe scans with bounded-heap
    * tails, so each side is ≤ k rows per anchor BEFORE the final join;
    * the triplet join is an equi-join on anchor id between two
    * (|anchors| × k)-sized inputs — never corpus-sized. The per-anchor
    * cross of two ≤k lists is bounded by construction (kPos×kNeg), not a
    * data-dependent blow-up. Anchors with an empty band on either side
    * emit no triplets (inner join): a training set wants complete
    * triplets, not null-padded ones.
    */
  def miningTriplets(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      kPos: Int,
      kNeg: Int,
      minPosCos: Double,
      maxNegCos: Double,
      minNegCos: Double = -1.0,
  ): DataFrame = {
    val pos = hardPositives(corpus, probes, vecCol, idCol, kPos, minPosCos)
      .select(col("probe_id").as("anchor_id"), col("neighbor_id").as("pos_id"),
        col("cosine").as("pos_cosine"), col("rank").as("pos_rank"))
    val neg = hardNegatives(corpus, probes, vecCol, idCol, kNeg, maxNegCos, minNegCos)
      .select(col("probe_id").as("anchor_id"), col("neighbor_id").as("neg_id"),
        col("cosine").as("neg_cosine"), col("rank").as("neg_rank"))
    pos.join(neg, Seq("anchor_id"))
      .select(col("anchor_id"), col("pos_id"), col("neg_id"),
        col("pos_cosine"), col("neg_cosine"), col("pos_rank"), col("neg_rank"))
  }

  /** Corpus-aware SRP banding config (planes, tables) for the banded hard
    * miners, solved from the band-EDGE cosine — the dial that keeps the
    * miners' recall one decade past their tuning rung. Mechanism of the
    * failure it prevents: at a FIXED plane count, expected bucket fill is
    * n/2^planes, so a growing corpus eventually pushes EVERY bucket over
    * the degenerate-bucket guard (`maxBucketSize`) and the candidate stage
    * starves — measured at the generated sf10 (200k vectors, planes=4 →
    * 12.5k/bucket vs the 10k cap): recall@5 collapsed 0.88/0.84 → 0.17/0.15
    * (RECALL_sf10_r11.json, pre-dial). The solve:
    *  - planes = max(floor, ⌈log2(n / targetBucket)⌉) holds expected fill
    *    at ~targetBucket (half the guard cap, so the guard only fires on
    *    GENUINE degeneracy, never on healthy growth);
    *  - per-plane collision for a pair AT the band edge is
    *    p₁ = 1 − acos(edgeCos)/π (the borderline pair is the hardest one
    *    the meter checks — for hard negatives the true top-k sit just
    *    under `maxCos`, for hard positives just over `minCos`);
    *  - tables = max(floor, ⌈ln(0.25)/ln(1 − p₁^planes)⌉) targets ≥ 75%
    *    theoretical recall at the edge (contract floor 0.6).
    * Cost shape this buys: banded rows grow n·tables ≈ n^(1+ρ) with
    * ρ = ln(1/p₁)/ln 2 (≈ 0.78 at edgeCos 0.25) — a LOW edge cosine is
    * intrinsically the expensive LSH regime (hard negatives are nearly
    * orthogonal to their anchors, where hyperplane hashes discriminate
    * worst). A 100 TB deployment mining at such an edge should either
    * raise the edge, mine within IVF cells ([[ivfSearch]] candidates),
    * or accept the near-scan candidate volume; this dial makes the
    * tradeoff explicit instead of silently starving the guard.
    */
  def hardBandConfig(
      n: Long,
      edgeCos: Double,
      planesFloor: Int = 4,
      tablesFloor: Int = 16,
      targetBucket: Long = 5000L,
  ): (Int, Int) = {
    require(edgeCos > -1.0 && edgeCos < 1.0, "edgeCos must be in (-1, 1)")
    require(n >= 1 && planesFloor >= 1 && tablesFloor >= 1 && targetBucket >= 1,
      "n, floors, targetBucket must be positive")
    val planes = math.max(planesFloor,
      math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)
    val p1 = 1.0 - math.acos(edgeCos) / math.Pi
    val pTable = math.pow(p1, planes)
    val tables = math.max(tablesFloor,
      math.ceil(math.log(0.25) / math.log(1.0 - pTable)).toInt)
    (planes, tables)
  }

  /** Corpus-scale hard-negative mining: [[hardNegatives]] semantics with
    * [[lshTopK]]'s SRP-banded candidate generation instead of the
    * broadcast cross — the scale path the exact miner's scaladoc promises.
    * The anchor set can be corpus-sized: both sides shuffle narrow
    * (table, bucket, id) rows, candidate pairs dedup across tables,
    * vectors re-join candidate-sized, and the exact-cosine band + bounded
    * heap run on candidates only. Approximate by construction (a hard
    * negative in no shared bucket is missed — recall follows the SRP
    * collision math at the band's cosine, which is HIGH for the hard band
    * near the positive threshold, exactly where LSH recall is best);
    * measure with [[recallAtK]] against the exact miner on a probe
    * sample. Same band/NaN discipline as the exact miner.
    */
  def hardNegativesLsh(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      maxCos: Double,
      minCos: Double = -1.0,
      planes: Int = 12,
      tables: Int = 1,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(minCos < maxCos, s"empty band: minCos $minCos >= maxCos $maxCos")
    val scored = lshScored(corpus, probes, vecCol, idCol, planes, tables,
      maxBucketSize)
      .filter(!isnan(col("cosine")))
      .filter(round(col("cosine"), 6) < maxCos &&
        round(col("cosine"), 6) >= minCos)
    rankTopK(scored, k)
  }

  /** Corpus-scale hard-positive mining: [[hardPositives]] over the SRP
    * candidate stage, ranked ascending. Note the recall asymmetry vs
    * [[hardNegativesLsh]]: borderline positives sit at the LOW-cosine
    * edge of the positive band, where SRP collision probability is at its
    * weakest within the band — verify recall on a sample before trusting
    * a tight `minCos` at scale, or raise `tables`.
    */
  def hardPositivesLsh(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      minCos: Double,
      planes: Int = 12,
      tables: Int = 1,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    require(k >= 1, "need k >= 1")
    val scored = lshScored(corpus, probes, vecCol, idCol, planes, tables,
      maxBucketSize)
      .filter(!isnan(col("cosine")))
      .filter(round(col("cosine"), 6) >= minCos)
    rankTopK(scored, k, asc = true)
  }

  /** Streaming twin of the banded hard miners: anchors arrive as a
    * stream, the corpus is static. The batch [[lshScored]] re-joins the
    * probe side after candidate dedup — on a stream that would be a
    * stream-stream join, so the streaming stage instead CARRIES the probe
    * vector through the banding (pvec duplicated `tables`× per probe —
    * per-micro-batch anchors are small; the corpus side still shuffles
    * ids only). Shape: stateless band projection → stream-static
    * (table, bucket) equi-join → stateful (probe, neighbor) dedup (the
    * multi-table hit guard; state is per-pair and unbounded, the
    * continuous-serving tradeoff, same as the other serving twins) →
    * static vector re-join → band filter → ONE bounded-heap aggregation
    * (complete mode). Spark permits the stateful dedup before the single
    * aggregation; a second aggregation would not be allowed.
    */
  private def lshScoredStream(
      corpus: DataFrame,
      probeStream: DataFrame,
      vecCol: String,
      idCol: String,
      planes: Int,
      tables: Int,
      maxBucketSize: Int,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val dims = vecDims(corpus, vecCol)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .filter(nonZeroVec(col("cvec")))
    val p = probeStream.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .filter(nonZeroVec(col("pvec")))
    def bands(vec: String): Column = posexplode(
      graft.functions.GraftFunctions.srpBands(col(vec), planes, tables, math.max(dims, 1)))
    val bandedC = Dedup.dropOverfullBuckets(
      c.select(col("neighbor_id"), bands("cvec").as(Seq("table", "bucket"))),
      Seq("table", "bucket"), maxBucketSize, "lshScoredStream", logMetric = false)
    val bandedP = p.select(col("probe_id"), col("pvec"),
      bands("pvec").as(Seq("table", "bucket")))
    bandedP
      .join(bandedC, Seq("table", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("pvec"), col("neighbor_id"))
      .dropDuplicates("probe_id", "neighbor_id")
      .join(c, Seq("neighbor_id"))
      .withColumn("cosine", cosineNative(col("pvec"), col("cvec")))
      .select(col("probe_id"), col("neighbor_id"), col("cosine"))
  }

  /** Streaming [[hardNegativesLsh]]: run with `outputMode("complete")`. */
  def hardNegativesLshStream(
      corpus: DataFrame,
      probeStream: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      maxCos: Double,
      minCos: Double = -1.0,
      planes: Int = 12,
      tables: Int = 1,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(minCos < maxCos, s"empty band: minCos $minCos >= maxCos $maxCos")
    val scored = lshScoredStream(corpus, probeStream, vecCol, idCol, planes,
      tables, maxBucketSize)
      .filter(!isnan(col("cosine")))
      .filter(round(col("cosine"), 6) < maxCos &&
        round(col("cosine"), 6) >= minCos)
    rankTopK(scored, k)
  }

  /** Streaming [[hardPositivesLsh]]: run with `outputMode("complete")`. */
  def hardPositivesLshStream(
      corpus: DataFrame,
      probeStream: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      minCos: Double,
      planes: Int = 12,
      tables: Int = 1,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    require(k >= 1, "need k >= 1")
    val scored = lshScoredStream(corpus, probeStream, vecCol, idCol, planes,
      tables, maxBucketSize)
      .filter(!isnan(col("cosine")))
      .filter(round(col("cosine"), 6) >= minCos)
    rankTopK(scored, k, asc = true)
  }

  /** Deterministic probe sample for [[recallAtK]] at corpus scale: keep
    * ~1/`oneIn` of the rows by salted hash of the id ([[Sample
    * .sampleByHash]] — a narrow scan-side filter, same rows on any
    * cluster layout). Feed the SAME sampled frame to both the exact side
    * ([[bruteForceTopK]], whose cost is |probes| × |corpus|) and the
    * approximate side, and recallAtK over the pair is an unbiased
    * estimate of full-probe-set recall with the truth cost bounded by
    * construction — at 100 TB pick `oneIn` so the sample is audit-sized.
    * The salt keeps the sample private to the meter: an index tuned on
    * the same ids it is audited with would overstate recall.
    */
  def probeSample(
      probes: DataFrame,
      idCol: String,
      oneIn: Int,
      salt: String = "recall-probe",
  ): DataFrame = Sample.sampleByHash(probes, idCol, oneIn, salt)

  /** Recall@k of an approximate top-k result against the exact one: the
    * fraction of true (probe, neighbor) pairs the approximate search
    * found. Both inputs are `(probe_id, neighbor_id, …)` as produced by
    * [[bruteForceTopK]] / [[lshTopK]] / [[ivfSearch]]. One small row out —
    * the number a pipeline watches to know its ANN index is still honest.
    * Scale shape: a semi-join on (probe, neighbor) plus two counts; both
    * sides are k rows per probe, never corpus-sized.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val pair = Seq("probe_id", "neighbor_id")
    // distinct guards against duplicate (probe, neighbor) rows in either
    // input double-counting; recall is NULL (undefined) when the exact
    // side is empty — a monitor should treat that as "no ground truth",
    // not as 0 or 1
    val truth = exact.select(pair.map(col): _*).dropDuplicates(pair)
    val found = truth.join(approx.select(pair.map(col): _*), pair, "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_true"), col("n_found"),
        round(col("n_found").cast("double") / col("n_true"), 6).as("recall"))
  }
}
