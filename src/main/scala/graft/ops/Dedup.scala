package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB regime:
  *
  *  - exact dedup is a single hash-shuffle groupBy (map-side combinable);
  *  - MinHash/SimHash near-dup avoid the O(n²) pair space by banding:
  *    candidates meet only inside an LSH bucket, so the only wide operation
  *    is a shuffle on (band, bucket) whose fan-in is the collision rate,
  *    not the corpus size;
  *  - verification (exact Jaccard / Hamming) runs only on candidate pairs.
  *
  * All signatures are built from deterministic hash expressions
  * (xxhash64 + affine permutations), so results are stable across runs,
  * partitionings, and cluster sizes.
  */
object Dedup {

  /** Exact duplicate groups by content hash. Returns one row per distinct
    * normalized text: the representative (minimum) id and the duplicate
    * count. One shuffle on the 128-bit content hash; no skew risk beyond
    * genuinely pathological corpora (a single document duplicated billions
    * of times), which AQE's skew-join handling absorbs.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(TextOps.normalized(col(textCol)).cast("binary")).as("content_hash"))
      .agg(
        min(col(idCol)).as("representative"),
        count(lit(1)).as("n_dups"),
      )

  /** Keep only the representative row per distinct text (first by id).
    * Window over the content hash: one shuffle, streams each group.
    */
  def exactKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(TextOps.normalized(col(textCol)).cast("binary")))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: `numHashes` minima of independently seeded hashes
    * of the document's shingles. Seeding via an extra literal argument to
    * xxhash64 gives an independent hash family without 64-bit modular
    * arithmetic (which ANSI mode rejects on overflow). Pure per-row
    * expression work — narrow, codegen'd, no shuffle.
    */
  def minHashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    signatureOfShingles(Shingles.wordShingles(text, shingleSize), numHashes)

  /** Signature from a pre-computed shingle column. Each shingle string is
    * hashed to a long exactly once; the `numHashes` family members then
    * re-hash that long with the seed — hashing 8 bytes instead of the
    * string for every family member (the dominant cost at 64-128 hashes).
    */
  def signatureOfShingles(shingles: Column, numHashes: Int): Column = {
    val base = transform(shingles, s => xxhash64(s))
    array((0 until numHashes).map { i =>
      array_min(transform(base, h => xxhash64(lit(i), h)))
    }: _*)
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: signature (narrow) → explode one row per band with the
    * band's bucket hash → shuffle on (band, bucket) → within-bucket
    * self-join → exact Jaccard verification on candidates only → distinct
    * pairs above threshold. With b bands of r rows, a pair with Jaccard s
    * is caught with probability 1-(1-s^r)^b.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minHashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 5,
      threshold: Double = 0.7,
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val shingled = df
      .select(col(idCol).as("id"), Shingles.wordShingles(col(textCol), shingleSize).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val withSig = shingled.withColumn("sig", signatureOfShingles(col("shingles"), numHashes))

    // Band rows carry only (band, bucket, id): the LSH shuffle and the
    // candidate-pair dedup move narrow rows. Shingle arrays re-join only
    // for the (much smaller) distinct candidate set — at scale this is the
    // difference between shuffling ids and shuffling whole documents.
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows)).as("bucket"))
    }
    // Persisted: both sides of the self-join read it, and it is tiny
    // (bands × one long-keyed row per doc) — without this the full
    // signature computation runs twice.
    val banded = withSig
      .select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
      .persist()

    val left = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    val shingleSets = shingled
    candidates
      .join(shingleSets.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingleSets.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard similarity of two shingle arrays (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    inter / (size(da) + size(db) - inter)
  }

  /** 64-bit SimHash of the document's token multiset: each token hash
    * votes ±1 per bit position; the sign vector packs into a long.
    * Expressed as SQL higher-order functions so the whole signature is one
    * codegen'd projection.
    */
  def simHash(text: Column): Column = {
    val counts = aggregate(
      transform(TextOps.tokens(text), t => xxhash64(t)),
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, j) => a + when(call_function("shiftright", h, j).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)),
    )
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, j) => when(c >= 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (s, v) => s.bitwiseOR(v),
    )
  }

  /** SimHash near-duplicates within a Hamming radius. Banding over four
    * 16-bit chunks (a pair within Hamming distance ≤ 4 of a 64-bit hash
    * agrees exactly on at least one chunk when distance ≤ 3·chunks — for
    * small radii this catches virtually all pairs; exact Hamming check
    * verifies). Shuffle is on (chunk index, chunk value) only.
    */
  def simHashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
  ): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sim"), c * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }
    val banded = withSim.select(col("id"), col("sim"), explode(array(chunks: _*)).as("cc"))
      .select(col("id"), col("sim"), col("cc.chunk"), col("cc.key"))
    val left = banded.select(col("chunk"), col("key"), col("id").as("id_a"), col("sim").as("sim_a"))
    val right = banded.select(col("chunk"), col("key"), col("id").as("id_b"), col("sim").as("sim_b"))
    left.join(right, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard near-duplicates: exact Jaccard over word n-gram sets,
    * with MinHash banding as the candidate generator (never all-pairs).
    * This is `minHashNearDups` re-verified with a different n — kept as its
    * own operator because the n-gram granularity is a quality knob
    * training pipelines tune independently.
    */
  def ngramJaccardNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
  ): DataFrame =
    minHashNearDups(df, textCol, idCol, numHashes = 64, bands = 16, shingleSize = n,
      threshold = threshold)

  /** Embedding-cosine near-duplicates via the similarity operators: SRP-LSH
    * candidate buckets, exact cosine verification. See Similarity.
    */
  def embeddingNearDups(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      planes: Int = 16,
  ): DataFrame = {
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", Similarity.srpBucket(col("vec"), planes))
    val left = withBucket.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val right = withBucket.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    left.join(right, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
