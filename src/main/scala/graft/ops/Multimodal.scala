package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extraction /
  * resize / frame-sampling operators.
  *
  * The Spark-side machinery — schema, partitioning, batched per-partition
  * processing, output shapes — is real and tested. The *codec* itself is a
  * STUB (this environment has no image/audio libraries): `StubCodec`
  * derives deterministic pseudo-metadata and pseudo-features from the
  * payload bytes. Swapping in a real decoder means replacing the bodies of
  * `StubCodec` only; every signature and plan shape stays.
  *
  * Expression-based variants (decodeMeta/featureize/frameSample) run as
  * codegen'd projections — at 100 TB they are pure scan+project with no
  * shuffle. `decodeBatched` shows the mapPartitions batch pattern used when
  * a real native decoder wants amortized per-batch init (model load, GPU
  * context): partition iterator → fixed-size batches → codec per batch.
  */
object Multimodal {

  /** Canonical media-row schema for a multimodal lakehouse table. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
    )), nullable = true),
  ))

  /** Build a synthetic media table from the documents table (payload =
    * utf-8 bytes of the text; modality assigned round-robin). Lets every
    * multimodal operator run against driver-provided data only.
    */
  def syntheticMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
    )

  /** The shared md5-derived 60-bit hash (see
    * [[graft.functions.GraftFunctions.md5Long60]]) — gives every stub
    * output a true DuckDB oracle, unlike xxhash64 which DuckDB lacks.
    */
  private def md5Long(c: Column): Column =
    graft.functions.GraftFunctions.md5Long60(c)

  /** STUB decode: deterministic pseudo-metadata from the payload hash.
    * A real implementation parses the container header instead; the output
    * schema is what downstream operators contract on.
    */
  def decodeMeta(payload: Column, modality: Column): Column = {
    val h = md5Long(payload)
    struct(
      when(modality === "image" || modality === "video",
        (pmod(h, lit(1280L)) + 640L).cast("int")).as("width"),
      when(modality === "image" || modality === "video",
        (pmod(h, lit(720L)) + 360L).cast("int")).as("height"),
      when(modality === "audio", lit(16000)).as("sample_rate"),
      when(modality === "video", (pmod(h, lit(240L)) + 24L).cast("int")).as("n_frames"),
    )
  }

  /** STUB feature extraction: deterministic pseudo-embedding (dim floats in
    * [-0.5, 0.5)) from payload bytes. Real version: decoded tensor → model
    * forward pass, same `array<float>` output contract. Per-dimension
    * hashes salt the payload with `#<dim>` before md5 (the DuckDB mirror
    * is `md5(text || '#' || j)`).
    */
  def featurize(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      j => (pmod(md5Long(concat(payload, lit("#").cast("binary"), j.cast("string").cast("binary"))),
        lit(1000000L)).cast("double") / 1000000.0 - 0.5)
        .cast("float"))

  /** STUB resize: metadata scaled to the target box; payload passed through
    * (a real codec would re-encode). Aspect ratio preserved.
    */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(meta.getField("width"), meta.getField("height")))
    struct(
      floor(meta.getField("width") * scale).cast("int").as("width"),
      floor(meta.getField("height") * scale).cast("int").as("height"),
      meta.getField("sample_rate").as("sample_rate"),
      meta.getField("n_frames").as("n_frames"),
    )
  }

  /** Frame sampling: n evenly spaced byte-range "frames" from the payload.
    * Real version: container-aware keyframe extraction; the exploded
    * (media_id, frame_idx, frame_bytes) shape is the contract.
    */
  def frameSample(df: DataFrame, n: Int): DataFrame = {
    val len = length(col("payload"))
    val frames = transform(sequence(lit(0), lit(n - 1)), i =>
      struct(i.as("frame_idx"),
        substring(col("payload"),
          (i * (len / n) + 1).cast("int"), greatest((len / n).cast("int"), lit(1))).as("frame_bytes")))
    df.filter(col("modality") === "video")
      .select(col("media_id"), explode(frames).as("f"))
      .select(col("media_id"), col("f.frame_idx"), col("f.frame_bytes"))
  }

  /** The batched per-partition decode pattern for codecs with expensive
    * init. Batches of `batchSize` rows; the stub "decoder" computes payload
    * sizes — a real one decodes the batch on an amortized context.
    */
  def decodeBatched(df: DataFrame, batchSize: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+ StructField("decoded_bytes", IntegerType))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // amortized-init boundary: a real codec initializes once per batch
        val decodedSizes = StubCodec.decodeBatch(batch.map(r => Option(r.getAs[Array[Byte]]("payload"))))
        batch.lazyZip(decodedSizes).map { case (r, d) => Row.fromSeq(r.toSeq :+ d) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

/** The clearly-marked stub codec boundary. Replace these bodies with real
  * decoders (JNI/FFI) without touching any operator above.
  */
object StubCodec {
  /** STUB: "decode" = payload length. Real: decode to tensors. */
  def decodeBatch(payloads: Seq[Option[Array[Byte]]]): Seq[Int] =
    payloads.map(_.map(_.length).getOrElse(0))
}
