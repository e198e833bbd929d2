package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extraction /
  * resize / frame-sampling operators.
  *
  * Since round 7 the metadata decode is REAL: [[decodeMeta]] parses
  * actual container headers (PNG IHDR, JPEG SOFn, WAV fmt, AVI avih) by
  * pure byte arithmetic — see [[graft.functions.MediaParseUtil]] — and
  * [[encodedMediaTable]] builds payloads with genuine container
  * structure (real magic bytes, chunk walks, CRCs where the format has
  * them) so the parse is exercised end to end on driver data. What
  * remains stubbed is pixel/sample DECODING (`StubCodec`,
  * [[featurize]]'s pseudo-embedding): this environment has no codec
  * libraries, so feature extraction derives deterministic values from
  * payload bytes. Swapping in a real decoder means replacing `StubCodec`
  * bodies only; every signature and plan shape stays.
  *
  * Expression-based variants (decodeMeta/featurize/frameSample) run as
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

  // ---- real container construction (declarative, oracle-mirrorable) ----
  // Every helper is a pure Column expression over builtins (hex/unhex/
  // lpad/concat/crc32), so the payload bytes are reproducible in DuckDB
  // blob SQL and the whole encode stays a codegen'd scan-side projection.

  /** Big-endian u32 as 4 bytes. */
  private def be32(v: Column): Column = unhex(lpad(hex(v.cast("long")), 8, "0"))

  /** Big-endian u16 as 2 bytes. */
  private def be16(v: Column): Column = unhex(lpad(hex(v.cast("long")), 4, "0"))

  /** Little-endian u32 as 4 bytes (hex-string byte swap). */
  private def le32(v: Column): Column = {
    val h = lpad(hex(v.cast("long")), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** Little-endian u16 as 2 bytes. */
  private def le16(v: Column): Column = {
    val h = lpad(hex(v.cast("long")), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }

  private def bytesLit(bs: Int*): Column = lit(bs.map(_.toByte).toArray)
  private def ascii(s: String): Column = lit(s.getBytes("US-ASCII"))

  /** A PNG chunk: [len u32be][type][body][crc32(type || body)] — the CRC
    * is the real one (Spark's builtin `crc32` is the same CRC-32/ISO-HDLC
    * the PNG spec requires), so the stream survives a checking parser.
    */
  private def pngChunk(ctype: String, body: Column): Column = {
    val tb = concat(ascii(ctype), body)
    concat(be32(length(body)), tb, be32(crc32(tb)))
  }

  /** PNG stream: signature, IHDR (8-bit truecolor), the body bytes as the
    * IDAT chunk (raw, not zlib — dimensions parse regardless), IEND.
    */
  def encodePng(body: Column, w: Column, h: Column): Column = concat(
    bytesLit(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
    pngChunk("IHDR", concat(be32(w), be32(h), bytesLit(8, 2, 0, 0, 0))),
    pngChunk("IDAT", body),
    pngChunk("IEND", lit(Array.empty[Byte])),
  )

  /** JPEG stream: SOI, JFIF APP0, a minimal 1-component SOF0 carrying the
    * dimensions, EOI; the body rides after EOI (decoders stop at EOI, so
    * trailing bytes are legal and common in the wild).
    */
  def encodeJpeg(body: Column, w: Column, h: Column): Column = concat(
    bytesLit(0xff, 0xd8), // SOI
    bytesLit(0xff, 0xe0, 0x00, 0x10), ascii("JFIF"), // APP0, len 16
    bytesLit(0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00),
    bytesLit(0xff, 0xc0, 0x00, 0x0b, 0x08), // SOF0, len 11, 8-bit precision
    be16(h), be16(w),
    bytesLit(0x01, 0x01, 0x11, 0x00), // 1 component, 1x1 sampling
    bytesLit(0xff, 0xd9), // EOI
    body,
  )

  /** WAV (RIFF) stream: canonical 44-byte PCM header (mono, 16-bit) with
    * the given sample rate, body as the data chunk.
    */
  def encodeWav(body: Column, rate: Column): Column = {
    val dataLen = length(body)
    concat(
      ascii("RIFF"), le32(dataLen + lit(36)), ascii("WAVE"),
      ascii("fmt "), le32(lit(16)),
      le16(lit(1)), le16(lit(1)), // PCM, mono
      le32(rate), le32(rate.cast("long") * 2), // byte rate = rate × block align
      le16(lit(2)), le16(lit(16)), // block align, bits/sample
      ascii("data"), le32(dataLen),
      body,
    )
  }

  /** AVI (RIFF) stream: hdrl LIST with a real 56-byte `avih`
    * MainAVIHeader (total frames, width, height), body as a JUNK chunk.
    */
  def encodeAvi(body: Column, w: Column, h: Column, frames: Column): Column = {
    val junkLen = length(body)
    val avihBody = concat(
      le32(lit(33333)), le32(lit(0)), le32(lit(0)), le32(lit(0)), // µs/frame, maxbytes/s, padding, flags
      le32(frames), le32(lit(0)), le32(lit(1)), le32(lit(0)), // total frames, initial, streams, bufsize
      le32(w), le32(h),
      le32(lit(0)), le32(lit(0)), le32(lit(0)), le32(lit(0)), // reserved
    )
    concat(
      ascii("RIFF"), le32(junkLen + lit(88)), ascii("AVI "),
      ascii("LIST"), le32(lit(68)), ascii("hdrl"),
      ascii("avih"), le32(lit(56)), avihBody,
      ascii("JUNK"), le32(junkLen), body,
    )
  }

  /** MP4 (ISO-BMFF) stream: `ftyp`, then a `moov` carrying a version-0
    * `mvhd` (timescale 1000, so duration units are milliseconds) and one
    * `trak`→`tkhd` with the dimensions as 16.16 fixed point, then the
    * body as the `mdat` box. Every box is the plain `[size u32be][type]`
    * form here; the 64-bit-largesize and size-0 escapes of the box
    * grammar are exercised by unit fixtures (they are not
    * Column-expressible without pain, and the walker is offset-generic
    * either way).
    */
  def encodeMp4(body: Column, w: Column, h: Column, durMs: Column): Column = {
    val unity = concat( // the spec's identity transform matrix
      be32(lit(0x10000)), be32(lit(0)), be32(lit(0)),
      be32(lit(0)), be32(lit(0x10000)), be32(lit(0)),
      be32(lit(0)), be32(lit(0)), be32(lit(0x40000000)))
    val mvhd = concat(
      be32(lit(108)), ascii("mvhd"),
      be32(lit(0)), // version 0 + flags
      be32(lit(0)), be32(lit(0)), // creation, modification
      be32(lit(1000)), be32(durMs), // timescale 1000 → duration in ms
      be32(lit(0x10000)), // rate 1.0
      be16(lit(0x100)), be16(lit(0)), // volume 1.0, reserved
      be32(lit(0)), be32(lit(0)), // reserved
      unity,
      be32(lit(0)), be32(lit(0)), be32(lit(0)), // pre_defined
      be32(lit(0)), be32(lit(0)), be32(lit(0)),
      be32(lit(2)), // next_track_ID
    )
    val tkhd = concat(
      be32(lit(92)), ascii("tkhd"),
      be32(lit(7)), // version 0, flags: enabled|in_movie|in_preview
      be32(lit(0)), be32(lit(0)), // creation, modification
      be32(lit(1)), be32(lit(0)), // track_ID, reserved
      be32(durMs),
      be32(lit(0)), be32(lit(0)), // reserved
      be16(lit(0)), be16(lit(0)), be16(lit(0)), be16(lit(0)), // layer, group, volume, reserved
      unity,
      be32(w.cast("long") * 65536), be32(h.cast("long") * 65536), // 16.16
    )
    concat(
      be32(lit(16)), ascii("ftyp"), ascii("isom"), be32(lit(0x200)),
      be32(lit(216)), ascii("moov"), mvhd,
      be32(lit(100)), ascii("trak"), tkhd,
      be32(length(body) + lit(8)), ascii("mdat"), body,
    )
  }

  /** FLAC stream: `fLaC` magic, a last-flag STREAMINFO metadata block
    * (block size 4096, mono 16-bit) carrying the bit-packed sample rate
    * and total-sample count, zeroed md5, body as the (raw) frame bytes.
    */
  def encodeFlac(body: Column, rate: Column, samples: Column): Column = concat(
    ascii("fLaC"),
    bytesLit(0x80, 0x00, 0x00, 0x22), // last block, STREAMINFO, len 34
    bytesLit(0x10, 0x00, 0x10, 0x00), // min/max block size 4096
    bytesLit(0, 0, 0, 0, 0, 0), // min/max frame size unknown
    be16(floor(rate / 16).cast("long")), // sample rate bits 19..4
    unhex(lpad(hex(pmod(rate, lit(16)) * 16), 2, "0")), // sr low nibble | ch-1=0 | bps hi bit
    bytesLit(0xf0), // bps-1=15 low nibble | samples bits 35..32 (0)
    be32(samples),
    lit(Array.fill[Byte](16)(0)), // md5 of raw audio (unset)
    body,
  )

  /** MP3 stream: an MPEG-1 Layer III frame header at 128 kbps with the
    * given sample-rate index (0=44100, 1=48000, 2=32000), optionally
    * preceded by a minimal ID3v2.3 tag (10-byte header + 10 padding
    * bytes, syncsafe size) to exercise the tag skip; body rides after.
    */
  def encodeMp3(body: Column, srIdx: Column, withId3: Boolean): Column = {
    val frame = concat(
      bytesLit(0xff, 0xfb), // sync, MPEG1, Layer III, no CRC
      unhex(lpad(hex(lit(144) + srIdx * 4), 2, "0")), // bitrate idx 9 (128k) | srIdx<<2
      bytesLit(0x00),
      body)
    if (withId3)
      concat(ascii("ID3"), bytesLit(3, 0, 0, 0, 0, 0, 0x0a),
        lit(Array.fill[Byte](10)(0)), frame)
    else frame
  }

  /** Media table with REAL container payloads, derived entirely from the
    * documents table: images alternate PNG/JPEG, audio cycles
    * WAV/FLAC/MP3 (bare + ID3-tagged), video
    * alternates AVI/MP4; dimensions/rates/frame counts derive from the text's byte
    * length (SQL-expressible, so the DuckDB oracle can rebuild the same
    * bytes and parse them back). This is what [[decodeMeta]] parses in
    * the driver rows — the decode is exercised on genuine container
    * structure, not on a hash stub.
    */
  def encodedMediaTable(documents: DataFrame): DataFrame = {
    val body = col("text").cast("binary")
    val len = length(body)
    val w = pmod(len, lit(1280)) + 640
    val h = pmod(len, lit(720)) + 360
    val frames = pmod(len, lit(240)) + 24
    val durMs = pmod(len, lit(590000)) + 1000
    val rate = element_at(
      array(lit(8000), lit(16000), lit(22050), lit(44100), lit(48000)),
      (pmod(len, lit(5)) + 1).cast("int"))
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        when(pmod(col("doc_id"), lit(2)) === 0, encodePng(body, w, h))
          .otherwise(encodeJpeg(body, w, h)))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          when(pmod(col("doc_id"), lit(4)) < 2, encodeWav(body, rate))
            .when(pmod(col("doc_id"), lit(4)) === 2,
              encodeFlac(body, rate, pmod(len, lit(900000)) + 44100))
            .when(pmod(col("doc_id"), lit(8)) === 3,
              encodeMp3(body, pmod(len, lit(3)), withId3 = false))
            .otherwise(encodeMp3(body, pmod(len, lit(3)), withId3 = true)))
        .when(pmod(col("doc_id"), lit(2)) === 0, encodeAvi(body, w, h, frames))
        .otherwise(encodeMp4(body, w, h, durMs)).as("payload"),
    )
  }

  /** The shared md5-derived 60-bit hash (see
    * [[graft.functions.GraftFunctions.md5Long60]]) — gives every stub
    * output a true DuckDB oracle, unlike xxhash64 which DuckDB lacks.
    */
  private def md5Long(c: Column): Column =
    graft.functions.GraftFunctions.md5Long60(c)

  /** REAL decode (round 7, replacing the md5 stub): parse the payload's
    * container header — PNG IHDR, JPEG SOFn, WAV fmt, AVI avih — with the
    * codegen'd [[graft.functions.MediaMeta]] expression. Pure byte
    * arithmetic, no codec library; format is detected from magic bytes
    * (no modality column needed), and unrecognized payloads yield a NULL
    * struct rather than an error. Output adds a `format` field to the
    * metadata struct; the width/height/sample_rate/n_frames contract is
    * unchanged, so [[resizeMeta]] composes directly on the result.
    */
  def decodeMeta(payload: Column): Column = {
    graft.functions.GraftFunctions.mediaMeta(payload)
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
