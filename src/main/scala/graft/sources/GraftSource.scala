package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.schema.Schema

/** Schema-gated sources and a partitioned sink.
  *
  * The reference is schema-first: the declared JSON schema is a security
  * gate deciding which fields a query may touch (reference:
  * README.md:206-208, `ErrUnexistingField` src/Ifrit/Semantic.purs:47).
  * These readers extend the same gate to the load boundary:
  *
  *  - data is always read with a declared schema, never inferred — at
  *    100 TB, schema inference is an extra full pass over the data (and
  *    nondeterministic under schema drift across files);
  *  - only declared fields are projected into the engine, so column
  *    pruning reaches the scan even before any query runs, and undeclared
  *    (out-of-scope) columns are unreachable by construction;
  *  - declared-vs-physical type mismatches fail at load with a clear
  *    error instead of surfacing mid-query (parquet — the self-describing
  *    format — only; JSON/CSV have no physical schema to validate
  *    against, so there the declared schema is simply applied).
  */
object GraftSource {

  /** Read a parquet table through the schema gate. Parquet carries its own
    * physical schema; the declared schema selects and validates. Numeric
    * physical types (int/long/float/double/decimal) all satisfy the
    * dialect's single Number type, mirroring `Schema.fromStructType`.
    */
  def parquet(spark: SparkSession, path: String, schemaJson: String): Either[String, DataFrame] =
    Schema.fromString(schemaJson).flatMap { schema =>
      gate(spark.read.parquet(path), schema)
    }

  /** Read newline-delimited JSON with the declared schema (no inference
    * pass; undeclared fields are never parsed). Unlike parquet, JSON
    * carries no physical schema to validate against: a declared field
    * absent from the data reads as null per Spark's PERMISSIVE-mode
    * semantics rather than failing at load — the load-time mismatch
    * guarantee applies to the parquet reader only.
    */
  def json(spark: SparkSession, path: String, schemaJson: String): Either[String, DataFrame] =
    Schema.fromString(schemaJson).map { schema =>
      spark.read.schema(Schema.toStructType(schema)).json(path)
    }

  /** Read CSV with the declared schema (header expected; no inference). */
  def csv(spark: SparkSession, path: String, schemaJson: String): Either[String, DataFrame] =
    Schema.fromString(schemaJson).map { schema =>
      spark.read.option("header", "true").schema(Schema.toStructType(schema)).csv(path)
    }

  /** Read ORC through the same closed-world gate as [[parquet]] — ORC
    * carries a physical schema, so declared-vs-physical validation applies
    * at load, and column pruning + predicate pushdown reach the ORC scan
    * exactly as for parquet.
    */
  def orc(spark: SparkSession, path: String, schemaJson: String): Either[String, DataFrame] =
    Schema.fromString(schemaJson).flatMap { schema =>
      gate(spark.read.orc(path), schema)
    }

  /** Project a loaded DataFrame down to the declared fields, validating
    * declared-vs-physical type compatibility field by field.
    */
  private[sources] def gate(df: DataFrame, schema: Schema): Either[String, DataFrame] =
    schema match {
      case Schema.SObject(fields) =>
        val errs = fields.toList.flatMap { case (name, declared) =>
          df.schema.fields.find(_.name == name) match {
            case None => List(s"unexisting field: $name")
            case Some(f) =>
              if (compatible(declared, f.dataType)) Nil
              else List(s"field $name: declared ${declared.show} but stored ${f.dataType.simpleString}")
          }
        }
        if (errs.nonEmpty) Left(errs.mkString("; "))
        else Right(df.select(fields.toList.map { case (n, _) => col(n) }: _*))
      case other => Left(s"top-level schema must be an object, got ${other.show}")
    }

  private def compatible(declared: Schema, physical: DataType): Boolean =
    (declared, physical) match {
      case (Schema.SNumber, _: NumericType)         => true
      case (Schema.SString, StringType)             => true
      case (Schema.SBoolean, BooleanType)           => true
      case (Schema.SNull, NullType)                 => true
      case (Schema.SArray(el), ArrayType(pel, _))   => compatible(el, pel)
      case (Schema.SObject(fs), st: StructType) =>
        fs.forall { case (n, s) =>
          st.fields.find(_.name == n).exists(f => compatible(s, f.dataType))
        }
      case _ => false
    }

  /** Partitioned parquet sink. `partitionCols` should be low-cardinality
    * (they become directory levels); the write repartitions on them first
    * so each output partition is produced by one task instead of every
    * task appending a small file to every partition — the classic
    * small-files failure at scale. `maxRecordsPerFile` bounds file size
    * for downstream readers.
    */
  def writeParquet(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L,
  ): Unit =
    writeTail(
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*) else df,
      path, partitionCols, maxRecordsPerFile)

  /** Shared writer tail of the parquet sinks (options, mode, partitioning). */
  private def writeTail(
      out: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long,
  ): Unit = {
    val writer = out.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }

  /** Clustered parquet sink: like [[writeParquet]], but rows are
    * additionally sorted by `sortCols` within every output file. Parquet
    * keeps min/max statistics per row group, so a downstream filter on a
    * sort column skips whole row groups / files without reading them —
    * the cheap half of a zone-map index, and the difference between "scan
    * 100 TB" and "scan the 2% of files whose range matches" for scans
    * keyed on time or id. Sorting happens within partitions
    * (`sortWithinPartitions`) — no extra global shuffle beyond
    * [[writeParquet]]'s partition-collapsing repartition; for a total
    * order across files within each partition, range-partition upstream.
    *
    * The in-task sort leads with `partitionCols`: the partitioned writer
    * REQUIRES rows ordered by partition columns per task and would insert
    * its own (sortCols-destroying) sort if ours didn't have them as a
    * prefix.
    */
  def writeParquetSorted(
      df: DataFrame,
      path: String,
      sortCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L,
  ): Unit = {
    require(sortCols.nonEmpty, "writeParquetSorted needs at least one sort column")
    val out = (if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*) else df)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    writeTail(out, path, partitionCols, maxRecordsPerFile)
  }

  /** Deterministic SHARDED export with a verification manifest — the
    * training-serving handoff: rows land in `numShards` shards by
    * `pmod(xxhash64(id), n)` (stable across reruns, retries, and
    * cluster layouts — the [[graft.ops.Sample]] determinism contract),
    * sorted by id within each shard (parquet row-group pruning on the
    * id), written as `shard=K/` partition directories. The returned
    * MANIFEST — also written to `<path>__manifest` — has one row per
    * shard: `(shard, n_rows, ids_xor)` where `ids_xor` is the
    * order-independent XOR of the ids' md5-derived 60-bit hashes. A
    * consumer re-derives the same three numbers from whatever it read
    * and compares: any lost, duplicated, or corrupted-id row flips the
    * XOR. Aggregation is map-side combined; the manifest is
    * `numShards` rows — driver-sized.
    */
  def writeShardedWithManifest(
      df: DataFrame,
      path: String,
      idCol: String,
      numShards: Int,
      maxRecordsPerFile: Long = 5000000L,
  ): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val sharded = df.withColumn("shard",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col(idCol)),
        org.apache.spark.sql.functions.lit(numShards.toLong)).cast("int"))
    writeParquetSorted(sharded, path, sortCols = Seq(idCol),
      partitionCols = Seq("shard"), maxRecordsPerFile = maxRecordsPerFile)
    val manifest = shardManifest(sharded, idCol)
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "__manifest")
    manifest
  }

  /** BUCKETED parquet table — the co-located-join layout. Rows hash
    * into `nBuckets` bucket files on `bucketCols` at WRITE time and the
    * bucketing is recorded in the session catalog, so every later
    * equi-join or aggregation on the bucket key between same-bucketed
    * tables runs with ZERO exchange (plan-guarded in SourcesSpec). Each
    * bucket file is additionally sorted on the key — parquet row-group
    * min/max pruning on key lookups; Spark 3+ no longer propagates that
    * order into sort-merge joins by default (SPARK-28632 — the in-task
    * re-sort of an already-sorted bucket is nearly free; opt back in
    * with `spark.sql.legacy.bucketedTableScan.outputOrdering` where the
    * sort itself dominates). At 100 TB this is the
    * difference between re-shuffling the fact table on every query and
    * paying the layout shuffle once: bucket both sides of a recurring
    * join (doc ↔ metadata, batch ↔ signature store) on the same key
    * and count.
    *
    * The frame is pre-repartitioned into the same hash layout the
    * bucketing uses (Spark's bucket assignment IS
    * `HashPartitioning(bucketCols, nBuckets)`), so each bucket is ONE
    * file, not one-per-task — the small-files guard of [[writeParquet]]
    * applied to buckets.
    *
    * Read it back with `spark.table(name)` — the bucket metadata lives
    * in the catalog, so a bare `read.parquet(path)` of the same files
    * sees plain parquet and re-shuffles. On a cluster, a persistent
    * metastore makes the layout durable across sessions; data files are
    * external at `path` either way.
    */
  def writeBucketed(
      df: DataFrame,
      name: String,
      path: String,
      bucketCols: Seq[String],
      nBuckets: Int,
  ): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    df.repartition(nBuckets, bucketCols.map(col): _*)
      .write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)
  }

  /** The manifest of an already-sharded frame (must carry a `shard`
    * column): `(shard, n_rows, ids_xor)`. Run it on the CONSUMER side
    * over what was actually read and compare with the producer's
    * manifest — equality certifies the handoff.
    */
  def shardManifest(sharded: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // md5Long60 resolves via call_function; register like every other
    // call site so a session without GraftExtensions still works.
    graft.functions.GraftFunctions.register(sharded.sparkSession)
    sharded.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(bit_xor(
          graft.functions.GraftFunctions.md5Long60(col(idCol).cast("string").cast("binary"))),
          lit(0L)).as("ids_xor"))
  }

  // ---- WARC / WET (ISO 28500) — the crawl-native entry point ----

  /** The parsed-record schema [[readWarc]] produces. `content_length` is
    * the record's own header claim; `truncated` flags records whose
    * available payload bytes fall short of it (the malformed tail of a
    * crawl — kept, flagged, never fatal).
    */
  val warcStructType: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("url", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("truncated", BooleanType),
    StructField("text", StringType),
  ))

  /** Read WARC/WET files (ISO 28500: `WARC/x.y` version line, `Name:
    * value` header lines, a blank CRLF line, then exactly
    * `Content-Length` payload bytes, then two CRLFs) into one row per
    * record. Both WARC/1.0 and WARC/1.1 (ISO 28500:2017) records parse —
    * the split boundary is the version-agnostic `\r\n\r\nWARC/` and the
    * projection strips whatever `x.y` version number follows, so a 1.1
    * file (or a mixed directory) yields every record rather than
    * collapsing into one row.
    *
    * Scale shape: the text source splits each file at the
    * `\r\n\r\nWARC/` record boundary (a custom `lineSep`), so a
    * directory of WARC files reads as one parallel scan — per-record
    * parsing is then a pure codegen'd projection (regexp over the
    * ASCII header block + a byte-accurate binary substring of the
    * payload), no shuffle, no driver pass. Header fields absent from a
    * record parse as NULL; a record whose payload runs short of its
    * Content-Length claim is flagged `truncated` with the bytes that
    * are there. The one documented blind spot of boundary-splitting: a
    * payload that itself contains the boundary string splits early —
    * the containing record is flagged `truncated` (its payload runs
    * short of its Content-Length) and the spurious fragment surfaces as
    * a null-header row (the remnant strip requires a header-shaped
    * continuation, so no fragment bytes are eaten), rather than
    * corrupting neighbors.
    *
    * Payload truncation is BYTE-accurate (`Content-Length` is in
    * bytes): the record is sliced as binary and only then decoded, so
    * multibyte UTF-8 payloads round-trip exactly.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    parseWarcRecords(spark.read.option("lineSep", "\r\n\r\nWARC/").text(path))

  /** Streaming twin of [[readWarc]]: the crawl-directory INGEST shape —
    * new `.warc`/`.warc.gz` files appearing under `path` stream in as
    * parsed records (the file streaming source tracks seen files; the
    * record parse is the same stateless projection as batch, so any
    * output mode works and no state store is involved). Pair with
    * [[readWet]]-style filters and the streaming dedup/quality twins
    * for a continuously-ingesting pipeline.
    */
  def readWarcStream(spark: SparkSession, path: String): DataFrame =
    parseWarcRecords(spark.readStream.option("lineSep", "\r\n\r\nWARC/").text(path))

  /** The shared record-parsing projection over `value` rows split at the
    * record boundary (batch and streaming twins).
    */
  private[sources] def parseWarcRecords(rec0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // a file's first record keeps its full `WARC/x.y` version line, while
    // records after a split at the version-agnostic `\r\n\r\nWARC/`
    // boundary start with the bare `x.y` remnant — strip either so every
    // record is a bare header block + payload. The strip requires a
    // header-shaped continuation (lookahead: `WARC-`/`Content-`, the only
    // first-header names the ISO 28500 named fields admit) so a FALSE
    // split — a payload that itself contains the boundary string followed
    // by something version-line-shaped — does not also lose payload text
    // to the remnant strip; such fragments keep their bytes and surface
    // as null-header rows instead.
    val rec = regexp_replace(col("value"),
      "^(WARC/)?[0-9]+\\.[0-9]+\r\n(?=WARC-|Content-)", "")
    val headers = substring_index(rec, "\r\n\r\n", 1)
    def h(name: String) =
      nullif(regexp_extract(headers, name + ": ([^\r\n]*)", 1), lit(""))
    val clen = h("Content-Length").cast("long")
    // WARC header names/values are ASCII by grammar (non-ASCII URIs are
    // percent-encoded), so the header block's char and byte lengths
    // coincide; payload slicing is still done on the binary form
    val bodyStart = octet_length(headers) + lit(5) // 1-based, past \r\n\r\n
    val available = octet_length(rec) - octet_length(headers) - lit(4)
    rec0.select(
      h("WARC-Type").as("warc_type"),
      h("WARC-Target-URI").as("url"),
      h("WARC-Date").as("warc_date"),
      h("Content-Type").as("content_type"),
      clen.as("content_length"),
      (available < clen).as("truncated"),
      // no Content-Length claim → no payload contract → null text
      // (least() would otherwise skip the null and take `available`)
      when(clen.isNotNull,
        rec.cast("binary").substr(bodyStart, least(clen, available.cast("long")).cast("int"))
          .cast("string")).as("text"),
    )
  }

  /** WET convenience view: the `conversion` records (extracted plain
    * text) of [[readWarc]], as `(url, warc_date, text)` — the shape a
    * text pipeline ingests from Common-Crawl-style WET dumps.
    */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    readWarc(spark, path)
      .filter(col("warc_type") === "conversion")
      .select(col("url"), col("warc_date"), col("text"))
  }

  /** WARC through the same closed-world schema gate as the other
    * sources: the declared schema selects which of the parsed record
    * fields ([[warcStructType]]) a query may touch.
    */
  def warc(spark: SparkSession, path: String, schemaJson: String): Either[String, DataFrame] =
    Schema.fromString(schemaJson).flatMap { schema =>
      gate(readWarc(spark, path), schema)
    }

  /** One WARC record as a string column — the fixture/writer half of the
    * round trip: version line, the four standard headers, a
    * byte-accurate Content-Length, blank line, payload, one CRLF (the
    * text writer's `\r\n` lineSep supplies the second, landing exactly
    * on the ISO 28500 record terminator). Write with
    * `df.select(warcRecord(...).as("value")).write.option("lineSep",
    * "\r\n").text(dir)`.
    */
  def warcRecord(warcType: org.apache.spark.sql.Column, url: org.apache.spark.sql.Column,
      date: org.apache.spark.sql.Column, ctype: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: "), warcType, lit("\r\n"),
      lit("WARC-Target-URI: "), url, lit("\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("Content-Type: "), ctype, lit("\r\n"),
      lit("Content-Length: "), octet_length(text).cast("string"), lit("\r\n"),
      lit("\r\n"),
      text, lit("\r\n"))
  }
}
