package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering plus a
  * min/max file manifest and a manifest-pruned reader.
  *
  * Why this exists at 100 TB: a single-column sort gives parquet tight
  * per-file min/max ranges on ONE column — filters on any other column
  * still touch every file. Interleaving the bits of several columns'
  * bucket indices and range-partitioning on that interleaved value
  * (the classic Z-order curve of Orenstein/Merrett 1984, used by every
  * modern lakehouse layout service) gives every file a tight range on
  * EVERY interleaved dimension simultaneously (~N^(1/d) of the domain
  * per dimension for N files over d dimensions). A reader that checks
  * file ranges before scheduling the scan then skips the bulk of the
  * corpus for selective predicates on ANY of the layout dimensions —
  * the difference between "scan 100 TB" and "scan the few percent of
  * files whose ranges overlap the predicate".
  *
  * Everything here is plain column arithmetic (codegen'd end to end —
  * the z-value is shifts/ands/ors over equi-width bucket indices, no
  * UDF) and the layout write is ONE range-partitioning shuffle — the
  * same pay-the-layout-once economics as `GraftSource.writeBucketed`.
  * The manifest is |files| rows — driver-sized by construction, the
  * same bound as the shard manifest.
  */
object Layout {

  /** Equi-width bucket index of `c` in [0, 2^bits): linear scaling of
    * [lo, hi] with clamping on both ends, so out-of-range values land in
    * the edge buckets instead of corrupting the interleave. A degenerate
    * domain (hi == lo) maps everything to the top bucket via the +Inf
    * division — still a valid constant index. NULL propagates (callers
    * route nulls explicitly; see [[zValue]]).
    */
  private[sources] def bucketIdx(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = (1L << bits).toDouble
    val w = (hi - lo) / n
    least(greatest(floor((c.cast("double") - lit(lo)) / lit(w)), lit(0.0)), lit(n - 1))
      .cast("long")
  }

  /** The Z-value (Morton code) of `cols`: per-column equi-width bucket
    * indices bit-interleaved into one long, dimension 0 in the least
    * significant position of each bit group. `bits` per dimension;
    * `bits * cols.size` must fit a positive long. NULL in any dimension
    * makes the z-value NULL — the layout write pins such rows to the
    * END of the layout with explicit `asc_nulls_last` ordering (Spark's
    * DEFAULT ascending order is NULLS FIRST, so the placement must be
    * explicit), which is exactly where a range-pruning reader wants
    * them: in files whose manifest rows carry null-range columns and
    * which are only read when the residual filter could match.
    *
    * Pure shift/and/or column arithmetic over the bucket indices — the
    * whole z-value codegens into the projection, and (deliberately) has
    * an exact integer-arithmetic SQL mirror for the oracle.
    */
  def zValue(cols: Seq[Column], los: Seq[Double], his: Seq[Double], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size == los.size && cols.size == his.size,
      "zValue: cols/los/his must align")
    require(bits >= 1 && bits * cols.size <= 62,
      s"zValue: $bits bits x ${cols.size} dims must fit a positive long")
    val d = cols.size
    val idx = cols.zipWithIndex.map { case (c, i) => bucketIdx(c, los(i), his(i), bits) }
    val terms = for {
      b <- 0 until bits
      (ix, dim) <- idx.zipWithIndex
    } yield shiftleft(shiftright(ix, b).bitwiseAND(lit(1L)), b * d + dim)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet Z-ordered on `zCols` (numeric columns): one
    * bounds aggregation (a driver-sized 1-row result), then ONE
    * range-partitioning shuffle on the z-value into `numFiles` roughly
    * equal files, each sorted by z-value internally so parquet row-group
    * min/max stats are tight WITHIN files too. The z-value itself is
    * dropped before writing — it is derivable, and the layout, not the
    * column, is the product.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      bits: Int = 8,
      numFiles: Int = 32,
      maxRecordsPerFile: Long = 5000000L,
  ): Unit = {
    require(zCols.nonEmpty, "writeZOrdered needs at least one layout column")
    val bounds = df.agg(
      zCols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double")))).head,
      zCols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double")))).tail: _*)
      .head()
    val los = zCols.indices.map(i => if (bounds.isNullAt(2 * i)) 0.0 else bounds.getDouble(2 * i))
    val his = zCols.indices.map(i => if (bounds.isNullAt(2 * i + 1)) 0.0 else bounds.getDouble(2 * i + 1))
    val z = zValue(zCols.map(col), los, his, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z").asc_nulls_last)
      .sortWithinPartitions(col("__z").asc_nulls_last)
      .drop("__z")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** [[writeZOrdered]] plus the pruning manifest: after the layout
    * write, one read-back aggregation computes per-FILE `(file, n_rows,
    * min_c, max_c per layout column)` and lands it at
    * `<path>__zmanifest`. The manifest pass scans only the layout
    * columns (column-pruned), and its result is |files| rows. Returns
    * the manifest.
    */
  def writeZOrderedWithManifest(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      bits: Int = 8,
      numFiles: Int = 32,
      maxRecordsPerFile: Long = 5000000L,
  ): DataFrame = {
    writeZOrdered(df, path, zCols, bits, numFiles, maxRecordsPerFile)
    val spark = df.sparkSession
    val manifest = zManifest(spark.read.parquet(path), zCols)
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "__zmanifest")
    manifest
  }

  /** Per-file range stats of an (already written and re-read) frame:
    * `(file, n_rows, min_<c>, max_<c>…)`. Exposed separately so tests
    * and audits can measure layout quality (how tight per-file ranges
    * are) for ANY layout, not just z-ordered ones.
    */
  def zManifest(back: DataFrame, zCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      zCols.flatMap(c => Seq(
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c")))
    back.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** Manifest-pruned read: `ranges` are inclusive `(column, lo, hi)`
    * numeric predicates. Files whose manifest range does not overlap
    * every predicate are never opened — the file list is decided from
    * the |files|-row manifest on the driver (the same driver-sized-state
    * convention as the model stores), and the residual predicate is
    * re-applied to the surviving files, so the result equals a full
    * scan + filter REGARDLESS of manifest staleness in the conservative
    * direction (a manifest listing extra files costs only extra scan; a
    * file missing from the manifest is the producer's append-contract
    * violation, same as the shard manifest).
    *
    * Files with NULL range bounds (all-null layout column values) are
    * kept — the residual filter decides.
    */
  def readPruned(
      spark: SparkSession,
      path: String,
      ranges: Seq[(String, Double, Double)],
  ): DataFrame = {
    require(ranges.nonEmpty, "readPruned needs at least one range predicate")
    val manifest = spark.read.parquet(path + "__zmanifest")
    val keep = ranges.foldLeft(manifest) { case (m, (c, lo, hi)) =>
      m.filter(
        col(s"min_$c").isNull ||
        (col(s"max_$c").cast("double") >= lit(lo) && col(s"min_$c").cast("double") <= lit(hi)))
    }
    val files = keep.select(col("file")).collect().map(_.getString(0)).sorted
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    ranges.foldLeft(base) { case (d, (c, lo, hi)) =>
      d.filter(rangePred(base.schema(c).dataType, c, lo, hi))
    }
  }

  /** What a compaction rewrite consumed and produced. */
  final case class CompactStats(filesIn: Long, bytesIn: Long, filesOut: Long)

  /** Compact a parquet directory into ~`targetFileBytes` files sorted on
    * `sortCols` — the small-files repair. Streaming sinks and incremental
    * batch appends leave a long tail of tiny files, and at 100 TB the
    * scan cost of a tiny file is dominated by per-file overhead (footer
    * round trip, task schedule, open/close) rather than bytes — a corpus
    * fragmented into 10× too many files scans ~10× slower regardless of
    * data volume. The rewrite is ONE range-partitioning shuffle into
    * `ceil(bytes/target)` files (a total order across files on
    * `sortCols`, sorted within each file too — row-group stats stay
    * selective), written to a NEW path: compaction is never in place, the
    * caller flips the directory/catalog pointer once the rewrite lands,
    * so readers never observe a half-compacted directory.
    */
  def compactSorted(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      sortCols: Seq[String],
      targetFileBytes: Long = 128L << 20,
  ): CompactStats = {
    require(sortCols.nonEmpty, "compactSorted needs at least one sort column")
    val (filesIn, bytesIn) = dirStats(spark, inPath)
    val numFiles = math.max(1L, (bytesIn + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
    CompactStats(filesIn, bytesIn, spark.read.parquet(outPath).inputFiles.length.toLong)
  }

  /** [[compactSorted]] for a Z-ordered directory: re-clusters on the
    * z-value (bounds re-derived from the data, so the layout heals even
    * if the domain drifted since the original write) and refreshes the
    * pruning manifest at `<outPath>__zmanifest`. Returns the stats; the
    * refreshed manifest lands beside the data as usual.
    */
  def compactZOrdered(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      zCols: Seq[String],
      bits: Int = 8,
      targetFileBytes: Long = 128L << 20,
  ): CompactStats = {
    val (filesIn, bytesIn) = dirStats(spark, inPath)
    val numFiles = math.max(1L, (bytesIn + targetFileBytes - 1) / targetFileBytes).toInt
    val manifest = writeZOrderedWithManifest(
      spark.read.parquet(inPath), outPath, zCols, bits, numFiles)
    CompactStats(filesIn, bytesIn, manifest.count())
  }

  /** `(file count, total bytes)` of a parquet directory — a driver-side
    * loop over the |files|-sized listing, the same driver-sized bound as
    * the manifests.
    */
  private def dirStats(spark: SparkSession, path: String): (Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = spark.read.parquet(path).inputFiles
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    (files.length.toLong, bytes)
  }

  /** The residual range predicate, shaped so parquet row-group pruning
    * still applies INSIDE the surviving files: comparing
    * `cast(col as double)` to the bounds would be correct but blocks
    * predicate pushdown (Spark never pushes casts), so integral columns
    * compare against the integer-rounded bounds (exactly equivalent for
    * integer-valued data: `x >= lo` ⇔ `x >= ceil(lo)`) and double
    * columns compare directly. Other numeric types (float/decimal) fall
    * back to the cast — correct, just unpushed.
    */
  private def rangePred(
      dt: org.apache.spark.sql.types.DataType, c: String, lo: Double, hi: Double): Column =
    dt match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        col(c) >= lit(math.ceil(lo).toLong) && col(c) <= lit(math.floor(hi).toLong)
      case org.apache.spark.sql.types.DoubleType =>
        col(c) >= lit(lo) && col(c) <= lit(hi)
      case _ =>
        col(c).cast("double") >= lit(lo) && col(c).cast("double") <= lit(hi)
    }

  /** The file list [[readPruned]] would open for `ranges` — the audit
    * half (how much did the layout prune?), driver-sized.
    */
  def prunedFiles(
      spark: SparkSession,
      path: String,
      ranges: Seq[(String, Double, Double)],
  ): Seq[String] = {
    val manifest = spark.read.parquet(path + "__zmanifest")
    val keep = ranges.foldLeft(manifest) { case (m, (c, lo, hi)) =>
      m.filter(
        col(s"min_$c").isNull ||
        (col(s"max_$c").cast("double") >= lit(lo) && col(s"min_$c").cast("double") <= lit(hi)))
    }
    keep.select(col("file")).collect().map(_.getString(0)).toIndexedSeq.sorted
  }
}
