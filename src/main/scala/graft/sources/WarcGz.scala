package graft.sources

import java.util.zip.{CRC32, Inflater}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Splittable reading of `.warc.gz` crawl archives.
  *
  * Common Crawl (and warcio-family writers generally) gzip each WARC
  * record as its OWN gzip member and concatenate the members, precisely
  * so that readers can split one multi-GB archive at member boundaries
  * and decompress ranges independently (the trick the WARC ecosystem
  * relies on; ISO 28500 Annex D notes per-record compression as the
  * recommended form). Hadoop's GzipCodec cannot exploit that — it treats
  * the whole file as one non-splittable stream, so a directory with few
  * large files reads with parallelism = number of files. This reader
  * restores full parallelism: byte-range splits over each file, each
  * task locating the first member boundary at-or-after its range start
  * and decompressing members whose START offset lies inside its range
  * (members may run past the range end — the task finishes them; the
  * next task starts at the first boundary past its own start, so every
  * member is decoded exactly once).
  *
  * Boundary location is the standard candidate-scan-and-validate
  * protocol (the same recovery idea as Hadoop's split-aligned line
  * reading): scan for the gzip member magic (`1f 8b 08`, deflate, with
  * the reserved FLG bits clear), then validate by FULLY inflating one
  * member from the candidate — gzip framing intact, CRC32 and ISIZE
  * trailer matching, and the decompressed bytes starting with `WARC/`
  * (every per-record member begins with the version line). A false
  * positive must therefore be a byte offset inside compressed data that
  * is simultaneously a valid full gzip member with a matching 32-bit
  * CRC whose plaintext opens with `WARC/` — vanishingly unlikely, and
  * the accepted trade of every splittable-compression reader.
  *
  * Scale shape: the split list is driver-built from file LENGTHS only
  * (no scan); each task reads its ~32 MB range sequentially once (plus
  * at most one member overrun), so a single 10 GB crawl file becomes
  * ~320 parallel tasks instead of 1. Downstream record parsing is the
  * same stateless codegen'd projection as [[GraftSource.readWarc]] —
  * rows are byte-identical to the whole-stream path (tested).
  */
object WarcGz {

  /** One parallel scan over `.warc.gz` files under `path` (a directory
    * or a single file), split every `splitBytes`, parsed to the
    * [[GraftSource.readWarc]] schema.
    */
  def readWarcGz(spark: SparkSession, path: String, splitBytes: Long = 32L << 20): DataFrame = {
    require(splitBytes >= (1L << 16), "splitBytes must be at least 64 KiB")
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val files: Seq[org.apache.hadoop.fs.FileStatus] =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq else Seq(fs.getFileStatus(p)))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".gz"))
    val splits = files.flatMap { st =>
      val len = st.getLen
      (0L until len by splitBytes).map(off =>
        (st.getPath.toString, off, math.min(off + splitBytes, len)))
    }
    // one split per task: each is an independent ~splitBytes of IO+inflate
    val nPart = math.max(1, splits.size)
    val hconf = new org.apache.spark.SerializableWritable(
      new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration))
    val records = spark.createDataset(splits)
      .repartition(nPart)
      .flatMap { case (file, s, e) => decodeRange(hconf.value, file, s, e) }
    GraftSource.parseWarcRecords(records.toDF("value"))
  }

  /** Decode the members whose start offset lies in `[start, end)` of
    * `file`, returning their records split at the WARC record boundary
    * (the same `\r\n\r\nWARC/` split the text source performs, so the
    * downstream projection is shared verbatim).
    */
  private[graft] def decodeRange(
      conf: org.apache.hadoop.conf.Configuration,
      file: String, start: Long, end: Long): Iterator[String] = {
    val fsPath = new org.apache.hadoop.fs.Path(file)
    val fs = fsPath.getFileSystem(conf)
    val len = fs.getFileStatus(fsPath).getLen
    // 1. find the first validated member boundary at-or-after `start`
    var boundary = -1L
    if (start == 0L) boundary = 0L
    else {
      // scan the raw range for candidates; members are KB-scale so the
      // boundary is found within the first records of the range
      val in = fs.open(fsPath)
      try {
        in.seek(start)
        // read 2 bytes past `end` so a member whose 3-byte magic straddles
        // the split boundary (starts at end-1 or end-2) is still seen by
        // THIS task — the next task only accepts boundaries >= its own
        // start, so without the overlap such members are silently lost
        val window = new Array[Byte]((math.min(end + 2, len) - start).toInt)
        readFully(in, window)
        var i = 0
        // candidates must START inside [start, end); the window merely
        // extends far enough that their magic bytes are visible
        val lastStart = (end - start).toInt
        while (boundary < 0 && i < lastStart && i + 3 <= window.length) {
          if (window(i) == 0x1f.toByte && window(i + 1) == 0x8b.toByte &&
            window(i + 2) == 0x08.toByte &&
            (i + 3 >= window.length || (window(i + 3) & 0xe0) == 0)) {
            if (validMemberAt(fs, fsPath, start + i, len)) boundary = start + i
          }
          i += 1
        }
      } finally in.close()
    }
    if (boundary < 0 || boundary >= end) return Iterator.empty
    // 2. decompress members sequentially from the boundary while their
    //    start offset is inside the range
    val in = new java.io.PushbackInputStream(new java.io.BufferedInputStream(
      { val s = fs.open(fsPath); s.seek(boundary); s }, 1 << 16), PushbackBytes)
    val out = new java.io.ByteArrayOutputStream()
    var pos = boundary
    var ok = true
    try {
      while (ok && pos < end && pos < len) {
        inflateMember(in) match {
          case Some((bytes, compLen)) =>
            out.write(bytes); pos += compLen
          case None => ok = false // trailing garbage / truncated member
        }
      }
    } finally in.close()
    val text = new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    // split concatenated records exactly like the text source's lineSep
    splitRecords(text)
  }

  /** The text-source `lineSep` split, reproduced: pieces after the first
    * lose their `WARC/` prefix (the shared projection strips the bare
    * version remnant), byte behavior identical to `spark.read.text`.
    */
  private def splitRecords(text: String): Iterator[String] =
    if (text.isEmpty) Iterator.empty
    else text.split("\r\n\r\nWARC/", -1).iterator.filter(_.nonEmpty)

  /** Full-member validation at `off`: framing + CRC + `WARC/` plaintext. */
  private def validMemberAt(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, off: Long, len: Long): Boolean = {
    if (off >= len) return false
    val in = new java.io.PushbackInputStream(new java.io.BufferedInputStream(
      { val s = fs.open(path); s.seek(off); s }, 1 << 16), PushbackBytes)
    try inflateMember(in).exists { case (bytes, _) =>
      bytes.length >= 5 && bytes(0) == 'W' && bytes(1) == 'A' && bytes(2) == 'R' &&
        bytes(3) == 'C' && bytes(4) == '/'
    } catch { case _: Exception => false } finally in.close()
  }

  /** Inflate exactly ONE gzip member from the stream: parse the RFC 1952
    * header (FEXTRA/FNAME/FCOMMENT/FHCRC variants), inflate the deflate
    * body, verify the CRC32 + ISIZE trailer. Returns (decompressed
    * bytes, total compressed member length) or None on any framing,
    * checksum, or truncation failure. Bytes the inflater over-read past
    * the deflate body are pushed back, so the stream is left positioned
    * exactly at the next member — sequential decode needs no re-seek.
    */
  private[sources] def inflateMember(in: java.io.PushbackInputStream): Option[(Array[Byte], Long)] = {
    var consumed = 0L
    def u8(): Int = { val b = in.read(); if (b >= 0) consumed += 1; b }
    // ---- fixed header ----
    val id1 = u8(); val id2 = u8(); val cm = u8(); val flg = u8()
    if (id1 != 0x1f || id2 != 0x8b || cm != 8 || flg < 0 || (flg & 0xe0) != 0) return None
    var i = 0
    while (i < 6) { if (u8() < 0) return None; i += 1 } // MTIME+XFL+OS
    if ((flg & 4) != 0) { // FEXTRA: u16le length + payload
      val l1 = u8(); val l2 = u8(); if (l2 < 0) return None
      var n = l1 | (l2 << 8)
      while (n > 0) { if (u8() < 0) return None; n -= 1 }
    }
    if ((flg & 8) != 0) { var b = u8(); while (b > 0) b = u8(); if (b < 0) return None } // FNAME
    if ((flg & 16) != 0) { var b = u8(); while (b > 0) b = u8(); if (b < 0) return None } // FCOMMENT
    if ((flg & 2) != 0) { if (u8() < 0 || u8() < 0) return None } // FHCRC
    // ---- deflate body, raw inflater so we control the trailer ----
    val inf = new Inflater(true)
    val crc = new CRC32
    val outBuf = new java.io.ByteArrayOutputStream()
    val chunkIn = new Array[Byte](PushbackBytes)
    val chunkOut = new Array[Byte](1 << 16)
    var lastFed = 0 // byte count of the most recent setInput window
    try {
      while (!inf.finished()) {
        if (inf.needsInput()) {
          val n = in.read(chunkIn)
          if (n < 0) return None // truncated member
          consumed += n
          lastFed = n
          inf.setInput(chunkIn, 0, n)
        }
        val n = inf.inflate(chunkOut)
        if (n > 0) { outBuf.write(chunkOut, 0, n); crc.update(chunkOut, 0, n) }
        else if (inf.needsDictionary()) return None
      }
      // push back whatever the inflater over-read past the deflate body
      // (the unconsumed tail sits at the END of the last setInput window)
      // so the stream stands exactly at the trailer / next member
      val rem = inf.getRemaining
      if (rem > 0) {
        in.unread(chunkIn, lastFed - rem, rem)
        consumed -= rem
      }
      // ---- trailer: CRC32 + ISIZE (mod 2^32) ----
      val trailer = new Array[Byte](8)
      var got = 0
      while (got < 8) {
        val b = in.read(); if (b < 0) return None
        consumed += 1; trailer(got) = b.toByte; got += 1
      }
      if (le32(trailer, 0) != crc.getValue) return None
      if (le32(trailer, 4) != (outBuf.size().toLong & 0xffffffffL)) return None
      Some((outBuf.toByteArray, consumed))
    } finally inf.end()
  }

  /** Input chunk / pushback capacity: the inflater can over-read at most
    * one input chunk, so a pushback buffer of the same size always fits
    * the unconsumed tail. Small by design — over-read stays tiny, and
    * member decode throughput is output-side-bound anyway.
    */
  private val PushbackBytes = 512

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16) |
      ((b(p + 3) & 0xffL) << 24)

  private def readFully(in: java.io.InputStream, buf: Array[Byte]): Unit = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return
      off += n
    }
  }
}
