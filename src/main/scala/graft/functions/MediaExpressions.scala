package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real container-header parsing for multimodal binary columns — pure byte
  * arithmetic over the payload, no codec library. Four container families,
  * detected by magic bytes (the `modality` column is NOT consulted — a
  * mislabeled row parses by what it actually is):
  *
  *  - PNG  (spec: PNG 2nd ed., 5.2/11.2.2): 8-byte signature, then chunk
  *    walk `[len u32be][type 4cc][body][crc]` until `IHDR`; width/height
  *    are the first two u32be of the IHDR body.
  *  - JPEG (ITU-T T.81 B.2): `FFD8`, then marker-segment walk (skipping
  *    fill bytes and standalone markers) until a frame header SOFn
  *    (C0-CF minus C4/C8/CC); height/width are u16be at body+1/+3.
  *  - GIF  (87a/89a): 6-byte signature, then the logical screen
  *    descriptor — width/height u16le at 6/8.
  *  - BMP  (`BM`): DIB header size at 14 selects the layout —
  *    BITMAPCOREHEADER (12; u16 dims) vs the INFO family (≥40; i32le
  *    dims, top-down negative height reported as magnitude).
  *  - WAV  (RIFF): `RIFF....WAVE`, then chunk walk `[4cc][len u32le][body]`
  *    (word-aligned) until `fmt `; sample rate is u32le at body+4, byte
  *    rate at body+8; the walk continues to the `data` chunk, whose
  *    declared length over the byte rate gives `duration_ms`.
  *  - AVI  (RIFF): `RIFF....AVI `, then `LIST....hdrl`, then the `avih`
  *    MainAVIHeader: dwMicroSecPerFrame at body+0, dwTotalFrames at
  *    body+16, dwWidth/dwHeight at body+32/+36, all u32le;
  *    `duration_ms` = µs/frame × frames / 1000.
  *  - FLAC (format spec §STREAMINFO): `fLaC` magic, then the metadata
  *    block walk to STREAMINFO; sample rate (20 bits) and total
  *    samples (36 bits) unpack from the bit-packed info block →
  *    `duration_ms` exactly.
  *  - MP3  (MPEG-1/2/2.5 audio): optional ID3v2 tag (syncsafe length)
  *    skipped, then a corroborated frame-sync header — version, layer
  *    III, bitrate and sample-rate indexes must all be valid; duration
  *    is the standard CBR estimate (remaining bytes over the header
  *    bitrate).
  *  - MP4  (ISO/IEC 14496-12 ISO-BMFF): detected by the `ftyp` box at
  *    offset 4; generic box walk `[size u32be][type 4cc]` with the two
  *    spec escapes (size==1 → 64-bit largesize follows the type;
  *    size==0 → box runs to end of payload). Top level walks to `moov`;
  *    inside it `mvhd` (version 0 or 1) yields timescale+duration →
  *    `duration_ms`, and the first `trak`→`tkhd` (v0/v1) with a nonzero
  *    width yields width/height (stored as 16.16 fixed point — the
  *    integer part is reported).
  *
  * Unrecognized/truncated payloads return NULL (not an error): at corpus
  * scale a decode-meta pass is a filter/profiler and must not abort on the
  * malformed tail of a crawl.
  */
object MediaParseUtil {

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def le32(b: Array[Byte], p: Int): Long =
    ((b(p + 3) & 0xffL) << 24) | ((b(p + 2) & 0xffL) << 16) |
      ((b(p + 1) & 0xffL) << 8) | (b(p) & 0xffL)

  private def le16(b: Array[Byte], p: Int): Int =
    ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)

  private def fourcc(b: Array[Byte], p: Int, s: String): Boolean =
    b(p) == s.charAt(0).toByte && b(p + 1) == s.charAt(1).toByte &&
      b(p + 2) == s.charAt(2).toByte && b(p + 3) == s.charAt(3).toByte

  private def be64(b: Array[Byte], p: Int): Long =
    (be32(b, p) << 32) | be32(b, p + 4)

  private def row(format: String, w: Long, h: Long, rate: Long, frames: Long,
      durMs: Long = -1): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format),
      if (w < 0) null else w.toInt,
      if (h < 0) null else h.toInt,
      if (rate < 0) null else rate.toInt,
      if (frames < 0) null else frames.toInt,
      if (durMs < 0 || durMs > Int.MaxValue) null else durMs.toInt,
    ))

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Walk the container and extract metadata; null when unrecognized. */
  def parse(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    // ---- PNG: signature + IHDR chunk walk ----
    // cursor arithmetic in Long: a malformed 32-bit declared length near
    // 0xFFFFFFFF would wrap an Int cursor to 0 (infinite loop) or negative
    // (index crash) — the null-on-malformed contract forbids both
    if (n >= 8 && bytes.take(8).sameElements(PngSig)) {
      var p = 8L
      while (p + 8 <= n) {
        val pi = p.toInt
        val clen = be32(bytes, pi)
        if (fourcc(bytes, pi + 4, "IHDR") && clen >= 13 && p + 16 <= n)
          return row("png", be32(bytes, pi + 8), be32(bytes, pi + 12), -1, -1)
        p += 12L + clen // len + type + body + crc
      }
      return null
    }
    // ---- JPEG: marker-segment walk to SOFn ----
    if (n >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var p = 2
      while (p + 1 < n) {
        if ((bytes(p) & 0xff) != 0xff) return null // desynchronized
        var m = bytes(p + 1) & 0xff
        while (m == 0xff && p + 2 < n) { p += 1; m = bytes(p + 1) & 0xff } // fill bytes
        if (m == 0xd9 || m == 0xda) return null // EOI / SOS before any SOF
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) p += 2 // standalone
        else {
          if (p + 4 > n) return null
          val seglen = be16(bytes, p + 2)
          val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sof) {
            if (seglen < 7 || p + 9 > n) return null
            return row("jpeg", be16(bytes, p + 7).toLong, be16(bytes, p + 5).toLong, -1, -1)
          }
          if (seglen < 2) return null
          p += 2 + seglen
        }
      }
      return null
    }
    // ---- GIF (87a/89a): logical screen descriptor right after the
    // 6-byte signature — width/height u16le at 6/8 ----
    if (n >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      return row("gif", le16(bytes, 6).toLong, le16(bytes, 8).toLong, -1, -1)
    // ---- BMP: "BM" file header, then the DIB header whose declared size
    // picks the layout — BITMAPCOREHEADER (12: u16 dims at 18/20) vs the
    // INFO family (>=40: i32le dims at 18/22, height negative for
    // top-down rows — report magnitude). A 2-byte magic alone would
    // false-positive on arbitrary "BM…" blobs, so the mandatory
    // structure corroborates: reserved bytes 6-9 are zero and the
    // planes field is 1 in every valid BMP ----
    if (n >= 26 && bytes(0) == 'B' && bytes(1) == 'M' && le32(bytes, 6) == 0L) {
      val dib = le32(bytes, 14)
      if (dib == 12L && le16(bytes, 22) == 1) {
        val w = le16(bytes, 18); val h = le16(bytes, 20)
        if (w > 0 && h > 0) return row("bmp", w.toLong, h.toLong, -1, -1)
      }
      if (dib >= 40L && n >= 28 && le16(bytes, 26) == 1) {
        val w = le32(bytes, 18).toInt // i32: reinterpret the le32 bits
        val h = le32(bytes, 22).toInt
        // Int.MinValue has no positive magnitude in i32 — malformed
        if (w > 0 && h != 0 && h != Int.MinValue)
          return row("bmp", w.toLong, math.abs(h.toLong), -1, -1)
      }
      return null
    }
    // ---- RIFF containers: WAV and AVI ----
    if (n >= 12 && fourcc(bytes, 0, "RIFF")) {
      if (fourcc(bytes, 8, "WAVE")) {
        var p = 12L // Long cursor: see the PNG walk
        var rate = -1L; var byteRate = -1L; var dataLen = -1L
        while (p + 8 <= n && (rate < 0 || dataLen < 0)) {
          val pi = p.toInt
          val csz = le32(bytes, pi + 4)
          if (fourcc(bytes, pi, "fmt ") && csz >= 12 && p + 20 <= n) {
            rate = le32(bytes, pi + 12)
            byteRate = le32(bytes, pi + 16)
          } else if (fourcc(bytes, pi, "data")) {
            // the declared length is the payload's own claim — a
            // truncated crawl row may carry fewer actual bytes; the
            // header is still what a player would compute duration from
            dataLen = csz
          }
          p += 8L + csz + (csz & 1) // chunks are word-aligned
        }
        if (rate < 0) return null
        val durMs =
          if (dataLen >= 0 && byteRate > 0) dataLen * 1000L / byteRate else -1L
        return row("wav", -1, -1, rate, -1, durMs)
      }
      if (fourcc(bytes, 8, "AVI ")) {
        var p = 12L // Long cursor: see the PNG walk
        while (p + 12 <= n) {
          val pi = p.toInt
          val csz = le32(bytes, pi + 4)
          if (fourcc(bytes, pi, "LIST") && fourcc(bytes, pi + 8, "hdrl")) {
            // walk inside the hdrl list for the avih MainAVIHeader
            var q = p + 12
            val end = math.min(n.toLong, p + 8 + csz)
            while (q + 8 <= end) {
              val qi = q.toInt
              val hsz = le32(bytes, qi + 4)
              if (fourcc(bytes, qi, "avih") && hsz >= 40 && q + 48 <= n) {
                val usPerFrame = le32(bytes, qi + 8)
                val frames = le32(bytes, qi + 24)
                // two u32 fields: the product can reach 2^64 and wrap to a
                // plausible positive, bypassing row()'s range guard — an
                // adversarial payload must yield NULL, not a wrong duration
                val durMs =
                  if (usPerFrame > 0 && frames >= 0 &&
                    (frames == 0 || usPerFrame <= Long.MaxValue / frames))
                    usPerFrame * frames / 1000L
                  else -1L
                return row("avi", le32(bytes, qi + 40), le32(bytes, qi + 44),
                  -1, frames, durMs)
              }
              q += 8L + hsz + (hsz & 1)
            }
            return null
          }
          p += 8L + csz + (csz & 1)
        }
        return null
      }
    }
    // ---- FLAC: "fLaC" magic + STREAMINFO metadata block walk ----
    // block header: [last(1)+type(7)][len u24be]; STREAMINFO (type 0)
    // packs sample rate (20 bits), channels-1 (3), bps-1 (5), total
    // samples (36) at body bytes 10..17; duration = samples / rate.
    if (n >= 4 && fourcc(bytes, 0, "fLaC")) {
      var p = 4L
      while (p + 4 <= n) {
        val pi = p.toInt
        val btype = bytes(pi) & 0x7f
        val blen = ((bytes(pi + 1) & 0xffL) << 16) |
          ((bytes(pi + 2) & 0xffL) << 8) | (bytes(pi + 3) & 0xffL)
        if (btype == 0) {
          if (blen < 34 || p + 4 + 18 > n) return null
          val b = pi + 4
          val sr = ((bytes(b + 10) & 0xffL) << 12) | ((bytes(b + 11) & 0xffL) << 4) |
            ((bytes(b + 12) & 0xff) >> 4)
          val samples = ((bytes(b + 13) & 0x0fL) << 32) | be32(bytes, b + 14)
          if (sr <= 0) return null
          return row("flac", -1, -1, sr, -1, samples * 1000L / sr)
        }
        if ((bytes(pi) & 0x80) != 0) return null // last block, no STREAMINFO
        p += 4L + blen
      }
      return null
    }
    // ---- MP3: optional ID3v2 tag, then an MPEG audio frame header ----
    // corroborated sync: 11 set sync bits AND valid version/layer/
    // bitrate/samplerate fields — a text blob starting 0xFF Ex rarely
    // satisfies all four. Duration is the CBR estimate (remaining bytes
    // over the header bitrate), the standard header-only approximation.
    locally {
      var off = 0L
      if (n >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        // syncsafe u28 tag size at 6..9 (7 bits per byte)
        val sz = ((bytes(6) & 0x7fL) << 21) | ((bytes(7) & 0x7fL) << 14) |
          ((bytes(8) & 0x7fL) << 7) | (bytes(9) & 0x7fL)
        off = 10L + sz
      }
      if (off + 4 <= n && (off > 0 || (n >= 2 && (bytes(0) & 0xff) == 0xff))) {
        val oi = off.toInt
        if ((bytes(oi) & 0xff) == 0xff && (bytes(oi + 1) & 0xe0) == 0xe0) {
          val ver = (bytes(oi + 1) >> 3) & 3   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
          val layer = (bytes(oi + 1) >> 1) & 3 // 1 = Layer III
          val brIdx = (bytes(oi + 2) & 0xff) >> 4
          val srIdx = (bytes(oi + 2) >> 2) & 3
          if (ver != 1 && layer == 1 && brIdx >= 1 && brIdx <= 14 && srIdx != 3) {
            val kbps =
              if (ver == 3) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
              else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
            val sr =
              if (ver == 3) Array(44100, 48000, 32000)(srIdx)
              else if (ver == 2) Array(22050, 24000, 16000)(srIdx)
              else Array(11025, 12000, 8000)(srIdx)
            val durMs = (n - off) * 8L * 1000L / (kbps * 1000L)
            return row("mp3", -1, -1, sr, -1, durMs)
          }
        }
      }
    }
    // ---- MP4 / ISO-BMFF: generic box walk (ISO/IEC 14496-12 §4.2) ----
    // detected by the mandatory first-box `ftyp`; box = [size u32be]
    // [type 4cc], size==1 → u64 largesize follows the type, size==0 →
    // the box extends to the end of the payload.
    if (n >= 12 && fourcc(bytes, 4, "ftyp") && be32(bytes, 0) >= 8) {
      // resolve one box header at p: (payload start, box end) or null
      def box(p: Long, end: Long): Array[Long] = {
        if (p + 8 > end) return null
        val pi = p.toInt
        val s32 = be32(bytes, pi)
        if (s32 == 1L) {
          if (p + 16 > end) return null
          val s64 = be64(bytes, pi + 8)
          if (s64 < 16 || p + s64 > end) return null
          Array(p + 16, p + s64)
        } else if (s32 == 0L) {
          Array(p + 8, end) // last box: runs to the end
        } else {
          if (s32 < 8 || p + s32 > end) return null
          Array(p + 8, p + s32)
        }
      }
      var w = -1L; var h = -1L; var durMs = -1L
      var p = 0L
      while (p + 8 <= n) {
        val pi = p.toInt
        val b = box(p, n.toLong)
        if (b == null) return if (durMs >= 0 || w >= 0) row("mp4", w, h, -1, -1, durMs) else null
        if (fourcc(bytes, pi + 4, "moov")) {
          var q = b(0)
          while (q + 8 <= b(1)) {
            val qi = q.toInt
            val c = box(q, b(1))
            if (c == null) return row("mp4", w, h, -1, -1, durMs)
            if (fourcc(bytes, qi + 4, "mvhd") && durMs < 0) {
              val body = c(0).toInt
              val v = bytes(body) & 0xff
              if (v == 0 && c(0) + 20 <= c(1)) {
                val ts = be32(bytes, body + 12); val d = be32(bytes, body + 16)
                if (ts > 0) durMs = d * 1000L / ts
              } else if (v == 1 && c(0) + 32 <= c(1)) {
                val ts = be32(bytes, body + 20); val d = be64(bytes, body + 24)
                // d is a u64 read: d*1000 can wrap past Long.MaxValue to a
                // plausible positive — bound it before multiplying (any real
                // duration is far below Long.MaxValue/1000 ticks)
                if (ts > 0 && d >= 0 && d <= Long.MaxValue / 1000L)
                  durMs = d * 1000L / ts
              }
            }
            if (fourcc(bytes, qi + 4, "trak") && w < 0) {
              // walk the trak's children for tkhd
              var r = c(0)
              while (r + 8 <= c(1) && w < 0) {
                val ri = r.toInt
                val t = box(r, c(1))
                if (t == null) return row("mp4", w, h, -1, -1, durMs)
                if (fourcc(bytes, ri + 4, "tkhd")) {
                  val body = t(0).toInt
                  val v = bytes(body) & 0xff
                  // width/height are 16.16 fixed point at body+76 (v0)
                  // or body+88 (v1); audio traks carry zeros — skip them
                  val off = if (v == 1) 88 else 76
                  if (t(0) + off + 8 <= t(1)) {
                    val tw = be32(bytes, body + off) >> 16
                    val th = be32(bytes, body + off + 4) >> 16
                    if (tw > 0 && th > 0) { w = tw; h = th }
                  }
                }
                r = t(1)
              }
            }
            q = c(1)
          }
          return row("mp4", w, h, -1, -1, durMs)
        }
        p = b(1)
      }
      return null
    }
    null
  }
}

/** `media_meta(payload)` — parse a binary media payload's container header
  * into `struct<format, width, height, sample_rate, n_frames, duration_ms>`
  * (NULL when
  * no container is recognized). Runs inside whole-stage codegen as a
  * static call per row: a decode-meta pass over 100 TB stays a pure
  * scan-side projection with no shuffle and no external codec.
  */
case class MediaMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaMeta.schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_meta requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MediaParseUtil.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaParseUtil.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MediaMeta =
    copy(child = newChild)

  override def prettyName: String = "media_meta"
}

object MediaMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", IntegerType),
  ))
}
