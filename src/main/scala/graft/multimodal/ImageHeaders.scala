package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Header-level image dimension extraction — the honest metadata plane of
  * the multimodal pipeline: JPEG and PNG store their pixel dimensions in
  * the first few hundred bytes (PNG: the IHDR chunk is REQUIRED to be the
  * first chunk after the 8-byte signature; JPEG: a SOF0–SOF3 frame header
  * somewhere in the marker-segment chain), so a 100-TB image corpus plans
  * its resize/patch/batch geometry from a bounded byte-prefix read per
  * file — no codec, no pixel decode, pure byte arithmetic over PUBLIC
  * formats (PNG: RFC 2083 §4.1.1; JPEG: ITU-T T.81 §B.2.2).
  *
  * Everything compiles to Catalyst expressions (`substr`/`hex`/`conv`),
  * i.e. codegen'd projections over the binary column: at scale this is a
  * linear scan of header prefixes, shuffles nothing, and the output dims
  * columns are what the scheduling/packing stages key on.
  */
object ImageHeaders {

  /** Big-endian unsigned int read: `len` bytes of `b` starting at the
    * 1-indexed byte position `pos` (a column — JPEG scanning needs a
    * data-dependent offset). hex→conv keeps it pure-expression. */
  private def beAt(b: Column, pos: Column, len: Int): Column =
    conv(hex(b.substr(pos, lit(len))), 16, 10).cast("int")

  private val PngSig = "89504E470D0A1A0A" // \x89PNG\r\n\x1a\n

  /** PNG: signature bytes 1-8, IHDR length bytes 9-12, "IHDR" 13-16,
    * width 17-20, height 21-24 (both 4-byte big-endian). IHDR-first is
    * mandated by the spec, so fixed offsets are format-correct. */
  private def isPng(b: Column): Column =
    hex(b.substr(lit(1), lit(8))) === PngSig

  /** JPEG marker-segment scan: after the 2-byte SOI, each segment is
    * marker(2) + length(2, big-endian, INCLUDING the length field) +
    * payload. Dimensions live in the first SOF frame header
    * (FFC0–FFC3: baseline/extended/progressive/lossless): precision(1),
    * height(2), width(2) after the length. The scan hops segment to
    * segment — it must, because APP/COM segments are variable-length —
    * unrolled to `maxSegments` CHAINED projections (each hop references
    * the previous position attribute once, so the plan stays linear, the
    * k-references-per-round tree blowup the graph fixpoints document).
    * Real camera JPEGs front-load EXIF/APPn segments; production raises
    * maxSegments (each hop is three byte-reads — still a prefix read). */
  private val SofMarkers = Seq("FFC0", "FFC1", "FFC2", "FFC3")

  /** Append `fmt`/`width`/`height` columns parsed from the binary column
    * `bin`. Unknown payloads (neither signature, or no SOF within the
    * scan budget) yield NULL dims — the caller's quarantine signal. */
  def withImageDims(df: DataFrame, bin: String, maxSegments: Int = 6): DataFrame = {
    val b = col(bin)
    val isJpeg = hex(b.substr(lit(1), lit(2))) === "FFD8"
    // chained hops: __p1 is the first marker; __p(k+1) freezes once the
    // marker at __pk is a SOF, else skips the segment
    val hopped = (1 until maxSegments).foldLeft(
      df.withColumn("__p1", lit(3))) { (acc, k) =>
      val p = col(s"__p$k")
      val mk = hex(b.substr(p, lit(2)))
      acc.withColumn(s"__p${k + 1}",
        when(mk.isin(SofMarkers: _*), p)
          .otherwise(p + 2 + beAt(b, p + 2, 2)))
    }
    val pf = col(s"__p$maxSegments")
    val sofFound = hex(b.substr(pf, lit(2))).isin(SofMarkers: _*)
    val out = hopped
      .withColumn("fmt",
        when(isPng(b), "png").when(isJpeg, "jpeg")
          .otherwise(lit(null).cast("string")))
      .withColumn("width",
        when(isPng(b), beAt(b, lit(17), 4))
          .when(isJpeg && sofFound, beAt(b, pf + 7, 2))
          .otherwise(lit(null).cast("int")))
      .withColumn("height",
        when(isPng(b), beAt(b, lit(21), 4))
          .when(isJpeg && sofFound, beAt(b, pf + 5, 2))
          .otherwise(lit(null).cast("int")))
    (1 to maxSegments).foldLeft(out)((acc, k) => acc.drop(s"__p$k"))
  }

  /** Deterministic fake image corpus over a doc_id column: REAL header
    * byte layouts (PNG signature + IHDR; JPEG SOI + APP0/JFIF + a
    * VARIABLE-length COM segment + SOF0) around formula dims
    * width = doc_id·7 mod 624 + 16, height = doc_id·5 mod 464 + 16,
    * with md5-derived filler where pixel data would sit. The COM padding
    * (doc_id mod 7 bytes) varies per doc so the parser provably SCANS
    * the segment chain rather than assuming fixed offsets. The container
    * ships no codecs, so synthesized-but-format-true bytes are what
    * makes the parse honest: the parser sees only the binary column, and
    * the oracle recomputes dims from the stored doc_id metadata. */
  def fakeImagePayload(docId: Column): Column = {
    def hx(c: Column, digits: Int): Column = lpad(hex(c), digits, "0")
    val w = (docId * 7 % 624 + 16).cast("int")
    val h = (docId * 5 % 464 + 16).cast("int")
    val pad = (docId % 7).cast("int")
    val pngHex = concat(
      lit(PngSig),
      lit("0000000D"), lit("49484452"), // IHDR length 13 + type
      hx(w, 8), hx(h, 8),
      lit("0806000000"), // bit depth 8, RGBA, deflate, adaptive, no interlace
      upper(substring(md5(concat(lit("crc:"), docId)), 1, 8)), // CRC slot
      upper(substring(md5(concat(lit("idat:"), docId)), 1, 16)))
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFE000104A46494600010100000100010000"), // APP0/JFIF, 16 bytes
      lit("FFFE"), hx(pad + 2, 4), repeat(lit("41"), pad), // COM, variable
      lit("FFC00011"), lit("08"), hx(h, 4), hx(w, 4), // SOF0: p, h, w
      lit("03011100021101031101"), // 3 components
      lit("FFDA"), upper(substring(md5(concat(lit("scan:"), docId)), 1, 16)))
    unhex(when(docId % 2 === 0, pngHex).otherwise(jpegHex))
  }
}
