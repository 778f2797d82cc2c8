package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level JPEG SOF / PNG IHDR header parse — the kernel behind the
  * `image_fmt`/`image_width`/`image_height` Catalyst expressions
  * (org.apache.spark.sql.graftexpr.ImageExpressions).
  *
  * WHY a kernel and not the substr/hex/conv expression chain: the chained
  * marker-hop projection (`__p1..__p6`, each hop referencing the previous
  * position ~4×) is safe as long as it stays a chain of Projects — but any
  * predicate on the derived dims gets pushed through that chain by
  * `PushPredicateThroughNonJoin`, which SUBSTITUTES each alias into the
  * condition: the filter condition grows ~4^hops copies of the hop tree
  * (mm_patch_grid's `w > 0 && h > 0` produced a ~200 KB Filter condition,
  * janino refused to compile it, and the interpreted fallback measured
  * 5.5 s at sf0.1 vs 0.04 s for the filter-less siblings). One static
  * call per column is duplication-proof: pushdown copies a bounded
  * ~60-byte scan, not an expression tree.
  *
  * Semantics mirror the public formats exactly as the former expression
  * chain read them (PNG: RFC 2083 §4.1.1 fixed IHDR offsets after the
  * 8-byte signature; JPEG: ITU-T T.81 §B.2.2 marker-segment hops from
  * SOI to the first SOF0–SOF3), with `null` for unknown signatures,
  * truncated reads, or no SOF within the hop budget — the caller's
  * quarantine signal, pinned by MultimodalSpec's fixture test.
  */
object ImageHeaderKernel {

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && java.util.Arrays.equals(b, 0, 8, PngSig, 0, 8)

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8

  /** Big-endian unsigned read of `len` bytes at 0-indexed `pos`; -1 when
    * the read would run past the end (the quarantine signal). */
  private def be(b: Array[Byte], pos: Int, len: Int): Long = {
    if (pos < 0 || pos + len > b.length) return -1L
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(pos + i) & 0xFFL); i += 1 }
    v
  }

  private def isSofMarker(b: Array[Byte], pos: Int): Boolean =
    pos + 2 <= b.length && (b(pos) & 0xFF) == 0xFF && {
      val m = b(pos + 1) & 0xFF; m >= 0xC0 && m <= 0xC3
    }

  /** 0-indexed position of the first SOF0–SOF3 marker reachable within
    * `maxSegments` chained hops from SOI, or -1. Matches the former
    * `__p1..__pN` projection chain: position starts right after SOI and
    * hops marker(2)+length(2 BE, length includes itself). */
  private def sofPos(b: Array[Byte], maxSegments: Int): Int = {
    var pos = 2 // after SOI (the chain's 1-indexed __p1 = 3)
    var k = 1
    while (k < maxSegments && !isSofMarker(b, pos)) {
      val segLen = be(b, pos + 2, 2)
      if (segLen < 0) return -1
      pos = pos + 2 + segLen.toInt
      k += 1
    }
    if (isSofMarker(b, pos)) pos else -1
  }

  /** "png" / "jpeg" / null by signature. */
  def fmt(b: Array[Byte]): UTF8String =
    if (isPng(b)) UTF8String.fromString("png")
    else if (isJpeg(b)) UTF8String.fromString("jpeg")
    else null

  private def boxed(v: Long): Integer =
    if (v < 0 || v > Int.MaxValue) null else Integer.valueOf(v.toInt)

  /** Pixel width, or null (unknown format / truncated / no SOF in budget).
    * PNG: IHDR width at bytes 16-19; JPEG: 2 bytes at SOF+7 (after
    * marker(2) + length(2) + precision(1) + height(2)). */
  def width(b: Array[Byte], maxSegments: Int): Integer =
    if (isPng(b)) boxed(be(b, 16, 4))
    else if (isJpeg(b)) {
      val p = sofPos(b, maxSegments)
      if (p < 0) null else boxed(be(b, p + 7, 2))
    } else null

  /** Pixel height — PNG IHDR bytes 20-23; JPEG 2 bytes at SOF+5. */
  def height(b: Array[Byte], maxSegments: Int): Integer =
    if (isPng(b)) boxed(be(b, 20, 4))
    else if (isJpeg(b)) {
      val p = sofPos(b, maxSegments)
      if (p < 0) null else boxed(be(b, p + 5, 2))
    } else null
}
