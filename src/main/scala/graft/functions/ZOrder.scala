package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key — the clustering kernel behind a
  * multi-dimensional OPTIMIZE pass: interleaving the bits of two
  * dimensions gives a single sort key under which a range predicate on
  * EITHER dimension touches a bounded fraction of the layout, which is
  * what lets file/row-group min-max statistics prune scans on both
  * columns at once (a single-column sort prunes only its own column).
  *
  * Built from codegen'd bit built-ins only (shift/and/or unrolled over
  * the bit width — a static expression tree, no UDF), so the key
  * computation rides whole-stage codegen inside the rewrite job.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral columns
    * (x in even positions, y in odd). 21 bits each fills 42 bits of the
    * Long — room for dimension cardinalities to ~2M; raise toward 31 for
    * bigger ids (62 bits used). Values must be non-negative (ids/keys);
    * negative inputs would need a zigzag remap first. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftrightunsigned(xl, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftrightunsigned(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }
}
