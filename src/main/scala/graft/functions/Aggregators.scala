package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (SURVEY.md §2 K2) — the extensibility surface
  * for aggregations Spark's built-ins don't cover. Both are associative and
  * commutative with a cheap merge, so they stay partial+final aggregable
  * (map-side combine) at any scale.
  */
object Aggregators {

  /** Mean vector over Array[Float] embeddings (the typed form of the
    * J4 centroid query). Buffer = (running sums, count). */
  class CentroidAggregator(dim: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      val (sums, n) = b
      var i = 0
      while (i < dim) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }

    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      val (sx, nx) = x; val (sy, ny) = y
      var i = 0
      while (i < dim) { sx(i) += sy(i); i += 1 }
      (sx, nx + ny)
    }

    override def finish(b: (Array[Double], Long)): Array[Double] = {
      val (sums, n) = b
      if (n == 0) sums else sums.map(_ / n)
    }

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** MinHash signature as a typed aggregator over shingle hashes: buffer is
    * the running elementwise minimum of the k affine hashes — merge is
    * elementwise min, the canonical mergeable sketch. */
  class MinHashAggregator(a: Array[Long], b: Array[Long], p: Long)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val k = a.length

    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < k) {
        val v = (h * a(i) + b(i)) % p
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
