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
      Encoders.tuple(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
        Encoders.scalaLong)
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

  /** Partial top-k per group: buffer holds at most k (score, id) pairs,
    * ordered by (score desc, id desc). The window form
    * (`row_number() over (partition by g order by …) <= k`) must shuffle
    * and fully sort EVERY row of every group; this aggregator reduces each
    * map partition to ≤ k rows per group before the shuffle — at 100 TB
    * with millions of rows per hot key, that's the difference between
    * shuffling the table and shuffling k·|groups| rows. Merge is a bounded
    * sorted-list union: associative, commutative, deterministic (total
    * order via the id tie-break), hence safe as a partial aggregate.
    */
  class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

    private val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long.reverse)

    override def zero: List[(Double, Long)] = Nil

    override def reduce(buf: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] =
      if (buf.sizeIs >= k && ord.gteq(v, buf.last)) buf // below the bar: skip
      else ((v :: buf).sorted(ord)).take(k)

    override def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] =
      (x ++ y).sorted(ord).take(k)

    override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }
}
