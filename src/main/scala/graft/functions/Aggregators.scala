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

  /** Catalyst Round(HALF_UP)-exact double→long rounding, branch-free of
    * BigDecimal: halves are binary-representable (up to 2^52), so the
    * decimal-rendering detour Catalyst's Round takes never changes the
    * outcome, and the one real hazard — the float ADDITION y±0.5 rounding
    * across an integer boundary (y = nextDown(0.5) + 0.5 == 1.0) — is
    * repaired by the exact c∓0.5 comparison (c±0.5 is exact for |c|<2^52).
    * AggregatorsSpec pins equality with Spark's round() on the boundary
    * doubles and on random products. */
  @inline private[graft] def roundHalfUp(y: Double): Long =
    if (y >= 0) {
      val c = math.floor(y + 0.5)
      (if (c - 0.5 > y) c - 1 else c).toLong
    } else {
      val c = math.ceil(y - 0.5)
      (if (c + 0.5 < y) c + 1 else c).toLong
    }

  /** One-pass second-moment matrix over Array[Double] vectors — the PCA
    * covariance corpus pass (SURVEY §2 K2 extensibility surface). Buffer =
    * dim² longs of 1e-8-grid-snapped product sums; reduce multiply-
    * accumulates in place, so the dim²·N product rows of the
    * posexplode×posexplode form never exist as rows and the shuffle
    * carries ONE dim²-long buffer per map partition (map-side combine at
    * any scale — measured 3.3 s → 0.4 s on the sf0.1 covariance pass).
    * Each product snaps to the grid BEFORE the long sum (order-invariant),
    * with [[roundHalfUp]] replicating the generate form's round() exactly. */
  class SecondMomentAggregator(dim: Int)
      extends Aggregator[Array[Double], Array[Long], Array[Long]] {

    override def zero: Array[Long] = new Array[Long](dim * dim)

    override def reduce(b: Array[Long], v: Array[Double]): Array[Long] = {
      var i = 0
      while (i < dim) {
        val xi = v(i)
        val off = i * dim
        var j = 0
        while (j < dim) { b(off + j) += roundHalfUp(xi * v(j) * 1e8); j += 1 }
        i += 1
      }
      b
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
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

  /** Weighted Misra–Gries heavy-hitter summary (Misra & Gries 1982;
    * mergeable form per Agarwal et al., "Mergeable Summaries", PODS'12).
    * Buffer = at most `k` (item, count) entries; overflow subtracts the
    * (k+1)-th largest count from every entry and drops the non-positive
    * ones. Invariant: for every item x, trueCount(x) − buffer(x) ≤
    * N/(k+1), so every item with true frequency > N/(k+1) is GUARANTEED
    * to survive in the candidate set — the merge (sum maps, re-cap)
    * preserves the bound, which is what makes the sketch safe as a
    * partial aggregate. The sketch alone over-approximates; the graded
    * d13 plan restores exactness with a second bounded pass (exact counts
    * of the ≤ k candidates), so sketch cost finds candidates and one
    * semi-join pass makes the answer exact — the standard two-pass
    * heavy-hitter shape at corpus scale.
    */
  class MisraGriesAggregator(k: Int)
      extends Aggregator[(String, Long), Map[String, Long], Seq[String]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], v: (String, Long)): Map[String, Long] =
      cap(b.updated(v._1, b.getOrElse(v._1, 0L) + v._2))

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      cap(y.foldLeft(x) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) })

    private def cap(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // (k+1)-th largest count; subtracting it zeroes at least one entry
        val cut = m.valuesIterator.toArray.sorted(Ordering.Long.reverse).apply(k)
        m.collect { case (t, c) if c - cut > 0 => t -> (c - cut) }
      }

    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
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

  /** Partial top-k for the ANN rankers: keeps the k SMALLEST rows under
    * (key asc, id asc), each carrying one payload double. Callers ranking
    * descending pass `0.0 - score` as the key (the `0.0 -` form also folds
    * IEEE −0.0 back to +0.0, so a zero score can never order differently
    * from the SQL window it replaces). This is the scale fix for the
    * corpus-sized `row_number() over (partition by query_id)` windows: a
    * window sends EVERY scored row of a query to one reducer and sorts N
    * there, while this aggregator reduces each map partition to ≤ k rows
    * per query before the shuffle — the same partial+final shape as
    * TopKAggregator/f3, with the tie order and payload slot the ANN
    * queries need. */
  class TopKAscAggregator(k: Int)
      extends Aggregator[(Double, Long, Double), List[(Double, Long, Double)],
        Seq[(Double, Long, Double)]] {

    private val ord: Ordering[(Double, Long, Double)] =
      Ordering.by((t: (Double, Long, Double)) => (t._1, t._2))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

    override def zero: List[(Double, Long, Double)] = Nil

    override def reduce(buf: List[(Double, Long, Double)],
        v: (Double, Long, Double)): List[(Double, Long, Double)] =
      if (buf.sizeIs >= k && ord.gteq(v, buf.last)) buf // below the bar: skip
      else ((v :: buf).sorted(ord)).take(k)

    override def merge(x: List[(Double, Long, Double)],
        y: List[(Double, Long, Double)]): List[(Double, Long, Double)] =
      (x ++ y).sorted(ord).take(k)

    override def finish(buf: List[(Double, Long, Double)]): Seq[(Double, Long, Double)] = buf

    override def bufferEncoder: Encoder[List[(Double, Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long, Double)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Double)]]()
  }
}
