package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-sum over a bounded HISTOGRAM frame — the
  * band-partition + stitch form of the global cumulative window.
  *
  * The tick-histogram queries (revenue concentration, perplexity terciles,
  * token-budget cuts, vocabulary growth) all need a running sum over a
  * frame whose row count is bounded by a VALUE GRID, never the data volume
  * — correct under a single-partition window, but that shape is implicit
  * (Spark WARNs, and the bound lives in a comment, not the plan). Here the
  * scan is explicit and partition-parallel:
  *
  *  1. band the key by integer floor-division (order-preserving, so every
  *     row strictly before row r in key order is either in an earlier band
  *     or earlier inside r's own band);
  *  2. run the cumulative window PARTITIONED BY band (parallel, no global
  *     sort, no single-partition WARN);
  *  3. stitch: each band adds the TOTAL of every strictly-earlier band —
  *     a bands×bands broadcast range-join over the band-total frame,
  *     which is (key range / bandWidth)-sized by construction.
  *
  * Exact integer arithmetic — values are identical to the global-window
  * form (property-pinned in AggregatorsSpec against a sequential scan).
  * REQUIRES distinct keys (every call site aggregates `groupBy(key)`
  * first): with duplicate keys the in-band tie order would be
  * nondeterministic.
  */
object BandedScan {

  /** Append `out` = running sum of `value` over `key` order (long columns;
    * `desc` flips the direction, `includeCurrent` picks running-total vs
    * strictly-before semantics). `bandWidth` trades band count against
    * rows-per-band; any positive value is correct. */
  def cumSum(df: DataFrame, key: String, value: String, out: String,
      desc: Boolean = false, includeCurrent: Boolean = true,
      bandWidth: Long = 1000L): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    // integer `div` truncates toward zero — still monotone non-decreasing
    // in the key (negative keys share band 0's neighborhood, which only
    // widens a band, never reorders one), so banding preserves key order
    val banded = df.withColumn("__band", expr(s"$key div $bandWidth"))
    val inBand = Window.partitionBy("__band")
      .orderBy(if (desc) col(key).desc else col(key).asc)
      .rowsBetween(Window.unboundedPreceding,
        if (includeCurrent) Window.currentRow else -1)
    val tots = banded.groupBy(col("__band")).agg(sum(col(value)).as("__btot"))
    val earlier = if (desc) col("b.__band") > col("a.__band")
                  else col("b.__band") < col("a.__band")
    val prefix = tots.alias("a")
      .join(broadcast(tots.alias("b")), earlier, "left")
      .groupBy(col("a.__band").as("__band"))
      .agg(coalesce(sum(col("b.__btot")), lit(0L)).as("__bprefix"))
    banded.join(broadcast(prefix), "__band")
      .withColumn(out,
        col("__bprefix") + coalesce(sum(col(value)).over(inBand), lit(0L)))
      .drop("__band", "__bprefix")
  }
}
