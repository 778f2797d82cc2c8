package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic numeric kernels for oracle-hash-stable results.
  *
  * Two cross-engine hazards (SURVEY.md §7.4 risk #1):
  *
  *  1. `sum(double)` is order-dependent in the low bits → differs between
  *     Spark partitionings and DuckDB.
  *  2. `round(x, n)` semantics differ: Spark rounds the exact decimal
  *     expansion of the double (BigDecimal HALF_UP), DuckDB scales and
  *     rounds — they can disagree within 1 ulp of a tie.
  *
  * Fix for both: operate on scaled integers. The measure columns in the test
  * data carry at most 2 decimal digits (verified against the fixtures), so
  * `round(x*100)` recovers the exact integer cents in either engine from the
  * same IEEE double. Integer sums are associative → identical under any
  * partitioning, engine, or degree of parallelism. Final descale is a single
  * deterministic division.
  *
  * 100-TB notes: scaled sums remain partial+final hash aggregates (map-side
  * combine intact); Long headroom is ~9.2e18 ≈ 1e13 max-priced lineitems per
  * group; nothing here adds a shuffle or breaks whole-stage codegen (all
  * expressions are built-ins).
  */
object ExactNum {
  /** Exact integer cents of a <=2-decimal double. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact integer 1e-4 units of a <=4-decimal value. */
  def tenK(c: Column): Column = round(c * 10000).cast("long")

  /** Cross-engine-stable round to 4 decimals (scaled-integer route). */
  def round4(c: Column): Column = round(c * 10000).cast("long") / 10000.0

  /** Cross-engine-stable round to 6 decimals. */
  def round6(c: Column): Column = round(c * 1000000).cast("long") / 1000000.0

  /** Deterministic sum of a 2-decimal column (exact multiple of 0.01). */
  def sum2(c: Column): Column = sum(cents(c)) / 100.0

  /** Deterministic sum of a <=4-decimal expression. */
  def sum4(c: Column): Column = sum(tenK(c)) / 10000.0

  /** Deterministic avg of a 2-decimal column, rounded to 4 places. */
  def avg2(c: Column): Column = round4(sum(cents(c)) / 100.0 / count(lit(1)))

  // DuckDB oracle mirrors of the same kernels (string templates).
  /** SQL: exact sum of 2-decimal column x. */
  def sqlSum2(x: String): String =
    s"CAST(sum(CAST(round(($x)*100) AS BIGINT)) AS BIGINT)/100.0"

  /** SQL: exact sum of <=4-decimal expression x. */
  def sqlSum4(x: String): String =
    s"CAST(sum(CAST(round(($x)*10000) AS BIGINT)) AS BIGINT)/10000.0"

  /** SQL: stable round-to-4 of expression x. */
  def sqlRound4(x: String): String =
    s"CAST(round(($x)*10000) AS BIGINT)/10000.0"

  /** SQL: stable round-to-6 of expression x. */
  def sqlRound6(x: String): String =
    s"CAST(round(($x)*1000000) AS BIGINT)/1000000.0"

  /** SQL: deterministic avg of 2-decimal column, rounded to 4. */
  def sqlAvg2(x: String): String =
    sqlRound4(s"${sqlSum2(x)}/count(*)")
}
