package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs — one JVM-wide session, UTC, small
  * shuffle fan-out (SURVEY.md §5 layer 2).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class CoreRelationalSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)
  private def run_dir(name: String, dir: String) = SparkEntry.queries(name)(spark, dir)

  test("every registered query has either an oracle or a documented omission") {
    // ✘-oracle operators are allowed but must be intentional: sketch
    // estimates are engine-specific (rows-only gate; accuracy asserted below).
    val intentionallyNoOracle = Set("d2b_sketches")
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- intentionallyNoOracle
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without query: $orphans")
  }

  test("a5 short last page: a <500-row source yields a short page 2 and no page 4") {
    // The Table API's short-last-page shape: a source with 250 rows has a
    // page 2 of rows 201-250 (short — its hi bound falls back to the last
    // available key) and no page 4 at all (its lo bound is beyond the data).
    // Before the try_element_at/coalesce bounds this crashed under ANSI.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("short_orders").toString
    graft.sources.Tables.orders(spark, sf).orderBy("o_orderkey").limit(250)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = run_dir("a5_paginate", dir).collect()
    assert(out.length == 50, s"expected the 50 short-page rows, got ${out.length}")
    val rns = out.map(_.getAs[Int]("rn")).sorted
    assert(rns.head == 201 && rns.last == 250) // page 2 only, rows 201-250
  }

  test("d2b sketch aggregates track exact cardinality/median within tolerance") {
    import org.apache.spark.sql.functions._
    val sketch = run("d2b_sketches").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"),
        expr("percentile(l_quantity, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sketch.keySet == exact.keySet)
    for ((k, (n, med)) <- sketch) {
      val (en, emed) = exact(k)
      assert(math.abs(n - en).toDouble / en < 0.05, s"$k cardinality: $n vs $en")
      assert(math.abs(med - emed) <= 1.0, s"$k median: $med vs $emed")
    }
  }

  test("d10 grouping sets: grand total row equals the sum of detail rows") {
    import org.apache.spark.sql.functions._
    val df = run("d10_grouping_sets")
    val grand = df.filter("gid = 3").collect()
    assert(grand.length == 1)
    val detailN = df.filter("gid = 0").agg(sum("n")).collect()(0).getLong(0)
    assert(grand(0).getAs[Long]("n") == detailN)
    val statusRows = df.filter("gid = 1").count()
    assert(statusRows == df.filter("gid = 0").select("status").distinct().count())
  }

  test("e6 percent_rank spans [0,1] and cume_dist ends at 1 per segment") {
    import org.apache.spark.sql.functions._
    val df = run("e6_pct_dist")
    val bounds = df.groupBy("c_mktsegment")
      .agg(min("pct_rank").as("lo"), max("pct_rank").as("hi"),
        max("cume").as("cd")).collect()
    bounds.foreach { r =>
      assert(r.getDouble(1) == 0.0, "first row of each segment has pct_rank 0")
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0,
        "last row of each segment has pct_rank = cume_dist = 1")
    }
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("d1_pricing_summary matches hand-checked oracle values (sf0.001)") {
    val rows = run("d1_pricing_summary")
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val expected = Seq(
      ("A", "F", 15557.0, 613L), ("A", "O", 15549.0, 635L),
      ("N", "F", 18515.0, 704L), ("N", "O", 15891.0, 638L),
      ("R", "F", 15704.0, 631L), ("R", "O", 15827.0, 624L))
    assert(rows.toSeq == expected)
  }

  test("c5 semi + c6 anti partition the customer side (on the P-order predicate)") {
    val semi = run("c5_join_semi").count()
    val anti = run("c6_join_anti").count()
    val all = graft.sources.Tables.customer(spark, sf).count()
    assert(semi + anti == all)
    assert(anti == 7)
  }

  test("c9 cross join is the full 25x5 grid") {
    assert(run("c9_cross").count() == 125)
  }

  test("d3 rollup grand total equals d1-style ungrouped sum") {
    val grand = run("d3_rollup").filter("gid = 3").collect()
    assert(grand.length == 1)
    val total = run("d3_rollup").filter("gid = 0")
      .agg(org.apache.spark.sql.functions.sum("sum_qty")).collect()(0).getDouble(0)
    assert(math.abs(grand(0).getAs[Double]("sum_qty") - total) < 1e-6)
  }

  test("g2 intersect and g3 except are disjoint and union to the 1995 set") {
    val i = run("g2_intersect").count()
    val e = run("g3_except").count()
    val y95 = graft.sources.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate")) === 1995)
      .select("o_custkey").distinct().count()
    assert(i + e == y95)
  }

  test("c11: an injected dangling reference (and a null FK) are both orphans") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val r = graft.operators.CoreRelational
      .integrityEdge("child.fk->parent", child, "fk", parent, "pk")
      .collect()(0)
    assert(r.getLong(1) == 4 && r.getLong(2) == 2 && r.getInt(3) == 0)
    // and the all-valid case reports ok
    val ok = graft.operators.CoreRelational
      .integrityEdge("ok", child.filter("fk <= 2"), "fk", parent, "pk")
      .collect()(0)
    assert(ok.getLong(2) == 0 && ok.getInt(3) == 1)
  }

  test("gr_knn_triangles: nonempty, every reported vertex closes a triangle") {
    val r = run("gr_knn_triangles")
    assert(r.count() > 0)
    assert(r.filter(org.apache.spark.sql.functions.col("n_triangles") < 1)
      .count() == 0)
  }

  test("gr_pagerank: matches a sequential integer power-iteration model") {
    import org.apache.spark.sql.functions.col
    val edges = graft.operators.CoreRelational.knnEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // same arithmetic, driver-side: symmetrize, deg, 3 damped rounds of
    // truncating integer division — the distributed result must be EXACTLY
    // this (integer ops are partitioning-invariant, that's the design)
    val ed = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = ed.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    var pr = deg.map { case (k, _) => (k, 1000000L) }
    for (_ <- 1 to 3) {
      val contrib = ed.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = contrib.map { case (v, s) => v -> (150000L + 85L * s / 100L) }
    }
    val got = run("gr_pagerank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == pr)
    // sanity: damped mass stays within (0.15, 1.0]×|V| of the start mass
    val mass = got.values.sum
    assert(mass > 150000L * got.size && mass <= 1000000L * got.size)
  }

  test("gr_kcore: matches a sequential 3-round peel model") {
    val edges = graft.operators.CoreRelational.knnEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ed = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    def degAmong(alive: Set[Long]): Map[Long, Long] =
      ed.filter { case (u, v) => alive(u) && alive(v) }
        .groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    var alive = ed.map(_._1).toSet
    for (_ <- 1 to 3) alive = degAmong(alive).filter(_._2 >= 2).keySet
    val model = degAmong(alive)
    val got = run("gr_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == model)
    // bounded rounds, not the fixpoint: survivors held degree >= 2 in the
    // PREVIOUS round's subgraph; in the final one they can be thinner but
    // never isolated (an edgeless survivor emits no degree row at all)
    assert(got.values.forall(_ >= 1))
  }

  test("d12: salted shard-then-merge equals the plain groupBy exactly") {
    import org.apache.spark.sql.functions._
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_suppkey")
      .agg((sum(graft.functions.ExactNum.cents(col("l_quantity"))) / 100.0).as("sum_qty"),
        (sum(graft.functions.ExactNum.cents(col("l_extendedprice"))) / 100.0).as("sum_price"),
        count(lit(1)).as("n_items"))
    assert(run("d12_salted_agg").except(plain).count() == 0)
    assert(plain.except(run("d12_salted_agg")).count() == 0)
  }

  test("a7: ORC roundtrip preserves schema and every row") {
    val orig = graft.sources.Tables.supplier(spark, sf)
    val back = run("a7_orc_roundtrip")
    assert(back.schema == orig.select(back.columns.map(
      org.apache.spark.sql.functions.col): _*).schema)
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0)
  }

  test("events reader yields microsecond TimestampType despite nanos parquet") {
    val df = graft.sources.Tables.events(spark, sf)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.count() == 1000)
  }

  test("c12: salted join equals the plain join, and the plan shuffles") {
    import org.apache.spark.sql.functions._
    import graft.functions.ExactNum._
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(sum2(expr("l_extendedprice*(1.0-l_discount)")).as("revenue"),
        count(lit(1)).as("n_items"))
    val salted = run("c12_salted_join")
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      "salted join must not silently broadcast — the demonstration is the shuffle")
  }

  test("c13 banded blocking is exact on substitution-radius-2 pairs (pigeonhole)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val got = run_dir("c13_fuzzy_match", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("dist")).toMap

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val sup = graft.sources.Tables.supplier(spark, dir)
      .join(graft.sources.Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_regionkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val brute = (for {
      (ia, na, ra) <- sup; (ib, nb, rb) <- sup
      if ra == rb && ia < ib
      d = lev(na, nb) if d <= 2
    } yield (ia, ib) -> (na, nb, d)).toMap

    // Completeness on the substitution model: every same-region pair at
    // hamming ≤ 2 shares a transversal digit group (pigeonhole) and MUST
    // be in the result. Shift-type pairs (hamming > 2 but lev ≤ 2) are
    // the documented recall trade and may be absent.
    brute.foreach { case ((ia, ib), (na, nb, d)) =>
      val ham = na.zip(nb).count { case (x, y) => x != y }
      if (ham <= 2)
        assert(got.contains((ia, ib)), s"lost substitution pair ($ia,$ib)")
    }
    // Soundness: everything emitted is a true same-region lev ≤ 2 pair
    // with the standard distance.
    got.foreach { case (k, d) =>
      assert(brute.contains(k) && brute(k)._3 == d, s"false pair $k")
    }
    // At this fixture the trade costs nothing: banded == brute exactly.
    assert(got.size == brute.size, s"sf0.01: ${got.size} vs brute ${brute.size}")
  }

  test("c15 bucketed join returns exactly the plain-join result") {
    import org.apache.spark.sql.functions._
    import graft.functions.ExactNum.sum2
    val got = run("c15_bucket_join").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exp = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum2(coalesce(col("o_totalprice"), lit(0.0))).as("total_price"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("d15 dq report: injected violations land on exactly their rules") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def t(s0: String) = java.sql.Timestamp.valueOf(s0)
    // 20 clean rows keep the 5% null-rate rule passing with ONE null below
    val clean = (1L to 20L).map(i =>
      (i, i % 3 + 1, 100.0, t("1995-06-01 00:00:00")))
    val dirty = Seq(
      (20L, 1L, 100.0, t("1995-06-01 00:00:00")),           // duplicate pk
      (21L, 99L, 100.0, t("1995-06-01 00:00:00")),          // orphan custkey
      (22L, 1L, -5.0, t("1995-06-01 00:00:00")),            // negative price
      (23L, 2L, 100.0, t("2001-01-01 00:00:00")))           // out of range
    val o = (clean ++ dirty)
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      // two nulls among 24 rows → 2*20 > 24 → the null-rate rule FAILS
      .withColumn("o_totalprice",
        when(col("o_orderkey").isin(18L, 19L), lit(null)).otherwise(col("o_totalprice")))
    val cust = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val got = graft.operators.CoreRelational.dqReportOf(o, cust).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got == Map(
      "fk_customer" -> (24L, 1L, 0),
      "orderdate_range" -> (24L, 1L, 0),
      "pk_unique" -> (24L, 1L, 0),
      "price_nonneg" -> (24L, 1L, 0),
      "price_null_rate_5pct" -> (24L, 2L, 0)))
  }

  test("d14 decimal-ledger twin equals an exact driver-side BigDecimal model") {
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_discount", "l_tax")
      .collect()
    def d2(x: Double) = BigDecimal(math.round(x * 100)) * BigDecimal("0.01")
    val model = rows.groupBy(_.getString(0)).map { case (f, g) =>
      val px = g.map(r => d2(r.getDouble(1))).sum
      val dp = g.map(r => d2(r.getDouble(1)) * (1 - d2(r.getDouble(2)))).sum
      val ch = g.map { r =>
        d2(r.getDouble(1)) * (1 - d2(r.getDouble(2))) * (1 + d2(r.getDouble(3)))
      }.sum
      f -> (px, dp, ch)
    }
    val got = graft.operators.CoreRelational
      .decimalLedgerOf(graft.sources.Tables.lineitem(spark, sf)).collect()
    assert(got.map(_.getString(0)).toSet == model.keySet)
    got.foreach { r =>
      val (px, dp, ch) = model(r.getString(0))
      assert(BigDecimal(r.getDecimal(1)) == px, s"${r.getString(0)} sum_price")
      assert(BigDecimal(r.getDecimal(2)) == dp, s"${r.getString(0)} sum_disc_price")
      assert(BigDecimal(r.getDecimal(3)) == ch, s"${r.getString(0)} sum_charge")
    }
  }

  test("d14 graded integer units equal the decimal-ledger twin, descaled") {
    // the graded BIGINT tick columns are the decimal ledger on an exact
    // integer grid: cents = sum_price·100, e4 = sum_disc_price·10⁴,
    // e6 = sum_charge·10⁶ — equality here pins that the graded query lost
    // nothing by trading DecimalType for the hash-stable BIGINT class
    val li = graft.sources.Tables.lineitem(spark, sf)
    val twin = graft.operators.CoreRelational.decimalLedgerOf(li).collect()
      .map(r => r.getString(0) ->
        (BigDecimal(r.getDecimal(1)), BigDecimal(r.getDecimal(2)),
          BigDecimal(r.getDecimal(3)))).toMap
    val got = run("d14_decimal_money").collect()
    assert(got.map(_.getString(0)).toSet == twin.keySet)
    got.foreach { r =>
      val (px, dp, ch) = twin(r.getString(0))
      assert(BigDecimal(r.getLong(1)) == px * 100, s"${r.getString(0)} cents")
      assert(BigDecimal(r.getLong(2)) == dp * 10000, s"${r.getString(0)} e4")
      assert(BigDecimal(r.getLong(3)) == ch * 1000000, s"${r.getString(0)} e6")
    }
  }
}
