package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for window/temporal operators (SURVEY.md §5 layers 2–3) — these
  * check semantic invariants that the DuckDB hash-compare can't express.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("e1: at most 3 rows per customer, rn strictly increasing") {
    val bad = run("e1_rank").groupBy("o_custkey").count().filter(col("count") > 3)
    assert(bad.count() == 0)
  }

  test("e3: running total per year ends at the year's exact total") {
    val last = run("e3_running_total")
      .groupBy("yr").agg(max("cum_spend").as("cum"))
    val direct = graft.sources.Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg((sum(graft.functions.ExactNum.cents(col("o_totalprice"))) / 100.0).as("tot"))
    val joined = last.join(direct, "yr")
      .filter(abs(col("cum") - col("tot")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("e7: funnel is order-sensitive — stages out of sequence don't count") {
    import spark.implicits._
    val ev = Seq(
      (10L, 1L, "view"), (10L, 2L, "click"), (10L, 3L, "purchase"), // full
      (20L, 1L, "purchase"), (20L, 2L, "view"), (20L, 3L, "click"), // buy-first
      (30L, 1L, "click"), (30L, 2L, "view"),                        // click-first
      (40L, 1L, "view"), (40L, 1L, "click")                         // same-instant
    ).toDF("user_id", "sec", "event_type")
      .select(col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val r = graft.operators.WindowedAnalytics
      .funnelOf(ev, Seq("view", "click", "purchase"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(10L).getInt(4) == 3)
    // u20's purchase precedes its click-after-view, u30's click precedes
    // its view, u40's click is NOT strictly after its view
    assert(r(20L).getInt(4) == 2 && r(20L).getInt(3) == 0)
    assert(r(30L).getInt(4) == 1 && r(30L).getInt(2) == 0)
    assert(r(40L).getInt(4) == 1 && r(40L).getInt(2) == 0)
  }

  test("e8: retention cohorts count distinct weekly-active users, gaps stay gaps") {
    import spark.implicits._
    // 2024-01-01 is a Monday, so week boundaries land on Jan 1/8/15.
    val ev = Seq(
      (1L, "2024-01-02"), (1L, "2024-01-09"), (1L, "2024-01-16"), // w0,w1,w2
      (2L, "2024-01-03"), (2L, "2024-01-17"),                     // w0, skips w1, w2
      (3L, "2024-01-10"), (3L, "2024-01-11"), (3L, "2024-01-15")  // late cohort; two
    ).toDF("user_id", "day")                                      // same-week events
      .select(col("user_id"), col("day").cast("timestamp").as("ts"))
    val r = graft.operators.WindowedAnalytics.retentionOf(ev)
      .collect()
      .map(x => (x.getTimestamp(0).toString.take(10), x.getInt(1)) -> x.getLong(2))
      .toMap
    assert(r == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L, ("2024-01-01", 2) -> 2L,
      ("2024-01-08", 0) -> 1L, ("2024-01-08", 1) -> 1L))
  }

  test("e7b: the 7-day bound only ever lowers a user's funnel depth") {
    val unb = run("e7_funnel").select(col("user_id"), col("stage").as("s0"))
    val bnd = run("e7b_funnel_window").select(col("user_id"), col("stage").as("s1"))
    val j = unb.join(bnd, "user_id")
    assert(j.filter(col("s1") > col("s0")).count() == 0)
    // the bound must bite on the real feed, or the query is vacuous
    assert(j.filter(col("s1") < col("s0")).count() > 0)
  }

  test("e9: weekly trend partitions the events, p50 <= p95") {
    val r = run("e9_latency_trend")
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(r.agg(sum("n")).head().getLong(0) == n)
    assert(r.filter(col("p50") > col("p95")).count() == 0)
  }

  test("i10: every purchase matches exactly one SCD2 version, state agrees " +
    "with the event log") {
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    val r = run("i10_scd2_lookup")
    // exactly one version per fact: row count equals purchase count and
    // purchase_id is unique
    assert(r.count() == purchases.count())
    assert(r.select("purchase_id").distinct().count() == r.count())
    // a purchase event is itself a state change or continuation: at the
    // purchase instant the valid version's state must be 'purchase'
    assert(r.filter(col("state") =!= "purchase").count() == 0)
  }

  test("e10: one drift row per event type, r2 in [0,1], slope matches a " +
    "local least-squares fit") {
    val r = run("e10_drift").collect()
    assert(r.length == 5 && r.forall(_.getLong(1) >= 2))
    assert(r.forall(x => x.getDouble(3) >= 0.0 && x.getDouble(3) <= 1.0))
    // recompute one type's slope sequentially from the same weekly frame
    val wk = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy(date_trunc("week", col("ts")).as("wk"))
      .agg(avg(col("value")).as("v"))
      .collect().map(x => (x.getTimestamp(0).getTime / 1000.0 / 604800.0,
        math.round(x.getDouble(1) * 1e4) / 1e4))
    val (mx, my) = (wk.map(_._1).sum / wk.length, wk.map(_._2).sum / wk.length)
    val slope = wk.map(p => (p._1 - mx) * (p._2 - my)).sum /
      wk.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val got = r.find(_.getString(0) == "click").get.getLong(2) / 1e6
    assert(math.abs(got - slope) < 1e-3, s"slope $got vs local $slope")
  }

  test("e11: islands partition the events and respect the 30-min gap rule") {
    val ev = graft.sources.Tables.events(spark, sf)
    val r = run("e11_islands")
    // partition: every event lands in exactly one island
    assert(r.agg(sum("n_events")).head.getLong(0) == ev.count())
    // islands are numbered 1..k per user with no holes
    val bad = r.groupBy("user_id")
      .agg(count(lit(1)).as("k"), min("island").as("lo"), max("island").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("k"))
    assert(bad.count() == 0)
    // inter-island silence: each island starts >30 min after the previous
    // island's end (same user); intra-island spans contain no such gap by
    // construction of the running-sum numbering, checked via the raw lag
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("island")
    val adjacent = r
      .withColumn("prev_end", lag(col("island_end"), 1).over(w))
      .filter(col("prev_end").isNotNull)
      .filter(unix_micros(col("island_start")) - unix_micros(col("prev_end"))
        <= 1800000000L)
    assert(adjacent.count() == 0)
  }

  test("k5: the imperative cogroup pass equals the relational full-outer twin") {
    val r = run("k5_cogroup")
    val o = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n_orders"))
    val e = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"))
    val spans = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey").as("key"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      .join(e, Seq("key"))
      .filter(col("ous").between(col("lo"), col("hi")))
      .groupBy("key").agg(count(lit(1)).as("n_in_span"))
    val twin = o.join(e.select("key", "n_events"), Seq("key"), "full")
      .join(spans, Seq("key"), "left")
      .select(col("key"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_in_span"), lit(0L)).as("n_in_span"))
    assert(r.except(twin).count() == 0 && twin.except(r).count() == 0)
  }

  test("c7: every nearby-count is positive and error ids are errors") {
    val out = run("c7_range_join")
    assert(out.filter(col("n_nearby") <= 0).count() == 0)
    assert(out.count() > 0)
  }

  test("c8: as-of click is never after its purchase") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val out = run("c8_asof_join")
      .join(ev.withColumnRenamed("event_id", "purchase_id")
        .withColumnRenamed("us", "pus"), "purchase_id")
      .join(ev.withColumnRenamed("event_id", "click_id")
        .withColumnRenamed("us", "cus"), Seq("click_id"), "left")
    assert(out.filter(col("cus") > col("pus")).count() == 0)
  }

  test("i3: sessions respect the 30-minute gap invariant") {
    // within a session, max gap <= 30 min; consecutive sessions of a user
    // are separated by > 30 min (checked via session boundaries).
    val sess = run("i3_session")
    val viol = sess.withColumn("prev_end",
        lag(col("end_us"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("session_id")))
      .filter(col("prev_end").isNotNull &&
        col("start_us") - col("prev_end") <= 30L * 60 * 1000000)
    assert(viol.count() == 0)
  }

  test("i5: dedup is idempotent and keeps one row per (user, type)") {
    val out = run("i5_dedup")
    assert(out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("i7: upsert result has exactly one state row per user (LWW)") {
    val out = run("i7_upsert")
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    // the merged state equals the overall latest event per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
    val latest = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"))
    val diff = out.select("user_id", "last_event_id")
      .except(latest)
    assert(diff.count() == 0)
  }

  test("i2: each event contributes to exactly 4 sliding windows") {
    val total = run("i2_sliding").agg(sum("n")).collect()(0).getLong(0)
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    assert(total == 4 * nEvents)
  }

  test("d6: pivot row sums equal per-user event counts") {
    val p = run("d6_pivot")
      .withColumn("tot", col("n_click") + col("n_view") + col("n_signup") +
        col("n_purchase") + col("n_error"))
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").count()
    val bad = p.join(direct, "user_id").filter(col("tot") =!= col("count"))
    assert(bad.count() == 0)
  }

  test("e12: every user contributes exactly (n_events - 1) transitions") {
    val total = run("e12_transitions").agg(sum("n")).head().getLong(0)
    val ev = graft.sources.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total == expected)
  }

  test("k6: imperative sorted-stream pass equals the lag-window twin") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val twin = graft.sources.Tables.events(spark, sf)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap_us"))
    val imp = run("k6_secondary_sort")
    assert(imp.except(twin).count() == 0 && twin.except(imp).count() == 0)
  }

  test("e13: spike and slump are mutually exclusive; warm-up days are " +
    "excluded; flags recompute from the emitted columns") {
    val m = run("e13_volume_monitor").collect()
    assert(m.nonEmpty)
    // a day cannot be both 1.5x above and 0.5x below its own baseline
    assert(m.forall(r => r.getAs[Int]("spike") + r.getAs[Int]("slump") <= 1))
    // flags are pure functions of (n, base7) — the emitted row is auditable
    assert(m.forall { r =>
      val n = r.getAs[Long]("n"); val b = r.getAs[Long]("base7")
      r.getAs[Int]("spike") == (if (n * 14 > b * 3) 1 else 0) &&
        r.getAs[Int]("slump") == (if (n * 14 < b) 1 else 0)
    })
    // every emitted day has a full 7-day baseline: per type, rows = days - 7
    val daysPerType = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rowsPerType = m.groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.length).toMap
    assert(rowsPerType.forall { case (t, n) => n == daysPerType(t) - 7 })
  }

  test("gr_degree_dist: the histogram double-counts each edge exactly once") {
    val h = run("gr_degree_dist").collect()
    val nEdges = graft.operators.CoreRelational.knnEdges(spark, sf).count()
    // sum over buckets of deg * n_vertices = 2|E| (every undirected edge
    // contributes one degree at each endpoint)
    val mass = h.map(r => r.getAs[Long]("deg") * r.getAs[Long]("n_vertices")).sum
    assert(mass == 2 * nEdges, s"mass $mass vs 2|E| ${2 * nEdges}")
    assert(h.forall(_.getAs[Long]("deg") >= 1))
  }

  test("h7: variant path reads agree with the from_json twin; missing paths " +
    "are NULL, never errors") {
    val ev = graft.sources.Tables.events(spark, sf)
    val v = run("h7_variant")
    // the typed variant extraction must equal the schema-ful from_json read
    val twin = ev.select(col("event_id"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
        .getField("k").as("k_num"))
    val joined = v.select("event_id", "k_num").join(twin, "event_id")
    assert(joined.filter(v("k_num") =!= twin("k_num")).count() == 0)
    // try_variant_get on an absent path is NULL for every row (no throw)
    assert(v.filter(col("absent").isNotNull).count() == 0)
    // the binary variant still knows its own shape: every props object in
    // the fixture carries exactly {k: long}
    val shapes = ev.select(schema_of_variant(parse_json(col("props"))).as("sh"))
      .distinct().collect().map(_.getString(0))
    assert(shapes.toSet == Set("OBJECT<k: BIGINT>"), shapes.mkString(","))
  }

  test("i11: sync report state agrees with i7 upsert; volumes partition the " +
    "delta slice") {
    val rep = run("i11_sync_pipeline")
    // every user the sync touches must land in the same final state the
    // graded I7 upsert computes (delta events are strictly later than the
    // target snapshot, so delta-LWW wins whenever the user is in the delta)
    val merged = run("i7_upsert").select(col("user_id"), col("last_type"))
    val disagree = rep.join(merged, "user_id")
      .filter(col("new_type") =!= col("last_type"))
    assert(disagree.count() == 0)
    // n_delta sums to exactly the post-watermark slice: the report neither
    // drops nor double-counts a delta event
    val deltaRows = graft.sources.Tables.events(spark, sf)
      .filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp")).count()
    assert(rep.agg(sum("n_delta")).head().getLong(0) == deltaRows)
    // classification is exhaustive and keyed to target membership
    assert(rep.filter(!col("change").isin("inserted", "updated", "unchanged"))
      .count() == 0)
  }

  test("c14: grid-blocked interval join equals the direct theta join") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("us").as("ps"),
        (col("us") + 3600000000L).as("pe"))
    val m = ev.filter(col("event_type") === "error" && col("value") >= 90)
      .select((col("us") - 900000000L).as("ms"), (col("us") + 900000000L).as("me"))
    // naive all-pairs form (fine at spec scale) — the grid blocking plus
    // the overlap-start-cell dedup trick must lose and invent NOTHING
    val naive = p.crossJoin(m)
      .filter(col("ps") <= col("me") && col("ms") <= col("pe"))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(least(col("pe"), col("me")) - greatest(col("ps"), col("ms")))
          .as("overlap_us"))
    val got = run("c14_interval_join")
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("i12: reconciliation classifies the planted sync defects per month") {
    val out = run("i12_reconcile").collect()
    val om = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
    def monthsWhere(r: Long): Set[String] = om
      .filter(col("o_orderkey") % 997 === r)
      .select("month").distinct().collect().map(_.getString(0)).toSet
    val dropped = monthsWhere(7)
    val corrupted = monthsWhere(13)
    out.foreach { r =>
      val month = r.getString(0)
      val expected =
        if (dropped(month)) "count_drift"
        else if (corrupted(month)) "content_drift"
        else "in_sync"
      assert(r.getString(3) == expected, s"$month: ${r.getString(3)} vs $expected")
    }
    // the total count delta is exactly the planted drop set — the checksum
    // partition never hides a missing row in an aggregate
    val drops = om.filter(col("o_orderkey") % 997 === 7).count()
    assert(out.map(r => r.getLong(1) - r.getLong(2)).sum == drops)
  }

  test("i13: per-field precedence merge matches a sequential per-user model") {
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    val aTypes = Set("signup", "purchase")
    val bTypes = Set("view", "click", "error")
    val stale = 604800000000L
    def cents(v: Double) = math.round(v * 100)
    def lww(rows: Seq[(Long, Long, String, Double, Long)]) =
      rows.sortBy(t => (-t._5, -t._2)).headOption
    val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val a = lww(rows.toSeq.filter(r => aTypes(r._3)))
      val b = lww(rows.toSeq.filter(r => bTypes(r._3)))
      (a, b) match {
        case (None, None) => None
        case (Some(ar), None) => Some((u, "a", ar._3, "a", cents(ar._4), "a"))
        case (None, Some(br)) => Some((u, "b", br._3, "b", cents(br._4), "b"))
        case (Some(ar), Some(br)) =>
          val (mt, ts) = if (br._5 > ar._5) (br._3, "b") else (ar._3, "a")
          val (mv, vs) =
            if (ar._5 + stale >= br._5) (cents(ar._4), "a") else (cents(br._4), "b")
          Some((u, "both", mt, ts, mv, vs))
      }
    }.toSet
    val got = run("i13_precedence_merge").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getString(5))).toSet
    assert(got == expected)
  }

  test("gr_lpa: one community per vertex, labels are vertex ids, and no " +
      "community crosses a connected component") {
    val lpa = run("gr_lpa")
    val e = graft.operators.CoreRelational.knnEdges(spark, sf)
    val verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
    assert(lpa.count() == verts.count())
    assert(lpa.select("s_suppkey").distinct().count() == lpa.count())
    // labels come from the vertex set (they start as ids and only propagate)
    assert(lpa.join(verts, col("community") === col("id"), "left_anti").count() == 0)
    // labels propagate along edges only, so a community can never span two
    // components of the same graph
    val comps = graft.operators.GraphOps.minLabelComponents(
      verts, e.select("src", "dst"))
    val joined = lpa
      .join(comps.withColumnRenamed("id", "s_suppkey"), "s_suppkey")
      .select(col("community"), col("comp").as("vcomp"))
      .join(comps.withColumnRenamed("id", "community")
        .withColumnRenamed("comp", "lcomp"), "community")
    assert(joined.filter(col("vcomp") =!= col("lcomp")).count() == 0)
    graft.CacheRegistry.releaseAll()
  }

  test("e14: dow in range, counts partition the events, shares recompute, " +
      "hot flag agrees with its own columns") {
    val out = run("e14_seasonality").collect()
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 6))
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == total)
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      val typeTotal = rs.map(_.getLong(2)).sum
      rs.foreach { r =>
        val expShare = math.round(r.getLong(2).toDouble / typeTotal * 1e4) / 1e4
        assert(math.abs(r.getDouble(3) - expShare) < 1e-9, s"$t share")
        assert(r.getInt(4) == (if (r.getLong(2) * 7 > typeTotal * 2) 1 else 0),
          s"$t hot flag")
      }
    }
  }

  test("e15: sliding distinct users equal a brute-force per-window recount") {
    val got = run("e15_sliding_distinct").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("ed"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val model = ev.flatMap { case (t, u, ed) => (ed - 6 to ed).map(w => (t, w, u)) }
      .groupBy { case (t, w, _) => (t, w) }
      .map { case ((t, w), rows) =>
        (t, java.time.LocalDate.ofEpochDay(w.toLong).toString) ->
          rows.map(_._3).distinct.size.toLong
      }
    assert(got == model)
  }

  test("gr_node_sim: hand graph — two-paths found, jaccard from symmetrized " +
      "degrees, sub-threshold pairs dropped") {
    import spark.implicits._
    // square 2-3-4 with chord: neighbors 1:{2,3} 2:{1,3,4} 3:{1,2,4} 4:{2,3}
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = graft.operators.CoreRelational.neighborSimOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // (1,4): common {2,3}, deg 2/2 → jac 2/(2+2-2) = 1.0 (structurally
    // identical non-adjacent pair — the link-prediction hit)
    // (2,3): common {1,4}, deg 3/3 → jac 2/4 = 0.5
    // all other pairs share one neighbor → below the common >= 2 floor
    assert(got == Map(
      (1L, 4L) -> (2L, 2L, 2L, 1.0),
      (2L, 3L) -> (2L, 3L, 3L, 0.5)))
  }

  // sequential model of the capped neighbor similarity — shared with the
  // random-input property in GraftProperties so the two suites can never
  // assert divergent definitions
  private def nodeSimModel(edges: Seq[(Long, Long, Long)], m: Int) =
    TestModels.nodeSim(edges, m)

  test("gr_node_sim cap: capped similarity matches a sequential model on a " +
      "weighted hub graph where the cap binds") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // a hub-heavy random graph: vertex 0 touches everyone (sym degree 24,
    // far above the cap), the rest form a sparse ring with random chords
    val hub = (1L to 24L).map(v => (0L, v, rnd.nextInt(9) + 1L))
    val ring = (1L until 24L).map(v => (v, v + 1, rnd.nextInt(9) + 1L))
    val chords = Seq.fill(15) {
      val a = rnd.nextInt(24) + 1L; val b = rnd.nextInt(24) + 1L
      (math.min(a, b), math.max(a, b), rnd.nextInt(9) + 1L)
    }.filter { case (a, b, _) => a != b }
    // one weight per unordered pair (keep the max — mirrors a real edge
    // list where the weight is a pair-level aggregate)
    val edges = (hub ++ ring ++ chords)
      .groupBy { case (a, b, _) => (a, b) }
      .map { case ((a, b), es) => (a, b, es.map(_._3).max) }.toSeq
    val e = edges.toDF("src", "dst", "w")
    for (m <- Seq(3, 10)) {
      val got = graft.operators.CoreRelational.neighborSimOf(e, m).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      assert(got == nodeSimModel(edges, m), s"capM=$m")
    }
  }

  test("gr_node_sim cap: reported degrees never exceed the cap on the real " +
      "graph — the wedge-key bound holds where it matters") {
    val rows = run("gr_node_sim").collect()
    assert(rows.nonEmpty)
    // da/db ARE the capped symmetrized degrees; ≤ 10 everywhere means the
    // wedge join's per-shared-neighbor fan-in is bounded at 10 → Σ deg²
    // ≤ 100·|V| at any corpus size
    assert(rows.forall(r => r.getLong(3) <= 10 && r.getLong(4) <= 10),
      "a capped degree exceeded the cap")
  }

  test("gr_node_sim cap: below the cap, capped equals uncapped exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // sparse graph: out-degree ≤ 3 → symmetrized degree ≤ 6 < 10, so the
    // cap must be a no-op
    val edges = (0L until 30L).flatMap { v =>
      (1 to rnd.nextInt(3) + 1).map { k =>
        val u = (v + k) % 30
        (math.min(v, u), math.max(v, u), rnd.nextInt(9) + 1L)
      }
    }.groupBy { case (a, b, _) => (a, b) }
      .map { case ((a, b), es) => (a, b, es.map(_._3).max) }.toSeq
    val maxSymDeg = edges.flatMap { case (a, b, _) => Seq(a, b) }
      .groupBy(identity).values.map(_.size).max
    assert(maxSymDeg <= 10, s"fixture precondition: maxSymDeg=$maxSymDeg")
    val e = edges.toDF("src", "dst", "w")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val capped = rows(graft.operators.CoreRelational.neighborSimOf(e, 10))
    val uncapped = rows(
      graft.operators.CoreRelational.neighborSimOf(e, Int.MaxValue))
    assert(capped == uncapped)
    assert(capped == nodeSimModel(edges, Int.MaxValue))
  }

  test("e16 attribution: lookback boundary inclusive, same-us touch credits, " +
      "no touch is direct") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // µs → ms epoch
    val day = 86400000000L
    val t0 = 1700000000000000L
    val ev = Seq(
      // u1: click one day before the purchase → click credited
      (1L, 1L, "click", t(t0), 0.0),
      (2L, 1L, "purchase", t(t0 + day), 10.0),
      // u2: view 8 days before → outside the 7-day lookback → direct
      (3L, 2L, "view", t(t0), 0.0),
      (4L, 2L, "purchase", t(t0 + 8 * day), 20.0),
      // u3: click EXACTLY 7 days before → boundary is inclusive → click
      (5L, 3L, "click", t(t0), 0.0),
      (6L, 3L, "purchase", t(t0 + 7 * day), 30.0),
      // u4: view at the SAME microsecond → kind key sorts it first → view
      (7L, 4L, "view", t(t0), 0.0),
      (8L, 4L, "purchase", t(t0), 40.0),
      // u5: no touch at all → direct
      (9L, 5L, "purchase", t(t0), 50.0),
      // u6: click then view → LAST touch (view) gets the credit
      (10L, 6L, "click", t(t0), 0.0),
      (11L, 6L, "view", t(t0 + day), 0.0),
      (12L, 6L, "purchase", t(t0 + 2 * day), 60.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = graft.operators.WindowedAnalytics.attributionOf(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(
      "click" -> (2L, 40.0),
      "view" -> (2L, 100.0),
      "direct" -> (2L, 70.0)))
  }

  test("e17: ewma equals a sequential per-type model (integer taps), the " +
    "first day self-normalizes to x, and `above` is the cross-multiplied " +
    "comparison") {
    val got = SparkEntry.queries("e17_ewma")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getInt(4)))).toMap
    // independent model: same daily tick sums (same tenK expression), then
    // a sequential truncated-EWMA loop in plain Scala
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(graft.functions.ExactNum.tenK(col("value"))).as("xt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(daily.length == got.size)
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2).map(r => (r._2, r._3))
      series.indices.foreach { t =>
        val (day, xt) = series(t)
        val lo = math.max(0, t - 7)
        val num = (lo to t).map { i => series(i)._2 << (7 - (t - i)) }.sum
        val den = (lo to t).map { i => 1L << (7 - (t - i)) }.sum
        val expEwma = math.round((num.toDouble / den) / 1e4 * 10000) / 10000.0
        val (x, ewma, above) = got((tpe, day))
        assert(x == xt / 10000.0, s"$tpe $day x")
        assert(ewma == expEwma, s"$tpe $day ewma: got $ewma want $expEwma")
        assert(above == (if (xt * den > num) 1 else 0), s"$tpe $day above")
        if (t == 0) assert(ewma == math.round(x * 10000) / 10000.0,
          s"$tpe first day must self-normalize")
      }
    }
  }

  test("e18: the window closed form equals the literal CUSUM recurrence " +
    "s_t = max(0, s_{t-1} + (x_t - mu)), and flags match the integer bar") {
    val got = SparkEntry.queries("e18_cusum")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(3), r.getInt(4)))).toMap
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(graft.functions.ExactNum.tenK(col("value"))).as("xt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2).map(r => (r._2, r._3))
      val n = series.length.toLong
      val s = series.map(_._2).sum
      var st = 0L // the recurrence, in the same n-scaled integer units
      series.foreach { case (day, xt) =>
        st = math.max(0L, st + (xt * n - s))
        val (excess, flag) = got((tpe, day))
        assert(excess == math.round(st.toDouble / n / 1e4 * 10000) / 10000.0,
          s"$tpe $day excess")
        assert(flag == (if (st > n * 10000000L) 1 else 0), s"$tpe $day flag")
      }
    }
    // the fixture must exercise both flag values or the bar is vacuous
    val flags = got.values.map(_._2).toSet
    assert(flags == Set(0, 1), s"flag values seen: $flags")
  }

  test("i15: the spine is exactly types x days, gaps carry the last " +
    "observed count forward, and leading gaps fill 0") {
    val got = SparkEntry.queries("i15_backfill")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getInt(4)))
    val types = got.map(_._1).distinct.sorted
    val days = got.map(_._2).distinct.sorted
    assert(got.length == types.length * days.length)
    types.foreach { tpe =>
      var carry = 0L
      days.foreach { day =>
        val Some((_, _, n, filled, isGap)) = got.find(r => r._1 == tpe && r._2 == day)
        n match {
          case Some(v) =>
            assert(isGap == 0); carry = v
            assert(filled == v, s"$tpe $day observed row must fill itself")
          case None =>
            assert(isGap == 1)
            assert(filled == carry, s"$tpe $day gap must carry $carry")
        }
      }
    }
    // the fixture must actually contain gaps or the operator is vacuous
    assert(got.exists(_._5 == 1), "no gaps in fixture series")
    assert(got.exists(_._5 == 0), "no observed rows in fixture series")
  }

  test("gr_harmonic: hand graphs — a path scores ends 1.5 / middles 2.5, " +
    "and a triangle has no strict 2-hop targets") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val gotPath = graft.operators.CoreRelational.boundedHarmonicOf(path)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(gotPath == Map(
      1L -> ((1L, 1L, 1.5)), 2L -> ((2L, 1L, 2.5)),
      3L -> ((2L, 1L, 2.5)), 4L -> ((1L, 1L, 1.5))))
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val gotTri = graft.operators.CoreRelational.boundedHarmonicOf(tri)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(gotTri == Map(1L -> 2.0, 2L -> 2.0, 3L -> 2.0))
  }

  test("gr_clustering_coef: hand graphs — a triangle is fully transitive, " +
    "a path is 0, a diagonal square splits 1.0 / 0.6667") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]) =
      graft.operators.CoreRelational.clusteringCoefOf(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)), 3L -> ((2L, 1L, 1.0))))
    assert(run(Seq((1L, 2L), (2L, 3L))) == Map(
      1L -> ((1L, 0L, 0.0)), 2L -> ((2L, 0L, 0.0)), 3L -> ((1L, 0L, 0.0))))
    // square 1-2-3-4 with the 1-3 diagonal: corners on the diagonal see
    // 2 of their 3 neighbor pairs connected; the others see their only one
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))) == Map(
      1L -> ((3L, 2L, 0.6667)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((3L, 2L, 0.6667)), 4L -> ((2L, 1L, 1.0))))
  }

  test("e19: deciles partition the users, revenue sums to the exact total, " +
    "and the output equals a sequential richest-first model") {
    val got = SparkEntry.queries("e19_concentration")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
    assert(got.map(_._1).toSet.subsetOf((1L to 10L).toSet))
    // sequential model from the same per-user cents
    val cents = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(graft.functions.ExactNum.cents(col("value"))).as("c"))
      .collect().map(_.getLong(1))
    val hist = cents.groupBy(identity).map { case (c, g) => c -> g.length.toLong }
      .toSeq.sortBy(-_._1)
    val tu = cents.length.toLong
    val tc = cents.sum
    var cumBefore = 0L
    val model = hist.map { case (c, nu) =>
      val dec = math.min(9L, cumBefore * 10 / tu) + 1
      cumBefore += nu
      (dec, nu, c * nu)
    }.groupBy(_._1).map { case (d, g) =>
      d -> ((g.map(_._2).sum, g.map(_._3).sum / 100.0,
        math.round(g.map(_._3).sum.toDouble / tc * 10000) / 10000.0))
    }
    assert(got.toMap == model)
    assert(got.map(_._2._1).sum == tu)
    assert(math.abs(got.map(_._2._2).sum - tc / 100.0) < 1e-9)
    // richest-first: the top decile can never hold less than the bottom
    val byDec = got.toMap
    assert(byDec(1L)._3 >= byDec(byDec.keySet.max)._3)
  }

  test("d16: weighted median equals a sequential model and sits at the " +
    "smallest price whose cumulative weight reaches half") {
    val got = SparkEntry.queries("d16_weighted_median")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity") * 100).cast("long").as("wq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val hist = g.groupBy(_._2).map { case (c, h) => c -> h.map(_._3).sum }
        .toSeq.sortBy(_._1)
      val tot = hist.map(_._2).sum
      var cum = 0L
      val med = hist.collectFirst {
        case (c, w) if { cum += w; cum * 2 >= tot } => c
      }.get
      assert(got(flag) == ((med / 100.0, tot)), s"flag $flag")
      // definitional check: weight strictly below the median is < half
      val below = hist.takeWhile(_._1 < med).map(_._2).sum
      assert(below * 2 < tot, s"flag $flag median not minimal")
    }
  }
}
