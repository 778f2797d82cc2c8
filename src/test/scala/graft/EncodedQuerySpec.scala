package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.EncodedQuery

case class EqRow(name: String, prio: Long, status: String)

/** The sysparm_query compiler — every public operator of the encoded-query
  * language, checked against hand-built DataFrame predicates on typed data.
  */
class EncodedQuerySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def R(name: String, prio: Long, status: String) = EqRow(name, prio, status)
  private val df = Seq(
    R("alpha", 1, "open"), R("beta", 2, "open"), R("gamma", 3, "closed"),
    R("delta", 10, "closed"), R("omega", 2, ""), R("disk failure", 1, "open"))
    .toDF("name", "prio", "status")

  private def names(q: String): Seq[String] =
    EncodedQuery.applyTo(df, q).select("name").collect().map(_.getString(0)).toSeq

  test("^OR binds before ^ (AND of OR-groups, the documented semantics)") {
    // (prio=1 OR prio=2) AND status=open
    assert(names("prio=1^ORprio=2^status=open^ORDERBYname") ==
      Seq("alpha", "beta", "disk failure"))
  }

  test("numeric literals compare numerically, not lexicographically") {
    // string compare would exclude 10 ("10" < "2"); numeric keeps it
    assert(names("prio>2^ORDERBYname") == Seq("delta", "gamma"))
  }

  test("IN and NOT IN cast each element to the column type") {
    assert(names("prioIN1,3^ORDERBYname") == Seq("alpha", "disk failure", "gamma"))
    assert(names("prioNOT IN1,2,3^ORDERBYname") == Seq("delta"))
  }

  test("string operators: LIKE/NOTLIKE/STARTSWITH/ENDSWITH") {
    assert(names("nameLIKEisk^ORDERBYname") == Seq("disk failure"))
    assert(names("nameSTARTSWITHd^ORDERBYname") == Seq("delta", "disk failure"))
    assert(names("nameENDSWITHa^ORDERBYname") ==
      Seq("alpha", "beta", "delta", "gamma", "omega"))
    assert(names("nameNOTLIKEl^ORDERBYname") == Seq("beta", "gamma", "omega"))
  }

  test("ISEMPTY / ISNOTEMPTY treat empty string like the Table API does") {
    assert(names("statusISEMPTY^ORDERBYname") == Seq("omega"))
    assert(names("statusISNOTEMPTY^prio=2^ORDERBYname") == Seq("beta"))
  }

  test("BETWEEN uses the a@b value form inclusively") {
    assert(names("prioBETWEEN2@3^ORDERBYname") == Seq("beta", "gamma", "omega"))
  }

  test("^NQ starts an independent query OR'd with the first") {
    assert(names("prio=10^NQstatus=closed^prio<5^ORDERBYname") ==
      Seq("delta", "gamma"))
  }

  test("ORDERBYDESC sorts descending") {
    assert(names("prio=1^ORDERBYDESCname") == Seq("disk failure", "alpha"))
  }

  test("unknown fields and malformed conditions fail loudly") {
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(df, "nosuchfield=1").collect()
    }
    intercept[IllegalArgumentException] { EncodedQuery.parse("^^=") }
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(df, "prioBETWEEN5").collect() // no '@'
    }
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(df, "prioIN").collect() // empty list
    }
  }

  test("dot-walked reference fields resolve through nested structs") {
    import org.apache.spark.sql.functions._
    // b7-style reference field: {value, link} struct, queried by dot-walk
    val nested = df.withColumn("ref",
      struct(col("prio").cast("string").as("value"),
        concat(lit("/api/now/table/x/"), col("name")).as("link")))
    val hits = EncodedQuery.applyTo(nested, "ref.value=10^ORDERBYname")
      .select("name").collect().map(_.getString(0)).toSeq
    assert(hits == Seq("delta"))
    val ends = EncodedQuery.applyTo(nested, "ref.linkENDSWITHalpha")
      .select("name").collect().map(_.getString(0)).toSeq
    assert(ends == Seq("alpha"))
    // dot-walk through a non-struct fails loudly
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(nested, "name.value=1").collect()
    }
  }

  test("tableApi composes query + fields + offset/limit like the Table API") {
    // page 2 of size 2 over prio-ordered rows, projected to one field
    val page = EncodedQuery.tableApi(df, "prio>0^ORDERBYprio",
      fields = Seq("name", "prio"), offset = 2, limit = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val all = EncodedQuery.applyTo(df, "prio>0^ORDERBYprio")
      .select("name", "prio")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(page == all.slice(2, 4))
    // pageKey substitutes for ORDERBY; without either, pagination refuses
    assert(EncodedQuery.tableApi(df, "prio>0", pageKey = Some("name"),
      limit = 3).count() == 3)
    intercept[IllegalArgumentException] {
      EncodedQuery.tableApi(df, "prio>0", offset = 1, limit = 2)
    }
  }

  test("an empty ^NQ alternative is match-all, not an empty.reduce crash") {
    // second alternative carries only a sort spec → matches everything
    assert(names("prio=1^NQORDERBYname") ==
      Seq("alpha", "beta", "delta", "disk failure", "gamma", "omega"))
    // direct predicate form folds to TRUE as well
    assert(df.filter(EncodedQuery.toPredicate(df, "prio=1^NQORDERBYname"))
      .count() == df.count())
  }

  test("unparseable literals fail at compile time, not as silent NULL filters") {
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(df, "prio>abc").collect()
    }
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(df, "prioBETWEEN1@abc").collect()
    }
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(df, "prioIN1,x").collect()
    }
    // ANSI cast rejects fractional→integral: caught at compile time too
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(df, "prio>2.5").collect()
    }
  }

  test("key-cursor pagination walks the full result with bounded pages") {
    // cursor pages must reassemble exactly the ordered full result
    val full = EncodedQuery.applyTo(df, "prio>0").orderBy("name")
      .select("name").collect().map(_.getString(0)).toSeq
    var cursor: Option[Any] = None
    var out = Vector.empty[String]
    var pageN = 0
    while (pageN == 0 || cursor.isDefined) {
      val page = EncodedQuery.pageAfter(df, "prio>0", "name", cursor, 2)
        .select("name").collect().map(_.getString(0)).toSeq
      out ++= page
      cursor = if (page.size < 2) None else Some(page.last)
      pageN += 1
    }
    assert(out == full)
    assert(pageN == 4) // 6 rows / page size 2 → 3 full pages + short page
    // the page plan is a top-k, not a global sort, and the cursor range
    // filter is pushable — the O(offset) cost never appears
    val planned = EncodedQuery.pageAfter(
      graft.sources.Tables.orders(spark, sf), "", "o_orderkey",
      Some(100L), 10)
    planned.collect()
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(o_orderkey".r
      .findFirstIn(plan).isDefined, s"cursor filter not pushed:\n$plan")
  }

  test("compiled predicate reaches the parquet scan as a pushed filter") {
    val q = SparkEntry.queries("b8_encoded_query")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("IsNotNull(o_orderstatus)"))
  }

  test("statsApi: encoded filter + group_by + aggregates mirror the " +
    "Aggregate API; groupless form returns one row") {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sf)
    val grouped = graft.api.EncodedQuery.statsApi(orders,
      q = "o_orderstatus=O", groupBy = Seq("o_orderpriority"),
      sumFields = Seq("o_totalprice"))
    val direct = orders.filter(col("o_orderstatus") === "O")
    // per-group counts sum to the filtered total; sum matches the exact
    // cents fold computed directly
    assert(grouped.agg(sum("count")).head().getLong(0) == direct.count())
    val apiSum = grouped.agg(sum("sum_o_totalprice")).head().getDouble(0)
    val directSum = direct
      .agg(sum(graft.functions.ExactNum.cents(col("o_totalprice"))))
      .head().getLong(0) / 100.0
    assert(math.abs(apiSum - directSum) < 1e-6)
    // groupless: a single summary row, like the API without group_by
    val one = graft.api.EncodedQuery.statsApi(orders,
      minFields = Seq("o_totalprice"), maxFields = Seq("o_totalprice"))
    assert(one.count() == 1)
    assert(one.columns.toSeq ==
      Seq("count", "min_o_totalprice", "max_o_totalprice"))
  }

  test("statsApi sysparm_having filters groups post-aggregate, evaluates " +
    "non-displayed aggregates, and fails loudly on malformed clauses") {
    import org.apache.spark.sql.functions.col
    val orders = graft.sources.Tables.orders(spark, sf)
    val base = graft.api.EncodedQuery.statsApi(orders,
      q = "o_orderstatus=O", groupBy = Seq("o_custkey"),
      sumFields = Seq("o_totalprice"))
    // a count floor must REMOVE at least one group and keep at least one
    val floored = graft.api.EncodedQuery.statsApi(orders,
      q = "o_orderstatus=O", groupBy = Seq("o_custkey"),
      sumFields = Seq("o_totalprice"), having = "count^*^>=^3")
    assert(floored.count() > 0 && floored.count() < base.count(),
      s"having removed nothing: ${floored.count()} of ${base.count()}")
    assert(floored.filter(col("count") < 3).isEmpty)
    // a clause on a NON-displayed aggregate is evaluated then dropped:
    // same rows as computing max explicitly, but no max column in the output
    val hidden = graft.api.EncodedQuery.statsApi(orders,
      q = "o_orderstatus=O", groupBy = Seq("o_custkey"),
      sumFields = Seq("o_totalprice"), having = "max^o_totalprice^>^300000")
    assert(!hidden.columns.contains("max_o_totalprice"))
    val explicit = graft.api.EncodedQuery.statsApi(orders,
      q = "o_orderstatus=O", groupBy = Seq("o_custkey"),
      sumFields = Seq("o_totalprice"), maxFields = Seq("o_totalprice"))
      .filter(col("max_o_totalprice") > 300000)
      .select("o_custkey", "count", "sum_o_totalprice")
    assert(hidden.count() > 0 && hidden.count() < base.count())
    assert(hidden.exceptAll(explicit).isEmpty && explicit.exceptAll(hidden).isEmpty)
    // two clauses AND together
    val both = graft.api.EncodedQuery.statsApi(orders,
      q = "o_orderstatus=O", groupBy = Seq("o_custkey"),
      sumFields = Seq("o_totalprice"),
      having = "count^*^>=^3,max^o_totalprice^>^300000")
    assert(both.count() > 0 && both.count() < floored.count() &&
      both.count() < hidden.count())
    // malformed clauses fail at compile time, loudly
    for (bad <- Seq("count>3", "median^o_totalprice^>^1", "count^*^~^3"))
      intercept[IllegalArgumentException] {
        graft.api.EncodedQuery.statsApi(orders, groupBy = Seq("o_custkey"),
          having = bad)
      }
  }

  test("display_value rendering is response-only: the query binds to raw " +
    "keys, the response carries display values, orphans render NULL") {
    import graft.api.EncodedQuery.Ref
    import org.apache.spark.sql.functions.col
    val cust = graft.sources.Tables.customer(spark, sf)
    val nat = graft.sources.Tables.nation(spark, sf)
    val refs = Seq(Ref("nation", "c_nationkey", nat, "n_nationkey",
      display = "n_name"))
    // filter on the RAW key value; the response renders the name
    val r = graft.api.EncodedQuery
      .tableApiDisplay(cust, refs, "c_nationkey=3^ORDERBYc_custkey",
        fields = Seq("c_custkey", "c_nationkey"))
    val expectName = nat.filter(col("n_nationkey") === 3)
      .select("n_name").head().getString(0)
    assert(r.count() > 0)
    assert(r.select("c_nationkey").distinct().collect().toSeq
      .map(_.getString(0)) == Seq(expectName))
    // response shape is the TABLE's shape (no walked-struct scaffolding)
    val full = graft.api.EncodedQuery.tableApiDisplay(cust, refs, "c_acctbal>0")
    assert(full.columns.toSeq == cust.columns.toSeq)
    // a dangling reference renders NULL, the API's broken-reference answer
    val orphaned = cust.withColumn("c_nationkey", col("c_nationkey") + 1000)
    val o = graft.api.EncodedQuery
      .tableApiDisplay(orphaned, refs, "c_acctbal>0")
    assert(o.filter(col("c_nationkey").isNotNull).isEmpty)
    // an edge without a display column fails loudly in this mode
    intercept[IllegalArgumentException] {
      graft.api.EncodedQuery.tableApiDisplay(cust,
        Seq(Ref("nation", "c_nationkey", nat, "n_nationkey")), "c_acctbal>0")
    }
  }

  test("cross-table dot-walk: two-hop walked filter equals the manual " +
    "join; dangling references answer ISEMPTY") {
    import graft.api.EncodedQuery.Ref
    import org.apache.spark.sql.functions.col
    val cust = graft.sources.Tables.customer(spark, sf)
    val nat = graft.sources.Tables.nation(spark, sf)
    val reg = graft.sources.Tables.region(spark, sf)
    val refs = Seq(Ref("nation", "c_nationkey", nat, "n_nationkey",
      Seq(Ref("region", "n_regionkey", reg, "r_regionkey"))))
    val walked = graft.api.EncodedQuery
      .tableApiWalked(cust, refs, "nation.region.r_name=ASIA^c_acctbal>0")
      .select("c_custkey")
    val manual = cust
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" && col("c_acctbal") > 0)
      .select("c_custkey")
    assert(walked.exceptAll(manual).count() == 0 &&
      manual.exceptAll(walked).count() == 0 && walked.count() > 0)
    // a dangling reference (no parent row) leaves a NULL struct, so the
    // walked field answers ISEMPTY — the Table API's broken-reference
    // behavior. Inject an orphan by shifting every FK out of range.
    val orphaned = cust.withColumn("c_nationkey", col("c_nationkey") + 1000)
    val walkedOrphans = graft.api.EncodedQuery
      .tableApiWalked(orphaned,
        Seq(Ref("nation", "c_nationkey", nat, "n_nationkey")),
        "nation.n_nameISEMPTY")
    assert(walkedOrphans.count() == cust.count())
  }

  test("relative-date terms: midnight boundary inclusivity, RELATIVE " +
    "window arithmetic, explicit-now discipline") {
    import org.apache.spark.sql.functions.col
    val ts = Seq(
      // the four boundary probes of ONToday with now = 2024-01-15 12:00Z
      ("eve_2359", "2024-01-14 23:59:59"), // day before → out
      ("midnight", "2024-01-15 00:00:00"), // midnight STARTS the day → in
      ("noon", "2024-01-15 12:00:00"),
      ("next_mid", "2024-01-16 00:00:00"), // next midnight is exclusive
      // RELATIVE probes around now − 2h = 10:00Z
      ("at_10", "2024-01-15 10:00:00"),
      ("after_10", "2024-01-15 10:00:01"))
      .toDF("name", "s")
      .select(col("name"), col("s").cast("timestamp").as("ts"))
    def names(q: String): Seq[String] =
      EncodedQuery.applyTo(ts, q,
        now = Some(java.time.Instant.parse("2024-01-15T12:00:00Z")))
        .select("name").collect().map(_.getString(0)).toSeq
    assert(names("tsONToday^ORDERBYname") ==
      Seq("after_10", "at_10", "midnight", "noon"))
    assert(names("tsON2024-01-14^ORDERBYname") == Seq("eve_2359"))
    // GT is strict, GE includes the boundary instant (now − 2h = 10:00)
    assert(names("tsRELATIVEGT@hour@ago@2^tsRELATIVELT@hour@ago@0^ORDERBYname") ==
      Seq("after_10"))
    assert(names("tsRELATIVEGE@hour@ago@2^tsRELATIVELE@hour@ago@0^ORDERBYname") ==
      Seq("after_10", "at_10", "noon"))
    // day and minute units, and ahead direction: (now − 1 day, now + 720 min)
    // = (Jan 14 12:00, Jan 16 00:00) — eve_2359 is in, next_mid is not
    assert(names("tsRELATIVEGT@day@ago@1^tsRELATIVELT@minute@ahead@720^ORDERBYname") ==
      Seq("after_10", "at_10", "eve_2359", "midnight", "noon"))
    // relative terms REQUIRE an explicit now — never wall-clock
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(ts, "tsONToday")
    }
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(ts, "tsRELATIVEGT@hour@ago@2")
    }
    // malformed unit / direction / amount fail loudly at compile time
    val now = Some(java.time.Instant.parse("2024-01-15T12:00:00Z"))
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(ts, "tsRELATIVEGT@week@ago@2", now)
    }
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(ts, "tsRELATIVEGT@hour@since@2", now)
    }
    intercept[IllegalArgumentException] {
      EncodedQuery.applyTo(ts, "tsONnot-a-date", now)
    }
  }

  test("display_value=all keeps raw + display pairs; query and ORDERBY " +
    "still bind to raw values") {
    import graft.api.EncodedQuery.Ref
    import org.apache.spark.sql.functions.col
    val cust = graft.sources.Tables.customer(spark, sf)
    val nat = graft.sources.Tables.nation(spark, sf)
    val refs = Seq(Ref("nation", "c_nationkey", nat, "n_nationkey",
      display = "n_name"))
    val r = graft.api.EncodedQuery.tableApiDisplayAll(
      cust, refs, "c_nationkey=3^ORDERBYc_custkey",
      fields = Seq("c_custkey", "c_nationkey", "c_nationkey_display"))
    val expectName = nat.filter(col("n_nationkey") === 3)
      .select("n_name").head().getString(0)
    assert(r.count() > 0)
    // raw keys survive AND the display column rides alongside
    assert(r.select("c_nationkey").distinct().collect().toSeq
      .map(_.getInt(0)) == Seq(3))
    assert(r.select("c_nationkey_display").distinct().collect().toSeq
      .map(_.getString(0)) == Seq(expectName))
    // a dangling reference keeps its raw key, renders a NULL display
    val orphaned = cust.withColumn("c_nationkey", col("c_nationkey") + 1000)
    val o = graft.api.EncodedQuery.tableApiDisplayAll(orphaned, refs,
      "c_acctbal>0")
    assert(o.filter(col("c_nationkey").isNull).isEmpty)
    assert(o.filter(col("c_nationkey_display").isNotNull).isEmpty)
  }
}
