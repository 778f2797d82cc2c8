package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** File-connector and approximate-aggregate coverage (SURVEY.md §2 A3 file
  * form, D2/D7 approx variants — not oracle-gradable, proven here).
  */
class SourcesAndApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("A3 file form: csv write → schema-explicit read round-trips exactly") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString + "/nation"
    val nation = graft.sources.Tables.nation(spark, sf)
    nation.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() == 25)
    assert(back.exceptAll(nation).count() == 0 &&
      nation.exceptAll(back).count() == 0)
  }

  test("A2 file form: spark.read.json ingests an envelope dump with explode") {
    // Table-API-style payload: {"result": [ {record...} ]} per line
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    val nation = graft.sources.Tables.nation(spark, sf)
    nation.select(to_json(struct(col("n_nationkey"), col("n_name"))).as("rec"))
      .agg(concat(lit("{\"result\": ["), concat_ws(",", collect_list(col("rec"))), lit("]}"))
        .as("payload"))
      .coalesce(1).write.mode("overwrite").text(dir)
    val parsed = spark.read.json(dir)
      .select(explode(col("result")).as("r"))
      .select(col("r.n_nationkey").as("n_nationkey"), col("r.n_name").as("n_name"))
    assert(parsed.count() == 25)
    assert(parsed.exceptAll(nation.select("n_nationkey", "n_name")).count() == 0)
  }

  test("A-group: ORC sink/source round-trips the full orders table") {
    // Second columnar format besides parquet — same write/read surface, so
    // a deployment can sink to ORC-consuming downstreams with no operator
    // changes. (No DuckDB oracle: DuckDB reads parquet/csv/json only.)
    val dir = java.nio.file.Files.createTempDirectory("orc").toString + "/orders"
    val orders = graft.sources.Tables.orders(spark, sf)
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == orders.schema) // types survive the format round-trip
    assert(back.count() == 1500)
    assert(back.exceptAll(orders).count() == 0 && orders.exceptAll(back).count() == 0)
    // predicate pushdown works against ORC scans too
    val plan = back.filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderstatus"))
  }

  test("hive-partitioned layout: partition filters prune the scan, not the rows") {
    // The 100-TB scan discipline: a corpus laid out source=<v>/part-*.parquet
    // must answer a source-filtered query by reading ONE directory. Pinned
    // here because no oracle can see scan metadata.
    val dir = java.nio.file.Files.createTempDirectory("part").toString + "/docs"
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.write.mode("overwrite").partitionBy("source").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("source") === "src3")
    back.collect()
    val plan = back.queryExecution.executedPlan.toString
    // the source predicate must land in PartitionFilters (directory pruning),
    // never in PushedFilters (row-group evaluation of every file)
    assert("PartitionFilters: \\[[^\\]]*src3".r.findFirstIn(plan).isDefined, plan)
    assert(!"PushedFilters: \\[[^\\]]*src3".r.findFirstIn(plan).isDefined)
    assert(back.count() == docs.filter(col("source") === "src3").count())
    // partition-column round-trip: values and per-source counts survive
    val perSrc = spark.read.parquet(dir).groupBy("source").count()
    val expected = docs.groupBy("source").count()
    assert(perSrc.exceptAll(expected).count() == 0 &&
      expected.exceptAll(perSrc).count() == 0)
  }

  test("A11 graded form: the year filter prunes partitions on the graded " +
    "partitioned-sink read") {
    // The graded a11 query must actually take the directory-pruned path:
    // its year predicate lands in PartitionFilters (file listing), not
    // PushedFilters (row groups of every file) — the property that turns a
    // decade-of-history scan into a one-partition read at 100 TB.
    val q = SparkEntry.queries("a11_partitioned_sink")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*1998".r.findFirstIn(plan).isDefined, plan)
    assert(!"PushedFilters: \\[[^\\]]*1998".r.findFirstIn(plan).isDefined)
    // and the pruned read returns exactly the source rows for that year
    val src = graft.sources.Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1998)
    assert(q.count() == src.count())
  }

  test("schema evolution: mergeSchema unifies extracts written across syncs") {
    // A CMDB class gains a column between two sync runs; the lake read must
    // surface the union schema with nulls for the old batch.
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    val r = graft.sources.Tables.region(spark, sf)
    r.select("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    r.select(col("r_regionkey"), col("r_name"),
        lit("2024-01-02 00:00:00").as("sys_updated_on"))
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("r_regionkey", "r_name", "sys_updated_on", "batch"))
    assert(merged.count() == 10)
    assert(merged.filter(col("sys_updated_on").isNull).count() == 5) // old batch
  }

  test("class-hierarchy union: unionByName fills missing subclass columns") {
    // cmdb_ci subclass pattern (§1.1): parent columns + extensions, merged
    // with allowMissingColumns — each class keeps its own extract schema.
    val base = graft.sources.Tables.supplier(spark, sf)
      .select(col("s_suppkey").as("sys_id"), col("s_name").as("name"))
    val extended = graft.sources.Tables.customer(spark, sf).limit(10)
      .select(col("c_custkey").as("sys_id"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
    val all = base.unionByName(extended, allowMissingColumns = true)
    assert(all.columns.toSeq == Seq("sys_id", "name", "segment"))
    assert(all.count() == base.count() + 10)
    assert(all.filter(col("segment").isNull).count() == base.count())
  }

  test("observe() attaches pipeline telemetry without a second pass") {
    // Production sync-loop observability: row counts / sums ride along on
    // the same job via named observations — no extra action, no extra scan.
    val obs = new org.apache.spark.sql.Observation("sync_metrics")
    val out = graft.sources.Tables.orders(spark, sf)
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(graft.functions.ExactNum.cents(col("o_totalprice"))).as("cents"))
      .filter(col("o_orderstatus") === "F")
    val kept = out.count()
    val m = obs.get
    assert(m("rows_seen") == 1500L) // observed BEFORE the filter
    assert(kept < 1500)
    assert(m("cents").asInstanceOf[Long] > 0)
  }

  test("cents kernels: long headroom quantified; decimal(38) is the " +
    "overflow-safe 100-TB twin and agrees exactly") {
    // The ExactNum money kernels sum scaled-integer cents as Long. That is
    // exact and engine-identical, but a Long sum has finite headroom: at
    // fixture magnitudes (~1e7 cents/row) it survives ~1e11 rows — enough
    // for any graded SF, NOT for a 1e12-row 100 TB money column. The
    // production escape hatch is the same kernel summed as DECIMAL(38,0)
    // (Spark's decimal aggregate is exact; DuckDB's HUGEINT sum mirrors
    // it). Pin both facts: the quantified headroom, and that the decimal
    // twin reproduces the long sum exactly where both are in range.
    val o = graft.sources.Tables.orders(spark, sf)
    val c = graft.functions.ExactNum.cents(col("o_totalprice"))
    val maxCents = o.agg(max(abs(c))).head().getLong(0)
    assert(Long.MaxValue / maxCents > 10_000_000_000L,
      s"headroom ${Long.MaxValue / maxCents} rows")
    val asLong = o.agg(sum(c)).head().getLong(0)
    val asDec = o.agg(sum(c.cast("decimal(38,0)"))).head().getDecimal(0)
    assert(BigDecimal(asDec) == BigDecimal(asLong))
  }

  test("D2 approx: HLL++ distinct count is within its error bound") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05) // 2% rsd, generous bound
  }

  test("d2b_sketches: graded sketch tracks the graded exact d2 within 3×rsd at sf0.1") {
    // The quantitative correctness story for the one rows-only graded entry:
    // per group, |approx − exact| / exact ≤ 3×rsd (rsd = 0.02 in the graded
    // query — three standard errors of the HLL++ estimator, ≈99.7%
    // confidence) against an exact countDistinct over the SAME column
    // (l_orderkey) and grouping the graded sketch uses, computed here at the
    // bench scale factor. (The graded d2_distinct_count counts partkey /
    // suppkey, so the exact side is test-local by necessity.) The per-group
    // cardinalities are in the thousands, so this exercises the estimator
    // where its error bound is meaningful, not on toy counts.
    val big = "/root/testdata/sf0.1"
    val sketch = SparkEntry.queries("d2b_sketches")(spark, big).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.lineitem(spark, big)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.keySet == exact.keySet && sketch.nonEmpty)
    for ((k, approx) <- sketch) {
      val e = exact(k).toDouble
      assert(e > 100, s"group $k too small ($e) for the bound to be meaningful")
      assert(math.abs(approx - e) / e <= 3 * 0.02,
        s"$k: approx $approx vs exact $e exceeds 3×rsd")
    }
  }

  test("D7 approx: percentile_approx brackets the exact median") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"))
      .collect()(0)
    assert(math.abs(r.getDouble(1) - r.getDouble(0)) / r.getDouble(0) < 0.01)
  }

  test("K3 generator surface: flatMap UDTF-style row explosion") {
    import spark.implicits._
    // flatMap as the arbitrary-generator escape hatch (posexplode/inline
    // cover the declarative cases and are used in graded queries).
    val out = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split(" ").take(3).zipWithIndex.map { case (w, i) => (id, i, w) } }
      .toDF("doc_id", "idx", "word")
    assert(out.count() == 1500) // 3 per doc
    assert(out.groupBy("doc_id").count().filter(col("count") =!= 3).count() == 0)
  }

  test("compaction: a 50-file directory rewrites to few files, rows intact") {
    val base = java.nio.file.Files.createTempDirectory("cmp").toString
    val (srcDir, destDir) = (s"$base/small", s"$base/compact")
    val orig = graft.sources.Tables.orders(spark, sf)
    orig.repartition(50).write.mode("overwrite").parquet(srcDir)
    val (before, after) = graft.sources.Maintenance
      .compactParquet(spark, srcDir, destDir, targetBytes = 8L * 1024 * 1024)
    assert(before == 50, s"expected 50 small files, saw $before")
    assert(after < 5, s"compaction left $after files")
    val back = spark.read.parquet(destDir)
    assert(back.count() == orig.count())
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0)
  }

  test("malformed text records surface as nulls/quarantine, never crashes") {
    import spark.implicits._
    // the operational reality of text ingestion at 100 TB: some fraction
    // of lines is always garbage, and a pipeline that throws on line 3
    // of 10^12 is unusable. PERMISSIVE mode (the default) nulls the
    // unparseable fields and banks the raw line in the corrupt-record
    // column for quarantine; counting that column IS the ingest QA gate.
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    val lines = Seq(
      """{"k": 1, "v": "ok"}""",
      """{"k": "not-a-number", "v": "half-bad"}""",
      """not json at all""",
      """{"k": 4, "v": "ok2"}""").toDS()
    val parsed = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(lines)
    assert(parsed.count() == 4) // nothing dropped, nothing thrown
    assert(parsed.filter(col("_corrupt_record").isNotNull).count() == 2)
    assert(parsed.filter(col("k").isNotNull).count() == 2)
    // and the strict variant for when garbage must not pass silently
    val strict = spark.read.schema(schema.copy(fields = schema.fields.take(2)))
      .option("mode", "DROPMALFORMED").json(lines)
    assert(strict.count() == 2)
  }

  test("A9 mergeSchema: each generation null-fills exactly its missing columns") {
    val merged = SparkEntry.queries("a9_schema_evolution")(spark, sf)
    val nSup = graft.sources.Tables.supplier(spark, sf).count()
    assert(merged.count() == 2 * nSup)
    // gen 1 files never carried s_acctbal; gen 2 files never carried
    // s_nationkey — mergeSchema must null-fill precisely those, and only
    // those (a value leaking across generations would mean file footers
    // were merged by position, not by name)
    assert(merged.filter(col("gen") === 1 && col("s_acctbal").isNotNull).count() == 0)
    assert(merged.filter(col("gen") === 1 && col("s_nationkey").isNull).count() == 0)
    assert(merged.filter(col("gen") === 2 && col("s_nationkey").isNotNull).count() == 0)
    assert(merged.filter(col("gen") === 2 && col("s_acctbal").isNull).count() == 0)
  }

  test("A10 binaryFile: fingerprints match the source text and the fixture " +
    "build is skipped once the marker exists") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val n = docs.count()
    val dir = graft.sources.ScratchDirs.dirFor(sf, s"bin_n$n")
    val first = SparkEntry.queries("a10_binary_ingest")(spark, sf)
    // file bytes are the UTF-8 text: md5 and byte length must agree with
    // a pure in-engine computation over the source table (multi-byte langs
    // included — the fixture has zh docs)
    val expected = docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      md5(col("text").cast("binary")).as("content_md5"))
    assert(first.count() == n)
    assert(first.exceptAll(expected).count() == 0 &&
      expected.exceptAll(first).count() == 0)
    // rebuild skip: the marker's mtime must survive a second invocation
    // (the corpus write is once-per-fixture, not once-per-query-run)
    val marker = new java.io.File(dir, "_BUILT")
    assert(marker.exists())
    val mtime = marker.lastModified()
    SparkEntry.queries("a10_binary_ingest")(spark, sf).count()
    assert(marker.lastModified() == mtime)
  }

  test("A18 z key: zValue equals the bit-interleave model") {
    import spark.implicits._
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (123456L, 654321L), (2097151L, 2097151L), (1L, 2097151L),
      (99999L, 7L))
    def model(x: Long, y: Long): Long =
      (0 until 21).map(i =>
        (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
      ).reduce(_ | _)
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    samples.foreach { case (x, y) =>
      assert(got((x, y)) == model(x, y), s"z mismatch at ($x,$y)")
    }
  }

  test("A18 pruning: a partkey band touches a bounded file fraction of the " +
      "z-ordered layout; a z-blind layout scatters it across every file") {
    // layout properties live here, not in the oracle gate (file census is
    // layout, not data). Build the graded layout, then compare the set of
    // files a narrow l_partkey band lives in against a round-robin rewrite
    // of the same table at the same file count.
    SparkEntry.queries("a18_zorder_roundtrip")(spark, sf).count()
    val zdir = graft.sources.ScratchDirs.dirFor(sf, "zorder")
    val li = graft.sources.Tables.lineitem(spark, sf)
    val lo = 0L
    val hi = li.agg(max("l_partkey")).collect()(0).getLong(0) / 8
    def filesTouched(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
      val all = df.select("f").distinct().count()
      val touched = df.filter(col("l_partkey").between(lo, hi))
        .select("f").distinct().count()
      (touched, all)
    }
    val (zTouched, zAll) = filesTouched(zdir)
    val blind = java.nio.file.Files.createTempDirectory("zblind").toString
    li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity")
      .repartition(zAll.toInt).write.mode("overwrite").parquet(blind)
    val (bTouched, bAll) = filesTouched(blind)
    assert(bTouched == bAll, s"z-blind layout should scatter: $bTouched/$bAll")
    assert(zTouched * 2 <= zAll,
      s"z layout did not cluster the band: $zTouched of $zAll files " +
        s"(blind: $bTouched/$bAll)")
  }
}
