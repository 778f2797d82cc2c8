package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards over EVERY graded query (SURVEY.md §4).
  * Correctness gates can't see a plan that silently degrades — a lost
  * broadcast, a filter that stops reaching the parquet scan, a join that
  * falls back to a cartesian product — so the shapes that matter at 100 TB
  * are pinned here, from a PlanSurvey run over the full registry. A failure
  * means the plan changed, not necessarily that it's wrong: re-run
  * `sbt "runMain graft.PlanSurvey"`, check the new shape is intended, and
  * re-pin.
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  // One executed (AQE-finalized) plan string + output schema per graded
  // query. collect() on the same QueryExecution is required — count()
  // would plan separately.
  private lazy val built: Map[String, (String, org.apache.spark.sql.types.StructType)] =
    SparkEntry.queries.map { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect()
      name -> ((df.queryExecution.executedPlan.toString, df.schema))
    }
  private lazy val plans: Map[String, String] =
    built.view.mapValues(_._1).toMap

  // Nested-loop joins that are *intentional*: each broadcasts a provably
  // tiny side (a dim grid, the k-NN query set, a single-row corpus count,
  // the constant random-projection sign matrix, a5's one-row page bounds).
  private val allowedNestedLoop =
    Set("c9_cross", "j3_topk_cosine", "lsh_ivf_topk", "ta_tfidf", "emb_rproject",
      "a5_paginate", "lsh_rp_near_dup", "sem_dedup", "ta_unigram_logprob",
      "pp_quality_funnel",
      // IVF-index consumers broadcast the nlist-sized centroid grid;
      // multiprobe broadcasts the constant sign matrix — same tiny sides.
      "lsh_ivf_refined", "lsh_emb_near_dup", "lsh_rp_multiprobe",
      // broadcasts the single-row vocabulary count, like ta_unigram_logprob
      "ta_bigram_logprob",
      // each FK edge cross-combines two single-row aggregates
      "c11_ref_integrity",
      // broadcasts the single-row decile-boundary aggregate
      "pp_score_calibration",
      // cross-combines the single-row token-budget aggregate
      "tp_token_budget",
      // cross-combines the langs-sized weight frame with its one total row
      "tp_temperature_mix",
      // broadcasts the nq-sized query set (and the m·k-row ADC table) —
      // the same bounded-query-set shape as lsh_ivf_topk; the refined
      // variant additionally broadcasts the nq·candK candidate pool
      "lsh_ivfpq_topk", "lsh_ivfpq_refined",
      // cross-combines the single-row total-token-mass aggregate with the
      // ≤ k Misra–Gries candidates — both sides provably tiny
      "d13_heavy_hitters",
      // cross-combines the single-row bigram-total aggregate (the PMI
      // denominator) with the frequent-bigram frame
      "ta_pmi",
      // rides the IVF assignment build, which broadcasts the nlist-sized
      // centroid grid — same tiny side as lsh_ivf_refined
      "emb_kmeans_report",
      // broadcasts the nq-sized query set against the corpus scan — the
      // same bounded-query brute-force shape as j3_topk_cosine
      "emb_matryoshka", "emb_bq_rerank",
      // cross-combines the single-row total-bigram-types aggregate (the
      // KN continuation denominator), like ta_bigram_logprob's voc row
      "ta_kn_bigram",
      // cross-combines the single-row target/raw mass totals with the
      // 256-row bucket model
      "tp_dsir",
      // cross-combines the single-row calendar min/max bounds with the
      // distinct-types frame to generate the spine
      "i15_backfill",
      // cross-combines the single-row total-users/total-cents aggregate
      // with the revenue-tick histogram
      "e19_concentration",
      // cross-combines the single-row N / max-abs / norm aggregates and
      // broadcasts the 64-row weight vector per power-iteration round —
      // all model-sized
      "emb_pca_top1",
      // same model-sized cross-combines as emb_pca_top1, plus the
      // single-row Rayleigh numerator/denominator frames of the deflation
      "emb_pca_topk",
      // each merge round cross-combines the single-row winner pair
      "ta_bpe_merge", "ta_bpe_compress",
      // rides unigramLogprobOf's single-row vocabulary-total combine
      "ta_ppl_buckets",
      // cross-combines the single-row N·avgdl aggregate with the
      // query-term-filtered posting rows
      "ta_bm25",
      // cross-combines two single-row rule aggregates, like c11's audits
      "d15_dq_report",
      // ta_heaps rode BandedScan's former band+stitch broadcast range-join;
      // the single-reference scan form has no such join — entry kept only
      // as an allowlist (it permits, never requires)
      "ta_heaps")

  // Shuffle joins that are *correct at scale*: full-outer reconciliations
  // can't broadcast either side, and lsh_rp_near_dup's candidate join is a
  // data-sized × data-sized EQUI join on (band, band_val) — hash-partitioned
  // by bucket, exactly the shape that replaces all-pairs; broadcasting it
  // would be wrong at 100 TB. (The no-cartesian test above still pins that
  // it never degrades past an equi join.)
  // dd_keep_one's semi join prunes a corpus-sized table against a
  // corpus-sized keep set (most clusters are singletons) — broadcasting
  // either side would be wrong at scale.
  // sem_dedup's in-cell pair join and its survivor anti join are both
  // corpus-sized × corpus-sized equi joins (on cell / vec_id) — the
  // Σ|cell|² bound IS SemDeDup's design; broadcasting would be wrong.
  // pp_quality_funnel joins corpus-sized per-doc signal frames back on the
  // primary key (doc_id) — co-partitioned equi joins at scale, never
  // broadcast.
  private val allowedSortMerge =
    Set("c4_join_full", "i8_snapshot_diff", "lsh_rp_near_dup", "dd_keep_one",
      "sem_dedup", "pp_quality_funnel",
      // same corpus×corpus equi-join shapes as sem_dedup / lsh_rp_near_dup
      "lsh_emb_near_dup", "lsh_rp_multiprobe",
      // simhash chunk-bucket candidate join: data-sized × data-sized equi
      // join on (chunk, chunk_val) — the banded-index shape; at test SF the
      // cached signature frame broadcasts, at scale a shuffle join is right
      "lsh_simhash_pairs",
      // the estimate audit rides the same band-bucket candidate join plus
      // signature/inverted-index joins on the doc pk — all corpus-sized
      // equi joins, co-partitioned at scale; broadcasting would be wrong
      "lsh_minhash_est",
      // the coverage anti join (tokens × covered positions, both
      // corpus-sized — coverage scales with duplicated volume) and the
      // span-free-doc restore join (corpus × corpus on the pk) — shuffle
      // equi joins are the correct 100-TB shapes, like dd_keep_one's
      "dd_substr_cut",
      // the incremental-relabel join is stored-corpus × delta-touched on
      // the component key (plus the contraction probes on the vertex pk) —
      // the relabel map is data-dependent (a crawl increment can touch
      // arbitrarily many components), so the shuffle equi join is the
      // correct 100-TB shape, exactly dd_keep_one's class
      "dd_components_incr",
      // the funnel ladder chains user-population-sized first-reach frames
      // on the user_id pk — co-partitioned shuffle equi joins at scale
      // (users are data-sized; broadcasting them would be wrong)
      "e7_funnel", "e7b_funnel_window",
      // the triangle wedge/closure joins are edge-set × edge-set equi
      // joins (|E| ≤ 5N by the kNN degree cap, but still data-sized on
      // both sides — broadcasting an edge list would be wrong at scale),
      // and the per-order supplier pairing is a data×data self equi join
      // on the order pk
      "gr_knn_triangles",
      // rides the same edge-set × edge-set triangle joins plus a
      // vertex-sized degree join on the vertex pk — the gr_knn_triangles
      // class; broadcasting a 100 TB graph's edges would be wrong
      "gr_clustering_coef",
      // each power-iteration round is rank ⋈ edges — BOTH sides are
      // vertex/edge-set-sized (and co-keyed on the vertex id), so the
      // shuffle equi-join IS the scale plan; broadcasting a 100 TB
      // corpus's edge list would be wrong. Locally the cached frames are
      // tiny and sometimes broadcast anyway — both shapes are legitimate.
      "gr_pagerank",
      // same class: each Bellman-Ford round is dist ⋈ edges on the vertex
      // id — vertex-sized × edge-set-sized co-keyed equi join
      "gr_sssp",
      // the 2-hop wedge join and the strictly-2-hop anti join are both
      // capped-adjacency × capped-adjacency equi joins on the vertex id
      // (Σ deg² ≤ capM²·|V|) — the gr_node_sim class; broadcasting a
      // 100 TB graph's adjacency would be wrong
      "gr_harmonic",
      // the POINT of the query: the salted join is hinted shuffle_hash so
      // the hot-key sharding demonstrably shuffles instead of broadcasting
      // the test-SF dim (at scale the dim is too big to broadcast)
      "c12_salted_join",
      // full-outer reconciliations on the partition/entity key — neither
      // side broadcastable, same class as c4_join_full / i8_snapshot_diff
      "i12_reconcile", "i13_precedence_merge",
      // the full-CDC visible-set diff is the same full-outer class (two
      // key-unique snapshots on the pk)
      "a17_delete_feed",
      // the candidate scoring join rides the corpus-sized code table on
      // the vec_id pk — a co-partitioned equi join at scale; broadcasting
      // a 100 TB corpus's codes would be wrong
      "lsh_ivfpq_topk", "lsh_ivfpq_refined",
      // the POINT of the query: a bucketed sort-merge join with zero
      // exchange below it (its own test pins the no-reshuffle property)
      "c15_bucket_join")

  test("no query ever executes a cartesian product") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian product in: $offenders")
  }

  test("nested-loop joins appear only where a tiny side is broadcast") {
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") &&
        !allowedNestedLoop(n) => n
    }
    assert(offenders.isEmpty, s"unexpected nested-loop join in: $offenders")
  }

  test("shuffle joins appear only in the full-outer reconciliations") {
    val offenders = plans.collect {
      case (n, p) if (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")) &&
        !allowedSortMerge(n) => n
    }
    assert(offenders.isEmpty,
      s"join lost its broadcast (shuffle join) in: $offenders")
  }

  test("every graded query runs under whole-stage codegen") {
    // codegen'd stages print as "*(id) Node" prefixes in the executed plan
    val offenders = plans.collect {
      case (n, p) if !"\\*\\(\\d+\\)".r.findFirstIn(p).isDefined => n
    }
    assert(offenders.isEmpty, s"no codegen span in: $offenders")
  }

  test("filters reach the parquet scan where the query filters a base table") {
    val mustPush = Seq("b2_filter_compound", "b8_encoded_query", "b9_encoded_nq",
      "c1_join_broadcast", "c2_star_join", "d1_pricing_summary",
      "i6_delta_filter", "j6_quality_filter")
    val offenders = mustPush.filterNot(n =>
      "PushedFilters: \\[[^\\]]".r.findFirstIn(plans(n)).isDefined)
    assert(offenders.isEmpty, s"no pushed filters in: $offenders")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plans("f2_topk").contains("TakeOrderedAndProject"))
    assert(!plans("f2_topk").contains("Exchange"))
  }

  test("column pruning reaches the scan: d1 reads only the 7 needed columns") {
    val readSchemas = "ReadSchema: [^\\n]*".r
      .findAllIn(plans("d1_pricing_summary")).toList
    assert(readSchemas.nonEmpty)
    assert(!readSchemas.exists(_.contains("l_partkey")),
      s"d1 scan reads pruned-out columns: $readSchemas")
  }

  test("the round-5 newcomers stay window-free: expand/agg, never a global sort") {
    // Each of these is a deliberate window-avoidance design: e15 is
    // expand-then-aggregate (a window can't do a moving DISTINCT without
    // per-window rescans), gr_node_sim is wedge-join + hash aggregates,
    // ta_novelty is a per-shingle min + per-doc roll-up. A Window node
    // appearing in any of them means the shape regressed toward a sorted
    // per-partition pass that doesn't exist in the 100-TB plan.
    assert(!plans("e15_sliding_distinct").contains("Window"),
      "e15 grew a window node")
    // ta_novelty's windows all come from the cached shingle INPUT frame and
    // must stay doc_id-partitioned (one shuffle, bounded per-doc frames);
    // the novelty computation itself is hash aggregates + one equi join.
    val novWins = plans("ta_novelty").split("\n")
      .map(_.trim.stripPrefix("+- ").stripPrefix(":- "))
      .filter(_.startsWith("Window ")).distinct
    assert(novWins.forall(_.contains("windowspecdefinition(doc_id#")),
      s"ta_novelty grew a non-doc-partitioned window:\n${novWins.mkString("\n")}")
    for (q <- Seq("e15_sliding_distinct", "ta_novelty"))
      assert(plans(q).contains("HashAggregate"), s"$q lost its hash aggregate")
    // gr_node_sim's windows are exactly two vertex-partitioned top-m caps
    // (bounded fan-out both times): the cached knnEdges INPUT construction
    // (per-supplier top-5 on s) and neighborSimOf's symmetrized-adjacency
    // re-cap (top-10 on u — the wedge-key bound); the similarity
    // computation itself adds none.
    val simWins = plans("gr_node_sim").split("\n")
      .map(_.trim.stripPrefix("+- ").stripPrefix(":- "))
      .filter(_.startsWith("Window ")).distinct
    assert(simWins.length == 2 &&
        simWins.exists(_.contains("windowspecdefinition(s#")) &&
        simWins.exists(_.contains("windowspecdefinition(u#")),
      s"gr_node_sim window set changed:\n${simWins.mkString("\n")}")
    assert(plans("gr_node_sim").contains("HashAggregate"))
    // e15's ×7 expansion must be a Generate (explode of the 7 covering
    // window starts), not a range join against a calendar table.
    assert(plans("e15_sliding_distinct").contains("Generate"),
      "e15 lost its explode-based expansion")
  }

  test("no graded ANN ranker contains a corpus-sized per-query window: " +
      "the brute-force rankers are window-free partial top-k") {
    // j3 / matryoshka / bq_rerank rank with the TopKAscAggregator (map-side
    // reduction to ≤ k rows per query), so a Window node reappearing in any
    // of them means the plan regressed to row_number() over a partition
    // that holds the ENTIRE scored corpus per query — one reducer sorting
    // N rows per query at 100×. The remaining ANN windows (IVF family) are
    // cell-/bucket-bounded by construction and carry their own rationale.
    for (q <- Seq("j3_topk_cosine", "emb_matryoshka", "emb_bq_rerank")) {
      assert(!plans(q).contains("Window"),
        s"$q grew a window node back:\n${plans(q)}")
      assert(plans(q).contains("Aggregate"), s"$q lost its partial top-k aggregate")
    }
  }

  test("c15's bucket join runs with zero exchange on the join key") {
    // The point of the bucketed layout: the sort-merge join's distribution
    // requirement is satisfied straight off disk. Any Exchange
    // hashpartitioning on the customer key means the layout stopped being
    // used (bucket metadata lost, bucket counts diverged, or the scan
    // stopped being bucket-aware) — the exact regression this guards.
    val p = plans("c15_bucket_join")
    assert(p.contains("SortMergeJoin"), "c15 lost its sort-merge join")
    val keyShuffles = p.split("\n").filter(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("o_custkey") || l.contains("c_custkey")))
    assert(keyShuffles.isEmpty,
      s"c15 re-shuffles on the bucket key:\n${keyShuffles.mkString("\n")}")
  }

  test("k4's SQL path rewrites dot_product(v,v) to squared_norm") {
    // DotSelfToNorm must fire through the SQL surface: the executed plan
    // carries a squarednorm over the self pair, and the only remaining
    // dotproduct is the (v, reverse(v)) one.
    val p = plans("k4_sql_vector").toLowerCase
    assert(p.contains("squarednorm"), "DotSelfToNorm did not fire via SQL")
    assert(p.contains("dotproduct"), "the two-array dot_product disappeared")
  }

  test("the span detector's nine lead()s collapse into ONE window pass") {
    // the k-gram builder chains 9 withColumn(lead(th, i)) over the same
    // (doc_id, pos) window spec; CollapseWindow must merge them — nine
    // WindowExecs would mean nine sorts of the token stream. The executed
    // plan re-prints cached subtrees per consumer, so count DISTINCT
    // window nodes, not raw occurrences.
    val winLines = plans("dd_substr_spans").split("\n")
      .map(_.trim.stripPrefix("+- ").stripPrefix(":- "))
      .filter(_.startsWith("Window ")).distinct
    assert(winLines.length == 2, // gram lead-chain + diagonal islands
      s"dd_substr_spans has ${winLines.length} distinct window nodes " +
        s"(expected gram+island = 2):\n${winLines.mkString("\n")}")
  }

  test("graded-output type contract holds for EVERY registry query " +
      "(SURVEY.md §7.4 #10)") {
    // The d14 lesson, enforced rather than documented: graded outputs may
    // use only the five type classes with proven cross-engine hashing.
    // DECIMAL, arrays, maps, structs, booleans, floats etc. must stay in
    // spec-proven twins — any engine-inferred representation detail in a
    // graded column is a latent driver-side hash failure. tc_type_canary
    // checks the classes' hashing; this test checks the CLOSURE (no query
    // can drift outside the contract unnoticed).
    import org.apache.spark.sql.types._
    val allowed: Set[DataType] =
      Set(StringType, LongType, IntegerType, DoubleType, TimestampType)
    val violations = built.toSeq.sortBy(_._1).flatMap { case (name, (_, sch)) =>
      sch.fields.collect {
        case f if !allowed.contains(f.dataType) =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(violations.isEmpty,
      s"graded outputs outside the §7.4 #10 type contract:\n" +
        violations.mkString("\n"))
  }

  test("plan-build job audit: a builder that runs jobs at warm plan build " +
      "must be tagged eager or fixture-writer (Bench timing honesty)") {
    // The a12/dd_components mis-timing bug class, enforced rather than
    // remembered: Bench pre-builds every plan once and times only count();
    // a builder whose graded work happens at CONSTRUCTION (a write, a
    // drain, a driver-side fixpoint) must therefore be in
    // SparkEntry.eagerQueries (rebuilt inside the timing) or be a
    // documented buildTimeFixtureWriter (write is prep, the graded artifact
    // is the read-back). Everything else must construct its plan without
    // running a single Spark job. The first build of a query may pay a
    // shared memoized index (components/kNN/IVF frames — whoever builds
    // first pays, the documented serving shape), so the audit counts jobs
    // on a SECOND, warm build only.
    val audited = (SparkEntry.queries.keySet --
      SparkEntry.eagerQueries -- SparkEntry.buildTimeFixtureWriters).toSeq.sorted
    audited.foreach(n => SparkEntry.queries(n)(spark, sf)) // warm pass
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    org.apache.spark.GraftBusAccess.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      val violations = audited.flatMap { n =>
        jobs.set(0)
        SparkEntry.queries(n)(spark, sf)
        org.apache.spark.GraftBusAccess.drain(spark.sparkContext)
        val k = jobs.get()
        if (k > 0) Some(s"$n ran $k job(s) at warm plan build") else None
      }
      assert(violations.isEmpty,
        "untagged side-effecting builders (add to the module's `eager` tag " +
          "or, if the write is documented fixture prep, to " +
          s"buildTimeFixtures):\n${violations.mkString("\n")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("every streaming-graded query is eager by construction, and the " +
      "tags reference real registry entries") {
    val eager = SparkEntry.eagerQueries
    assert(graft.streaming.StreamingGraded.queries.keySet.subsetOf(eager))
    val ghosts = (eager ++ SparkEntry.buildTimeFixtureWriters) --
      SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"eager/fixture tags without a registry entry: $ghosts")
  }
}
