package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5 layer 3) — the operators are
  * checked against executable Scala models on randomly generated inputs,
  * which catches semantic edge cases fixed fixtures can't (ties, empty
  * groups, single-element sessions).
  */
object GraftProperties extends Properties("graft") {

  // Each sample runs real Spark jobs — keep the sample count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark

  private val opsGen: Gen[List[(Int, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0, 5)
      ts <- Gen.choose(0L, 50L) // small range → frequent ts ties
    } yield (k, ts))

  property("upsert is last-writer-wins against a Map model") = forAll(opsGen) { ops =>
    import spark.implicits._
    if (ops.isEmpty) true
    else {
      val rows = ops.zipWithIndex.map { case ((k, ts), id) => (k, ts, id.toLong) }
      // model: fold in arrival order, keep max by (ts, id)
      val model = rows.groupBy(_._1).map { case (k, g) =>
        k -> g.maxBy(r => (r._2, r._3))._3
      }
      val w = Window.partitionBy("k").orderBy(col("ts").desc, col("id").desc)
      val got = rows.toDF("k", "ts", "id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("k", "id").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      got == model
    }
  }

  property("exact dedup is idempotent and keeps one row per normalized text") =
    forAll(Gen.listOfN(25, Gen.oneOf("a b c", " a b c ", "A B C", "x y", "x  y"))) { texts =>
      import spark.implicits._
      if (texts.isEmpty) true
      else {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        def dedup(d: org.apache.spark.sql.DataFrame) = {
          val w = Window.partitionBy("h").orderBy("doc_id")
          d.withColumn("h", md5(lower(trim(col("text")))))
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .drop("rn")
        }
        val once = dedup(df)
        val twice = dedup(once.select("doc_id", "text"))
        val distinctNorms = texts.map(_.trim.toLowerCase).distinct.size
        once.count() == distinctNorms && twice.count() == once.count()
      }
    }

  property("sessionization matches a sequential fold model") =
    forAll(Gen.listOfN(20, Gen.choose(0L, 2000L))) { tsRaw =>
      import spark.implicits._
      val ts = tsRaw.distinct.sorted
      if (ts.isEmpty) true
      else {
        val gap = 100L
        // model: sequential fold over sorted times
        val modelSessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head <= gap) (t :: acc.head) :: acc.tail
          else List(t) :: acc
        }
        val byTime = Window.partitionBy("u").orderBy("ts")
        val run = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val got = ts.map((1, _)).toDF("u", "ts")
          .withColumn("new_sess",
            when(col("ts") - lag(col("ts"), 1).over(byTime) > gap, 1)
              .otherwise(when(lag(col("ts"), 1).over(byTime).isNull, 1).otherwise(0)))
          .withColumn("sid", sum(col("new_sess")).over(run))
          .groupBy("sid").agg(count(lit(1)).as("n"))
          .select("n").as[Long].collect().sorted.toList
        got == modelSessions.map(_.size.toLong).sorted
      }
    }

  property("intersect/except match Scala Set semantics") =
    forAll(Gen.listOfN(20, Gen.choose(0, 8)), Gen.listOfN(20, Gen.choose(0, 8))) {
      (xs, ys) =>
        import spark.implicits._
        val l = xs.toDF("k")
        val r = ys.toDF("k")
        val inter = l.intersect(r).as[Int].collect().toSet
        val exc = l.except(r).as[Int].collect().toSet
        inter == (xs.toSet intersect ys.toSet) && exc == (xs.toSet diff ys.toSet)
    }

  // Random encoded-query trees vs a direct Scala evaluation of the same
  // grammar: `^OR` binds to its left neighbor, `^` ANDs the groups, `^NQ`
  // ORs whole alternatives — on random data including empty strings.
  private case class ECond(frag: String, eval: (String, Long) => Boolean)
  private val econdGen: Gen[ECond] = Gen.oneOf(
    Gen.choose(0L, 9L).map(v => ECond(s"num=$v", (_, n) => n == v)),
    Gen.choose(0L, 9L).map(v => ECond(s"num!=$v", (_, n) => n != v)),
    Gen.choose(0L, 9L).map(v => ECond(s"num>$v", (_, n) => n > v)),
    Gen.choose(0L, 9L).map(v => ECond(s"num<=$v", (_, n) => n <= v)),
    Gen.zip(Gen.choose(0L, 5L), Gen.choose(4L, 9L)).map { case (a, b) =>
      ECond(s"numBETWEEN$a@$b", (_, n) => n >= a && n <= b) },
    Gen.someOf(0L to 9L).suchThat(_.nonEmpty).map(vs =>
      ECond(s"numIN${vs.mkString(",")}", (_, n) => vs.contains(n))),
    Gen.oneOf("alpha", "beta", "gam").map(v =>
      ECond(s"name=$v", (s, _) => s == v)),
    Gen.oneOf("al", "be", "ga").map(v =>
      ECond(s"nameSTARTSWITH$v", (s, _) => s.startsWith(v))),
    Gen.oneOf("a", "ta", "ha").map(v =>
      ECond(s"nameENDSWITH$v", (s, _) => s.endsWith(v))),
    Gen.oneOf("a", "m", "et").map(v =>
      ECond(s"nameLIKE$v", (s, _) => s.contains(v))),
    Gen.const(ECond("nameISEMPTY", (s, _) => s.isEmpty)),
    Gen.const(ECond("nameISNOTEMPTY", (s, _) => s.nonEmpty)))
  private val egroupGen = Gen.choose(1, 3).flatMap(Gen.listOfN(_, econdGen))
  private val ealtGen = Gen.choose(1, 3).flatMap(Gen.listOfN(_, egroupGen))

  property("encoded-query compiler matches a direct grammar evaluation") =
    forAll(
      Gen.listOfN(25, Gen.zip(Gen.oneOf("alpha", "beta", "", "gamma", "meta"),
        Gen.choose(0L, 9L))),
      Gen.choose(1, 2).flatMap(Gen.listOfN(_, ealtGen))) { (rows, alts) =>
      import spark.implicits._
      val q = alts.map(_.map(g => g.map(_.frag).mkString("^OR"))
        .mkString("^")).mkString("^NQ")
      val df = rows.toDF("name", "num")
      val got = graft.api.EncodedQuery.applyTo(df, q)
        .as[(String, Long)].collect().sorted.toList
      val want = rows.filter { case (s, n) =>
        alts.exists(_.forall(_.exists(_.eval(s, n))))
      }.sorted
      got == want
    }

  property("stop-shingle df cap bounds inverted-index pair blow-up") =
    forAll(Gen.choose(8, 16)) { n =>
      import spark.implicits._
      // every doc shares one hot trigram ("hot stop phrase"); all other
      // shingles are per-doc unique, all docs land in the same (lang, blk)
      // block — uncapped, the hot shingle alone manufactures all C(n,2)
      // candidate pairs; capped, it is dropped and no pair survives.
      val docs = (0 until n).map(i =>
        (i.toLong, "en", s"u${i}a u${i}b u${i}c hot stop phrase u${i}d u${i}e u${i}f"))
        .toDF("doc_id", "lang", "text")
      val uncapped = operators.LlmOps.jaccardPairsOf(docs, 0.0001, maxDf = n).count()
      val capped = operators.LlmOps.jaccardPairsOf(docs, 0.0001, maxDf = 5).count()
      uncapped == n.toLong * (n - 1) / 2 && capped == 0L
    }

  property("length-bucket batching: capacity always covers tokens, never " +
    "over-provisions a batch") =
    forAll(Gen.listOfN(40, Gen.choose(1, 4000))) { lens =>
      import spark.implicits._
      val docs = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      // drive the same arithmetic the graded query runs, over random lengths
      val rows = docs
        .select(size(split(col("text"), " ")).as("n_toks"))
        .withColumn("bucket", expr("n_toks div 64").cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_toks"))
        .withColumn("upper", ((col("bucket") + 1) * 64).cast("long"))
        .withColumn("spb", greatest(lit(1L), expr("8192 div upper")))
        .withColumn("nb", expr("(n_docs + spb - 1) div spb"))
        .collect()
      rows.forall { r =>
        val (nd, st, up, spb, nb) = (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_toks"),
          r.getAs[Long]("upper"), r.getAs[Long]("spb"), r.getAs[Long]("nb"))
        // capacity covers all tokens; dropping one batch would not
        nb * spb * up >= st && (nb - 1) * spb < nd
      }
    }

  property("semi and anti joins partition the left side") =
    forAll(Gen.listOfN(15, Gen.choose(0, 10)), Gen.listOfN(15, Gen.choose(0, 10))) {
      (left, right) =>
        import spark.implicits._
        if (left.isEmpty) true
        else {
          val l = left.zipWithIndex.toDF("k", "id")
          val r = right.toDF("k")
          val semi = l.join(r, Seq("k"), "left_semi").count()
          val anti = l.join(r, Seq("k"), "left_anti").count()
          semi + anti == left.size &&
            semi == left.count(right.toSet.contains)
        }
    }

  // c12's legality claim, generalized: the graded query fixes 16 shards,
  // but shard-then-merge must be invisible for ANY shard count and any
  // key/value distribution (hot keys, missing dim keys, shards=1).
  property("salted join equals the plain join for any shard count") =
    forAll(
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 6), Gen.choose(0L, 100L))),
      Gen.choose(1, 32)) { (rows, shards) =>
      import spark.implicits._
      if (rows.isEmpty) true
      else {
        val fact = rows.zipWithIndex
          .map { case ((k, v), i) => (i.toLong, k, v) }.toDF("pk", "k", "v")
        val dim = (0 to 4).map(k => (k, s"dim$k")).toDF("k", "name") // 5,6 dangle
        val salted = fact
          .withColumn("salt", pmod(hash(col("pk")), lit(shards)))
          .join(dim.withColumn("salt",
            explode(sequence(lit(0), lit(shards - 1)))).hint("shuffle_hash"),
            Seq("k", "salt"))
          .groupBy("k", "name").agg(sum("v").as("sv"), count(lit(1)).as("n"))
        val plain = fact.join(dim, Seq("k"))
          .groupBy("k", "name").agg(sum("v").as("sv"), count(lit(1)).as("n"))
        salted.except(plain).isEmpty && plain.except(salted).isEmpty
      }
    }

  // Random docs over a 4-word alphabet: short texts and heavy bigram overlap
  // force signature collisions, near-misses, and empty-signature dropouts.
  private val docsGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))

  property("simhash chunk index equals brute-force hamming pairs (pigeonhole)") =
    forAll(docsGen) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sigs = graft.operators.Lsh.simhashBigramSigs(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // model: all pairs of signature-bearing docs within hamming <= 2
      val model = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 2
      } yield (a, b, h)).toSet
      val got = graft.operators.Lsh.simhashPairsOf(docs, maxHamming = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
      got == model
    }

  property("boilerplate coverage matches a direct shingle-df model") =
    forAll(docsGen) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
        .toDF("doc_id", "text", "lang")
      // model: distinct 3-gram strings per doc, df across docs, count >= 2
      val shingles: Map[Long, Set[String]] = texts.zipWithIndex.map { case (t, i) =>
        val w = t.split(" ")
        i.toLong -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
      val df = shingles.values.flatten.groupBy(identity).map { case (s, g) => s -> g.size }
      val model = shingles.collect { case (id, sh) if sh.nonEmpty =>
        id -> ((sh.size.toLong, sh.count(df(_) >= 2).toLong))
      }
      val got = graft.operators.LlmOps.boilerplateOf(docs, minDf = 2)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got == model
    }

  property("funnel matches the min-ts ladder model under timestamp ties") =
    forAll(Gen.listOfN(24, for {
      u <- Gen.choose(1L, 3L)
      ty <- Gen.oneOf("view", "click", "purchase", "error")
      ts <- Gen.choose(0L, 8L) // tiny range → constant ties
    } yield (u, ty, ts))) { evs =>
      import spark.implicits._
      val stages = Seq("view", "click", "purchase")
      // unambiguous reference: stage i's first reach = min ts of a stage-i
      // event STRICTLY after stage i−1's first reach
      val model = evs.groupBy(_._1).map { case (u, es) =>
        var last = Long.MinValue
        var stage = 0
        var halt = false
        stages.foreach { st =>
          if (!halt) {
            val cand = es.collect { case (_, t, ts) if t == st && ts > last => ts }
            if (cand.isEmpty) halt = true
            else { last = cand.min; stage += 1 }
          }
        }
        u -> stage
      }
      val df = evs.toDF("user_id", "event_type", "sec")
        .select(col("user_id"), col("event_type"),
          timestamp_seconds(col("sec")).as("ts"))
      val got = graft.operators.WindowedAnalytics.funnelOf(df, stages)
        .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
      evs.isEmpty || got == model
    }

  property("dot-walk compiler equals a manual join on random FK data, " +
    "including dangling references") = forAll(for {
      nChild <- Gen.choose(1, 25)
      nDim <- Gen.choose(1, 8)
      fks <- Gen.listOfN(25, Gen.choose(0, 11)) // some FKs dangle (>= nDim)
      pick <- Gen.choose(0, 7)
    } yield (nChild, nDim, fks, pick)) { case (nChild, nDim, fks, pick) =>
      import spark.implicits._
      import graft.api.EncodedQuery.Ref
      val child = (0 until nChild).map(i => (i.toLong, fks(i).toLong))
        .toDF("id", "fk")
      val dim = (0 until nDim).map(i => (i.toLong, s"name$i"))
        .toDF("pk", "dname")
      val q = s"parent.dname=name$pick"
      val walked = graft.api.EncodedQuery
        .applyTo(graft.api.EncodedQuery.resolveRefs(child,
          Seq(Ref("parent", "fk", dim, "pk"))), q)
        .select("id").collect().map(_.getLong(0)).toSet
      val manual = child.join(dim, col("fk") === col("pk"))
        .filter(col("dname") === s"name$pick")
        .select("id").collect().map(_.getLong(0)).toSet
      // and ISEMPTY finds exactly the dangling references
      val orphans = graft.api.EncodedQuery
        .applyTo(graft.api.EncodedQuery.resolveRefs(child,
          Seq(Ref("parent", "fk", dim, "pk"))), "parent.dnameISEMPTY")
        .select("id").collect().map(_.getLong(0)).toSet
      val expectOrphans = (0 until nChild).filter(i => fks(i) >= nDim)
        .map(_.toLong).toSet
      walked == manual && orphans == expectOrphans
    }

  property("volume monitor matches a sequential trailing-window model on " +
    "random daily counts") = forAll(for {
      nDays <- Gen.choose(8, 20)
      counts <- Gen.listOfN(20, Gen.choose(1, 40))
    } yield (nDays, counts)) { case (nDays, counts) =>
      import spark.implicits._
      // one synthetic type, counts(i) events on day i
      val rows = (0 until nDays).flatMap { day =>
        (0 until counts(day)).map { j =>
          (day.toLong * 1000 + j,
            java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00"),
            1L, "click", 1.0, "{}")
        }
      }
      if (rows.isEmpty) true
      else {
        val df = rows.toDF("event_id", "ts", "user_id", "event_type",
          "value", "props")
        val w = Window.partitionBy("event_type")
          .orderBy("day").rowsBetween(-7, -1)
        val daily = df.groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("base7", sum(col("n")).over(w))
          .withColumn("nprior", count(col("n")).over(w))
          .filter(col("nprior") === 7)
          .select(col("day"), col("n"), col("base7"),
            (col("n") * 14 > col("base7") * 3).cast("int").as("spike"),
            (col("n") * 14 < col("base7")).cast("int").as("slump"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getInt(3), r.getInt(4))).sortBy(_._1)
        // sequential model
        val model = (7 until nDays).map { i =>
          val base = (i - 7 until i).map(counts(_).toLong).sum
          val n = counts(i).toLong
          (f"2024-03-${i + 1}%02d", n, base,
            if (n * 14 > base * 3) 1 else 0, if (n * 14 < base) 1 else 0)
        }
        daily.toSeq == model
      }
    }

  property("substr spans: a planted span is localized exactly at random " +
    "offsets and lengths; disjoint-alphabet docs never match") =
    forAll(for {
      spanLen <- Gen.choose(20, 40)
      offA <- Gen.choose(0, 15)
      offB <- Gen.choose(0, 15)
      tailA <- Gen.choose(0, 10)
      tailB <- Gen.choose(0, 10)
    } yield (spanLen, offA, offB, tailA, tailB)) {
      case (spanLen, offA, offB, tailA, tailB) =>
        import spark.implicits._
        // per-doc alphabets are disjoint except the planted span, so the
        // ONLY shared 10-grams are the span's — localization must be exact
        val span = (1 to spanLen).map(i => s"s$i").mkString(" ")
        val a = ((1 to offA).map(i => s"a$i") ++ Seq(span) ++
          (1 to tailA).map(i => s"x$i")).mkString(" ")
        val b = ((1 to offB).map(i => s"b$i") ++ Seq(span) ++
          (1 to tailB).map(i => s"y$i")).mkString(" ")
        val docs = Seq((1L, a), (2L, b), (3L, (1 to 30).map(i => s"z$i").mkString(" ")))
          .toDF("doc_id", "text")
        val rows = graft.operators.LlmOps.substrSpansOf(docs).collect()
        rows.length == 1 && {
          val r = rows(0)
          r.getLong(0) == 1L && r.getLong(1) == 2L &&
            r.getInt(2) == offA && r.getInt(3) == offB &&
            r.getLong(4) == spanLen.toLong
        }
    }

  // Last-touch attribution vs a sequential per-user walk: random event
  // streams with ts ties, non-attributable types, null revenue, and
  // lookback boundaries both sides of 7 days. The model walks each user's
  // events in the operator's total order (us, purchase-last, event_id).
  property("attribution equals the sequential last-touch model") =
    forAll(Gen.listOfN(25, for {
      u <- Gen.choose(1L, 4L)
      ty <- Gen.oneOf("click", "view", "purchase", "error")
      day <- Gen.choose(0L, 15L)
      us <- Gen.choose(0L, 3L).map(day * 86400000000L + _) // frequent ties
      cents <- Gen.choose(0L, 500L)
      nul <- Gen.choose(0, 9)
    } yield (u, ty, us, if (nul == 0) null else Double.box(cents / 100.0)))) { evs0 =>
      import spark.implicits._
      val evs = evs0.zipWithIndex.map { case ((u, ty, us, v), i) =>
        (i.toLong + 1, u, ty, us, v)
      }
      if (!evs.exists(_._3 == "purchase")) true
      else {
        val df = evs.toDF("event_id", "user_id", "event_type", "us_in", "value")
          .withColumn("ts", timestamp_micros(col("us_in"))).drop("us_in")
        val got = graft.operators.WindowedAnalytics.attributionOf(df).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
        val look = 604800000000L
        val model = evs.filter(e => Set("click", "view", "purchase")(e._3))
          .groupBy(_._2).toSeq.flatMap { case (_, g) =>
            var lt: Option[(Long, String)] = None
            g.sortBy(e => (e._4, if (e._3 == "purchase") 1 else 0, e._1))
              .flatMap { case (_, _, ty, us, v) =>
                if (ty != "purchase") { lt = Some((us, ty)); None }
                else {
                  val ch = lt match {
                    case Some((tus, c)) if tus >= us - look => c
                    case _ => "direct"
                  }
                  Some(ch -> math.round(Option(v).map(_.doubleValue).getOrElse(0.0) * 100))
                }
              }
          }
          .groupBy(_._1).map { case (ch, g) =>
            ch -> (g.size.toLong, g.map(_._2).sum / 100.0)
          }
        got == model
      }
    }

  // Misra–Gries guarantee under the distributed execution shape: for ANY
  // partitioning of a weighted stream, reduce-per-partition + pairwise
  // merge must keep every item whose total weight exceeds N/(k+1) in the
  // candidate set (the bound the two-pass exact d13 plan relies on).
  // Pure driver-side check — the aggregator's reduce/merge are exercised
  // exactly as Spark's partial aggregation would call them.
  property("misra-gries candidates cover all true heavy hitters under any split") =
    forAll(for {
      k <- Gen.choose(2, 6)
      nsplit <- Gen.choose(1, 5)
      items <- Gen.listOfN(40,
        Gen.zip(Gen.choose(0, 9).map(i => s"t$i"), Gen.choose(1L, 20L)))
    } yield (k, nsplit, items)) { case (k, nsplit, items) =>
      val agg = new graft.functions.Aggregators.MisraGriesAggregator(k)
      val parts = items.grouped(math.max(1, items.size / nsplit)).toList
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val cands = agg.finish(merged).toSet
      val n = items.map(_._2).sum
      val heavy = items.groupBy(_._1).collect {
        case (t, g) if g.map(_._2).sum * (k + 1) > n => t
      }.toSet
      cands.size <= k && heavy.subsetOf(cands)
    }

  // Capped neighbor similarity vs the shared sequential model
  // (TestModels.nodeSim — one definition across suites) on RANDOM
  // weighted graphs and cap values, generalizing AnalyticsSpec's two
  // fixed-seed fixtures.
  private val graphGen: Gen[(List[(Long, Long, Long)], Int)] = for {
    n <- Gen.choose(4, 10)
    capM <- Gen.choose(2, 6)
    raw <- Gen.listOfN(20, for {
      a <- Gen.choose(0L, n - 1L)
      b <- Gen.choose(0L, n - 1L)
      w <- Gen.choose(1L, 5L)
    } yield (math.min(a, b), math.max(a, b), w))
  } yield (raw.filter { case (a, b, _) => a != b }
    .groupBy { case (a, b, _) => (a, b) }
    .map { case ((a, b), es) => (a, b, es.map(_._3).max) }.toList, capM)

  property("capped neighbor similarity equals its sequential model on random graphs") =
    forAll(graphGen) { case (edges, capM) =>
      import spark.implicits._
      if (edges.isEmpty) true
      else {
        val model = TestModels.nodeSim(edges, capM)
        val got = graft.operators.CoreRelational
          .neighborSimOf(edges.toDF("src", "dst", "w"), capM).collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
        got == model
      }
    }

  // The decimal money ledger vs an exact BigDecimal fold on RANDOM
  // ≤2-decimal inputs — random prices hit round-half boundaries and
  // degenerate groups that the fixture can't; the distributed decimal
  // sums must equal a driver-side exact fold bit-for-bit (this is the
  // invariant the graded integer-unit d14 descales from).
  private val ledgerGen: Gen[List[(String, Long, Long, Long)]] =
    Gen.listOfN(30, for {
      f <- Gen.oneOf("A", "N", "R")
      pc <- Gen.choose(0L, 10000000L) // price cents
      dc <- Gen.choose(0L, 99L)       // discount cents
      tc <- Gen.choose(0L, 99L)       // tax cents
    } yield (f, pc, dc, tc))

  property("decimal ledger equals an exact BigDecimal fold on random money") =
    forAll(ledgerGen) { rows =>
      import spark.implicits._
      if (rows.isEmpty) true
      else {
        val df = rows.toDF("l_returnflag", "pc", "dc", "tc")
          .select(col("l_returnflag"),
            (col("pc") / 100.0).as("l_extendedprice"),
            (col("dc") / 100.0).as("l_discount"),
            (col("tc") / 100.0).as("l_tax"))
        def d2(c: Long) = BigDecimal(c) * BigDecimal("0.01")
        val model = rows.groupBy(_._1).map { case (f, g) =>
          val px = g.map(r => d2(r._2)).sum
          val dp = g.map(r => d2(r._2) * (1 - d2(r._3))).sum
          val ch = g.map(r => d2(r._2) * (1 - d2(r._3)) * (1 + d2(r._4))).sum
          f -> (px, dp, ch)
        }
        val got = graft.operators.CoreRelational.decimalLedgerOf(df).collect()
        got.length == model.size && got.forall { r =>
          val (px, dp, ch) = model(r.getString(0))
          BigDecimal(r.getDecimal(1)) == px &&
            BigDecimal(r.getDecimal(2)) == dp &&
            BigDecimal(r.getDecimal(3)) == ch
        }
      }
    }

  // random per-type daily tick series (ties in value, short and long runs)
  private val seriesGen: Gen[List[(Int, Int, Long)]] =
    Gen.listOfN(24, for {
      tpe <- Gen.choose(0, 2)
      day <- Gen.choose(0, 11)
      xt <- Gen.choose(0L, 1000L)
    } yield (tpe, day, xt))

  property("CUSUM closed window form equals the literal recurrence on " +
    "random series") = forAll(seriesGen) { raw =>
    import spark.implicits._
    // collapse duplicate (type, day) rows like the daily aggregate would
    val series = raw.groupBy(r => (r._1, r._2))
      .map { case ((t, d), g) => (t, f"d$d%02d", g.map(_._3).sum) }.toList
    if (series.isEmpty) true
    else {
      val daily = series.toDF("event_type", "day", "xt")
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("xt")).as("s"))
      val wseq = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the e18 window form verbatim
      val got = daily.join(broadcast(stats), "event_type")
        .withColumn("pf", sum(col("xt") * col("n") - col("s")).over(wseq))
        .withColumn("st", col("pf") - least(min(col("pf")).over(wseq), lit(0L)))
        .select("event_type", "day", "st").collect()
        .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      // the sequential recurrence in the same n-scaled units
      series.groupBy(_._1).forall { case (tpe, rows) =>
        val seq = rows.sortBy(_._2)
        val n = seq.length.toLong
        val s = seq.map(_._3).sum
        var st = 0L
        seq.forall { case (_, day, xt) =>
          st = math.max(0L, st + (xt * n - s))
          got((tpe, day)) == st
        }
      }
    }
  }

  private val wmGen: Gen[List[(Int, Long, Long)]] =
    Gen.listOfN(30, for {
      grp <- Gen.choose(0, 2)
      v <- Gen.choose(0L, 20L)   // narrow → frequent value ties
      w <- Gen.choose(1L, 9L)
    } yield (grp, v, w))

  property("weighted median is the smallest value whose cumulative weight " +
    "reaches half, on random weighted multisets") = forAll(wmGen) { rows =>
    import spark.implicits._
    if (rows.isEmpty) true
    else {
      // the d16 plan shape verbatim over a synthetic (grp, v, w) frame
      val hist = rows.toDF("grp", "v", "w")
        .groupBy("grp", "v").agg(sum(col("w")).as("wsum"))
      val wcum = Window.partitionBy("grp").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = hist.groupBy("grp").agg(sum(col("wsum")).as("tot"))
      val got = hist
        .withColumn("cum", sum(col("wsum")).over(wcum))
        .join(broadcast(tot), "grp")
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("grp").agg(min(col("v")).as("med"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      rows.groupBy(_._1).forall { case (g, rs) =>
        val tot = rs.map(_._3).sum
        val byV = rs.groupBy(_._2).map { case (v, h) => v -> h.map(_._3).sum }
          .toSeq.sortBy(_._1)
        var cum = 0L
        val model = byV.collectFirst {
          case (v, w) if { cum += w; cum * 2 >= tot } => v
        }.get
        // equality with the model AND definitional minimality
        val below = byV.takeWhile(_._1 < model).map(_._2).sum
        got(g) == model && below * 2 < tot
      }
    }
  }

  /** Straight-line BPE trainer: count adjacent pairs, take the (cnt desc,
    * pair asc) winner, greedy left-to-right merge, repeat. */
  private def bpeModel(docs0: Seq[Seq[String]], rounds: Int)
      : (Seq[(String, String, Long)], Seq[Seq[String]]) = {
    var cur = docs0
    val merges = (1 to rounds).flatMap { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      cur.foreach(_.sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) += 1
        case _ => ()
      })
      if (counts.isEmpty) None
      else {
        val ((t1, t2), cnt) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        cur = cur.map { toks =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == t1 && toks(i + 1) == t2) {
              out += toks(i) + " " + toks(i + 1); i += 2
            } else { out += toks(i); i += 1 }
          }
          out.toSeq
        }
        Some((t1, t2, cnt))
      }
    }
    (merges, cur)
  }

  property("Theil–Sen slope equals the median-of-pairwise-slopes model and " +
    "shrugs off a planted outlier day") =
    forAll(for {
      n <- Gen.choose(3, 12)
      slope <- Gen.choose(-5, 5)
      noise <- Gen.listOfN(12, Gen.choose(-2, 2))
    } yield (n, slope, noise)) { case (n, slope, noise) =>
      import spark.implicits._
      def sen(series: Seq[(Long, Long)]): Double = {
        val daily = series.map { case (ed, v) => ("t", ed, v) }
          .toDF("event_type", "ed", "n")
        graft.operators.WindowedAnalytics.theilSenOf(daily)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap.apply("t")
      }
      val series = (0 until n).map(i =>
        (i.toLong, (100 + slope * i + noise(i)).toLong))
      // sequential model: tick histogram, first tick reaching half
      val ticks = (for {
        i <- 0 until n; j <- i + 1 until n
      } yield math.round((series(j)._2 - series(i)._2).toDouble
        / (series(j)._1 - series(i)._1) * 1e4)).sorted
      var cum = 0
      val med = ticks.find { _ => cum += 1; cum * 2 >= ticks.size }.get
      val exact = sen(series) == med / 1e4
      // robustness: one wild day moves the median by at most the noise
      // band (a least-squares fit would chase it)
      val spiked = series :+ ((n + 2).toLong, (100 + slope * (n + 2) + 500).toLong)
      val robust = math.abs(sen(spiked) - slope) <= 4.0
      exact && robust
    }

  private val bpeGen: Gen[List[List[String]]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n,
      Gen.choose(2, 12).flatMap(len =>
        // 3-letter alphabet → frequent repeated-token runs ("a a a a"),
        // the overlapping-match case the greedy window algebra must get
        // right, plus frequent count ties exercising the pair total order
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")))))

  property("BPE merge rounds equal the sequential trainer on random corpora") = {
    // no shrinking: shrunk values leave the generator's support (an empty
    // token list means an empty-STRING text whose split is [""], not []),
    // which fails on the text round-trip, not the operator
    implicit val noShrink: org.scalacheck.Shrink[List[List[String]]] =
      org.scalacheck.Shrink.shrinkAny
    forAll(bpeGen) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val (mergesDf, finalDf) = graft.operators.LlmOps.bpeMergeRounds(df, rounds = 3)
      val got = mergesDf.orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val gotFinal = finalDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1).map { case (id, rs) =>
          id -> rs.sortBy(_._2).map(_._3).toSeq }
      val (merges, finalDocs) = bpeModel(docs.map(_.toSeq), 3)
      got == merges && gotFinal == finalDocs.zipWithIndex
        .map { case (toks, i) => i.toLong -> toks }.toMap
    }
  }

  property("regex BPE encoder equals the trainer's own final sequence on " +
    "random corpora (encode-at-ingest ≡ train-time tokenization)") = {
    implicit val noShrink: org.scalacheck.Shrink[List[List[String]]] =
      org.scalacheck.Shrink.shrinkAny
    forAll(bpeGen) { docs =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val (mergesDf, finalDf) = graft.operators.LlmOps.bpeMergeRounds(df, rounds = 3)
      // the trainer's sequence rendered through the SAME projection the
      // encoder emits: token count + md5 over "|"-joined tokens
      val want = finalDf.groupBy("doc_id").agg(
        count(lit(1)).as("n_tok"),
        md5(concat_ws("|", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")))).as("enc_md5"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val got = graft.operators.LlmOps.bpeEncode(df, mergesDf)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      got == want
    }
  }
}
