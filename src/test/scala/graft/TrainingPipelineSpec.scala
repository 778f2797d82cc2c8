package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-checks for the training-corpus assembly operators: the graded gate
  * proves Spark≡DuckDB, these prove both match the intended semantics.
  */
class TrainingPipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("tp_split partitions every document exactly once, roughly 80/10/10") {
    val total = graft.sources.Tables.documents(spark, sf).count()
    val bySubset = run("tp_split").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySubset.values.sum == total) // a doc lands in exactly one subset
    assert(bySubset.keySet == Set("train", "val", "test"))
    // binomial bounds at n=500: train 400±~45 (5σ), val/test 50±~33
    assert(bySubset("train") > 0.7 * total && bySubset("train") < 0.9 * total)
    assert(bySubset("val") > 0.03 * total && bySubset("val") < 0.17 * total)
  }

  test("split-hash buckets are roughly uniform over a large key range") {
    import spark.implicits._
    // the 80/10/10 split is only as good as the hash's uniformity: over
    // 20k sequential keys every percent bucket should be populated evenly
    val buckets = spark.range(20000)
      .select((conv(substring(md5(concat(lit("split:"), col("id").cast("string"))),
        1, 15), 16, 10).cast("long") % 100).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets.keySet == (0L until 100L).toSet)
    // expected 200/bucket; 5σ ≈ 70
    assert(buckets.values.forall(c => c > 130 && c < 270),
      s"skewed buckets: ${buckets.toSeq.sortBy(_._2).take(3)} … ${buckets.toSeq.sortBy(-_._2).take(3)}")
  }

  test("tp_split assignment is deterministic across runs and partitionings") {
    val a = run("tp_split").collect().toSeq
    val b = SparkEntry.queries("tp_split")(spark, sf)
      .repartition(7).orderBy("subset", "lang").collect().toSeq
    assert(a == b)
  }

  test("tp_chunk covers every token: stride-48 starts, 64-token windows") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = run("tp_chunk").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)).toMap
    assert(chunks.keySet == docs.keySet)
    docs.foreach { case (id, n) =>
      val cs = chunks(id)
      // chunk count = number of stride-48 starts in [0, n)
      assert(cs.size == (n - 1) / 48 + 1, s"doc $id: n=$n got ${cs.size} chunks")
      // indices are consecutive from 0; each chunk holds min(64, remaining)
      cs.zipWithIndex.foreach { case ((idx, len), i) =>
        assert(idx == i && len == math.min(64, n - i * 48))
      }
      // coverage: last chunk reaches the last token; overlap = 16 when full
      assert(cs.last._1 * 48 + cs.last._2 == n)
    }
  }

  test("tp_pack equals a sequential first-fit model per source") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val model = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(_._2).map { case (_, _, n) =>
        val bin = (cum / 2048).toInt; cum += n; (src, bin, n.toLong)
      }
    }.groupBy(t => (t._1, t._2))
      .map { case ((src, bin), g) => (src, bin, g.size.toLong, g.map(_._3).sum) }
      .toSeq.sorted
    val got = run("tp_pack").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == model)
    // no bin except a continuation overflow exceeds capacity + one max doc
    val maxDoc = docs.map(_._3).max
    got.foreach { case (_, _, _, toks) => assert(toks < 2048 + maxDoc) }
  }

  test("tp_interleave prefix proportions track the language weights") {
    val rows = run("tp_interleave").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(rows.length == 200)
    // merged order is by virtual position — verify it's sorted and that
    // within each lang the rows appear in rn order (stream order preserved)
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(identity).toSeq)
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).toSeq == g.map(_._3).sortBy(identity).toSeq)
    }
    // prefix proportion ≈ weight share: en weight 3 of Σ per-lang weights;
    // with 5 langs {en:3, fr:2, es:2, zh:1, de:1} ⇒ en ≈ 200*3/9 ≈ 67
    val byLang = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") > 50 && byLang("en") < 85, s"en share off: $byLang")
    assert(byLang("zh") > 12 && byLang("zh") < 35, s"zh share off: $byLang")
  }

  test("emb_quantize: int8 range respected, reconstruction error bounded") {
    val rows = run("emb_quantize").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, rmse, qmax, amax) =>
      assert(qmax <= 127, s"vec $id: q out of int8 range")
      // symmetric quantization error per element ≤ scale/2 = amax/254,
      // so RMSE ≤ amax/254 (+ rounding slack)
      assert(rmse >= 0 && rmse <= amax / 254 + 1e-4,
        s"vec $id: rmse $rmse exceeds bound ${amax / 254}")
    }
  }

  test("tp_length_buckets: buckets partition the corpus and batch math is tight") {
    val b = run("tp_length_buckets").collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(b.map(_.getAs[Long]("n_docs")).sum == docs.count())
    b.foreach { r =>
      val (nDocs, spb, nBatches) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("seqs_per_batch"), r.getAs[Long]("n_batches"))
      // exact ceiling division — no over- or under-provisioned batches
      assert(nBatches == (nDocs + spb - 1) / spb)
      // padding waste is a true fraction: capacity covers the tokens
      val pad = r.getAs[Double]("pad_frac")
      assert(pad >= 0.0 && pad < 1.0, s"bucket ${r.get(0)}: pad_frac $pad")
      // every doc in the bucket fits its padded length
      assert(r.getAs[Long]("sum_toks") <= nDocs * r.getAs[Long]("upper"))
    }
  }

  test("pp_quality_funnel: stage counts are monotone and partition the corpus") {
    val f = run("pp_quality_funnel").collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(f.map(_.getAs[Long]("n_total")).sum == docs.count())
    f.foreach { r =>
      val (t, l, rp, lm, u) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_len"),
        r.getAs[Long]("n_rep"), r.getAs[Long]("n_lm"), r.getAs[Long]("n_unique"))
      assert(t >= l && l >= rp && rp >= lm && lm >= u && u >= 0,
        s"funnel not monotone for ${r.get(0)}: $t/$l/$rp/$lm/$u")
    }
    // the funnel's stage-2 gate must agree with the graded ta_repetition op
    val repPassed = run("ta_repetition").filter(col("pass") === 1).count()
    assert(f.map(_.getAs[Long]("n_rep")).sum <= repPassed)
  }

  test("pp_corpus_stats: doc counts partition the corpus, shares sum to 1") {
    val stats = run("pp_corpus_stats").collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(stats.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val shareSum = stats.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"token shares sum to $shareSum")
    // dup count is bounded by the doc count and non-negative
    stats.foreach { r =>
      val dups = r.getAs[Long]("n_exact_dups")
      assert(dups >= 0 && dups < r.getAs[Long]("n_docs"))
    }
  }

  test("tp_upsample: every doc appears exactly its source's factor times, " +
    "epochs are 1..factor, and mix positions are distinct per copy") {
    import org.apache.spark.sql.functions._
    val up = run("tp_upsample")
    val docs = graft.sources.Tables.documents(spark, sf)
    val factor = when(col("source") === "src0", 3)
      .when(col("source") === "src1", 2).otherwise(1)
    // per-doc copy count equals the source factor; epochs are exactly 1..f
    val perDoc = up.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("epoch").as("lo"), max("epoch").as("hi"),
        countDistinct("epoch").as("ne"))
    val expected = docs.select(col("doc_id"), factor.as("f"))
    assert(perDoc.join(expected, "doc_id")
      .filter(col("n") =!= col("f") || col("lo") =!= 1 ||
        col("hi") =!= col("f") || col("ne") =!= col("f")).count() == 0)
    assert(up.count() == docs.select(sum(factor)).collect()(0).getLong(0))
    // the salted mix position separates epoch copies of the same doc
    assert(up.select("pos").distinct().count() == up.count())
  }

  test("tp_token_budget: selection is the maximal greedy quality prefix " +
    "within 25% of corpus tokens") {
    val r = run("tp_token_budget").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.nonEmpty)
    // recompute the naive model: global (score desc, doc_id) running sum
    val all = SparkEntry.queries("ta_quality_score")(spark, sf)
      .select(col("doc_id"),
        graft.functions.ExactNum.tenK(col("score")).as("st"), col("n_tokens"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2).toLong))
    val budget = all.map(_._3).sum / 4
    val ordered = all.sortBy { case (id, st, _) => (-st, id) }
    val prefix = ordered.scanLeft(0L)(_ + _._3).tail.zip(ordered)
      .takeWhile(_._1 <= budget).map { case (cum, (id, st, n)) => (id, st, n, cum) }
    assert(r.sortBy(_._4).toSeq == prefix.toSeq)
    // maximality: the next doc in quality order would blow the budget
    if (prefix.length < ordered.length)
      assert(prefix.map(_._3).sum + ordered(prefix.length)._3 > budget)
  }

  test("tp_weighted_sample: exactly k rows, weight-biased, deterministic") {
    import org.apache.spark.sql.functions._
    val r = run("tp_weighted_sample")
    val rows = r.collect()
    assert(rows.length == 100)
    // keys are the sort column: nonnegative and nondecreasing
    val kls = rows.map(_.getLong(2))
    assert(kls.forall(_ >= 0))
    assert(kls.zip(kls.tail).forall { case (a, b) => a <= b })
    // weighting by n_chars must pull the sample's mean weight above the
    // corpus mean (exponential keys: heavier docs draw smaller keys)
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = docs.join(r.select("doc_id"), "doc_id")
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
    // fully deterministic across executions
    val again = run("tp_weighted_sample").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("tp_temperature_mix: quotas filled exactly and the mix flattens") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val admitted = run("tp_temperature_mix")
      .groupBy("lang").agg(count(lit(1)).as("adm"), max("rk").as("max_rk"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getInt(2)))).toMap
    // recompute the integer quota chain independently
    val w = corpus.map { case (l, n) => l -> math.floor(math.sqrt(n.toDouble)).toLong }
    val sw = w.values.sum; val nd = corpus.values.sum
    corpus.keys.foreach { l =>
      val quota = ((nd / 2) * w(l)) / sw
      val (adm, maxRk) = admitted(l)
      assert(adm == math.min(quota, corpus(l)), s"lang $l admitted $adm != quota $quota")
      assert(maxRk.toLong == adm) // ranks are exactly 1..quota — no gaps
    }
    // temperature < 1 must FLATTEN the mix: the dominant language's share
    // of the admitted set is strictly below its corpus share, the rarest
    // language's share strictly above
    val (top, bot) = (corpus.maxBy(_._2)._1, corpus.minBy(_._2)._1)
    val admTotal = admitted.values.map(_._1).sum.toDouble
    assert(admitted(top)._1 / admTotal < corpus(top).toDouble / nd)
    assert(admitted(bot)._1 / admTotal > corpus(bot).toDouble / nd)
  }

  test("tp_reservoir: exactly min(5,|group|) rows per lang, the hash-top-5 set") {
    val got = run("tp_reservoir").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // driver model: same salted hash, top-5 by (pri desc, doc_id desc)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def pri(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"res:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000000L
    }
    val model = docs.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
      g.map { case (id, _) => (pri(id), id) }
        .sortBy { case (p, id) => (-p, -id) }.take(5).zipWithIndex
        .map { case ((p, id), i) => (lang, i + 1, id, p) }
    }.toSet
    assert(got.toSet == model)
    // every group is filled to min(5, group size)
    val sizes = docs.groupBy(_._2).map { case (l, g) => l -> math.min(5, g.size) }
    assert(got.groupBy(_._1).map { case (l, g) => l -> g.length } == sizes)
  }

  test("tp_dsir: disjoint-vocabulary corpora separate sharply — raw docs " +
    "sharing the target vocabulary are selected, foreign-vocabulary docs " +
    "are not, and target docs are never 'selected'") {
    import spark.implicits._
    // the fixture's languages share one synthetic vocabulary (separation is
    // faint there by construction); this is the mechanism proof the graded
    // query rides on. Bucket assignments of the eight words are pairwise
    // distinct (checked offline), so no hash collision blurs the sign.
    val target = (1L to 4L).map(i => (i, "alpha beta gamma delta alpha beta", "en"))
    val rawA = (11L to 14L).map(i => (i, "alpha beta gamma delta alpha beta", "xx"))
    val rawB = (21L to 24L).map(i => (i, "omega sigma tau rho omega sigma", "yy"))
    val docs = (target ++ rawA ++ rawB).toDF("doc_id", "text", "lang")
    val r = graft.operators.TrainingPipeline.dsirOf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(3), x.getInt(4)))).toMap
    (11L to 14L).foreach { i =>
      assert(r(i)._1 > 0 && r(i)._2 == 1, s"raw-A doc $i: ${r(i)}") }
    (21L to 24L).foreach { i =>
      assert(r(i)._1 < 0 && r(i)._2 == 0, s"raw-B doc $i: ${r(i)}") }
    (1L to 4L).foreach { i => assert(r(i)._2 == 0, s"target doc $i selected") }
  }
}
