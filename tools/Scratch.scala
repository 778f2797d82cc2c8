package graft

import org.apache.spark.sql.SparkSession

// Dev-only profiling harness, kept OUTSIDE src/ so the library tree carries
// no hardcoded local[32] config — copy into src/main/scala/graft/ to run:
//   SCRATCH_VARIANT=B sbt "runMain graft.Scratch"
// Times a query subset under candidate session configs (A..G below).
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val variant = sys.env.getOrElse("SCRATCH_VARIANT", "A")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b2 = variant match {
      case "A" => b
      case "B" => b
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
      case "C" => b
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.join.preferSortMergeJoin", "false")
      case "D" => b
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      case "E" => b
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.broadcast.compress", "false")
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      case "F" => b
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", (64 << 20).toString)
      case "G" => b
        .config("spark.sql.adaptive.enabled", "false")
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("lsh_minhash_pairs", "ta_tfidf", "j2_jaccard_pairs",
      "c2_star_join", "d4_having", "ta_bigrams", "i3_session", "d9_cube",
      "e1_rank", "c1_join_broadcast", "i7_upsert", "c10_self_join")
    val dfs = names.map(n => n -> SparkEntry.queries(n)(spark, sfDir))
    dfs.foreach(_._2.count())
    val times = (0 until 2).map { _ =>
      System.gc()
      dfs.map { case (n, df) =>
        val t0 = System.nanoTime(); df.count()
        n -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    val best = names.map(n => n -> times.map(_(n)).min)
    println(s"== variant=$variant sf=$sfDir")
    best.foreach { case (n, t) => println(f"$n%-22s $t%.3f s") }
    println(f"subset total ${best.map(_._2).sum}%.3f s")
    CacheRegistry.releaseAll()
    spark.stop()
  }
}
