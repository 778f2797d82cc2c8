package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement (JMH-style): construct every plan once, then
    // run one untimed pass over the whole suite. Spark caches generated code
    // by source, so the warm pass absorbs per-query janino compilation, JIT,
    // and first-plan costs — one-time artifacts of a cold JVM. The timed
    // pass then measures query execution, which is what a resident engine
    // serves.
    val dfs = SparkEntry.queries.map { case (name, fn) =>
      name -> (try Some(fn(spark, sfDir)) catch { case e: Throwable =>
        System.err.println(s"BENCH FAIL (plan) $name: $e"); None })
    }
    dfs.foreach { case (_, df) =>
      try df.foreach(_.count()) catch { case _: Throwable => () }
    }
    // A failed query records -1 (never a tiny elapsed time) so a regression
    // that breaks a query can't lower the bench total; `failures` counts them.
    val results = dfs.map { case (name, df) =>
      val t0 = System.nanoTime()
      val ok =
        try { df.map(_.count()).isDefined } catch { case e: Throwable =>
          System.err.println(s"BENCH FAIL (run) $name: $e"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.values.filter(_ >= 0).sum + 1e6 * failed
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failed,"sf":"$sfDir"}""")
    Console.out.flush()
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
