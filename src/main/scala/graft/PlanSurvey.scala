package graft

import org.apache.spark.sql.SparkSession

/** One-line physical-plan fingerprint per graded query — the data source for
  * PlanShapeSpec's pinned invariants. Flags: join strategy chosen, parquet
  * filter pushdown, shuffle presence, whole-stage-codegen presence.
  *
  * Usage: sbt "runMain graft.PlanSurvey [sfDir]"
  */
object PlanSurvey {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // finalize AQE so the executed plan is the real one
        val p = df.queryExecution.executedPlan.toString
        val flags = Seq(
          "CARTESIAN" -> p.contains("CartesianProduct"),
          "BNLJ" -> p.contains("BroadcastNestedLoopJoin"),
          "BHJ" -> p.contains("BroadcastHashJoin"),
          "SMJ" -> p.contains("SortMergeJoin"),
          "SHJ" -> p.contains("ShuffledHashJoin"),
          "PUSH" -> "PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
          "EXCH" -> p.contains("Exchange"),
          "WSCG" -> p.contains("*("))
        println(f"$n%-26s ${flags.collect { case (f, true) => f }.mkString(",")}")
      } catch { case e: Throwable => println(s"$n FAIL ${e.getClass.getSimpleName}") }
    }
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}
