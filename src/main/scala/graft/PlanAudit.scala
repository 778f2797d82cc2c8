package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit (SURVEY.md §4): prints `explain("formatted")` for
  * representative queries and flags the properties that matter at 100 TB —
  * parquet filter pushdown, column-pruned scans, broadcast vs shuffle
  * joins, and whole-stage codegen coverage.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir] [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("d1_pricing_summary", "c2_star_join", "c1_join_broadcast",
        "b2_filter_compound", "j3_topk_cosine", "j2_jaccard_pairs",
        "lsh_minhash_pairs", "i1_tumbling", "e1_rank", "f2_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      df.collect() // materialize THIS queryExecution so AQE finalizes
      val executed = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
      val broadcast = executed.contains("BroadcastHashJoin")
      // codegen'd stages print as "*(id) Node" in the executed-plan string
      val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(executed)
        .map(_.group(1)).toSet.size
      println(s"[audit] $name: pushedFilters=$pushed broadcastJoin=$broadcast " +
        s"codegenSpans=$codegenSpans")
    }
    spark.stop()
  }
}
