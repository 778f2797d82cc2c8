package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators
import graft.operators.Lsh

class AggregatorsSpec extends AnyFunSuite {
  import TestSpark._

  test("typed CentroidAggregator agrees with the relational j4 centroids") {
    import spark.implicits._
    val agg = new Aggregators.CentroidAggregator(64).toColumn
    val typed = graft.sources.Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg)
      .collect().toMap
    val relational = SparkEntry.queries("j4_centroid")(spark, sf)
      .collect()
      .groupBy(_.getAs[Int]("label"))
    relational.foreach { case (label, rows) =>
      rows.foreach { r =>
        val pos = r.getAs[Int]("pos")
        val expect = r.getAs[Double]("c") // rounded to 4 decimals
        assert(math.abs(typed(label)(pos) - expect) < 1e-4 + 1e-9)
      }
    }
  }

  test("typed MinHashAggregator reproduces the SQL min-per-seed signature") {
    import spark.implicits._
    val agg = new Aggregators.MinHashAggregator(
      Lsh.A.toArray, Lsh.B.toArray, Lsh.P).toColumn
    val inv = graft.operators.LlmOps.shingleRows(
      graft.sources.Tables.documents(spark, sf)).select("doc_id", "h")
    val typed = inv.as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg)
      .collect().toMap
    val sql = inv.groupBy("doc_id").agg(
      min((col("h") * Lsh.A(0) + Lsh.B(0)) % Lsh.P).as("mh0"),
      (1 until 16).map(i =>
        min((col("h") * Lsh.A(i) + Lsh.B(i)) % Lsh.P).as(s"mh$i")): _*)
      .collect()
    sql.take(50).foreach { r =>
      val id = r.getLong(0)
      (0 until 16).foreach { i =>
        assert(typed(id)(i) == r.getLong(i + 1), s"doc $id seed $i")
      }
    }
  }
}
