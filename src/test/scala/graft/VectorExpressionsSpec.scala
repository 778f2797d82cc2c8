package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.VectorExpressions.{dot_product, squared_distance}

/** The codegen'd vector expressions must be bit-identical to the
  * interpreted higher-order-function folds they replaced (same
  * left-to-right IEEE order) in both codegen and interpreted eval paths.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  import TestSpark._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("DotProduct equals the HOF fold bit-for-bit on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val both = emb.select(
      dot_product(col("v"), col("v")).as("fast"),
      hofDot(col("v"), col("v")).as("slow"))
    // exact equality — not a tolerance check
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("SquaredDistance matches the algebraic identity |a|²+|b|²-2a·b within fp") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .limit(50)
    val a = emb.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        squared_distance(col("va"), col("vb")).as("d2"),
        (dot_product(col("va"), col("va")) + dot_product(col("vb"), col("vb")) -
          lit(2.0) * dot_product(col("va"), col("vb"))).as("alg"))
    assert(pairs.filter(abs(col("d2") - col("alg")) > 1e-12).count() == 0)
  }

  test("SquaredNorm equals DotProduct(v, v) bit-for-bit") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val both = emb.select(
      graft.plans.VectorExpressions.squared_norm(col("v")).as("fused"),
      dot_product(col("v"), col("v")).as("two_array"))
    assert(both.filter(col("fused") =!= col("two_array")).count() == 0)
  }

  test("expressions run in interpreted mode too (codegen fallback path)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val emb = graft.sources.Tables.embeddings(spark, sf)
        .select(transform(col("embedding"), _.cast("double")).as("v")).limit(10)
      val r = emb.select(dot_product(col("v"), col("v")).as("d")).collect()
      assert(r.forall(x => math.abs(x.getDouble(0) - 1.0) < 0.01)) // ~unit norm
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
