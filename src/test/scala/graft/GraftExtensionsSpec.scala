package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions
import graft.plans.VectorExpressions.dot_product

class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                squared_distance(array(1.0d, 2.0d), array(1.0d, 0.0d)) AS s""")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 4.0)
  }

  test("optimizer rule rewrites dot_product(v, v) into squared_norm") {
    GraftExtensions.register(spark)
    val df = graft.sources.Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .select(dot_product(col("v"), col("v")).as("n2"),
        dot_product(col("v"), col("v")).as("kept")) // both rewritten
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("squarednorm") || opt.contains("SquaredNorm"),
      s"rule did not fire:\n$opt")
    assert(!opt.toLowerCase.contains("dotproduct"),
      "self-dot survived the rewrite")
    // and the rewritten plan computes the same values
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 0.01))
  }

  test("SQL form works over the real embeddings table") {
    GraftExtensions.register(spark)
    graft.sources.Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val n = spark.sql(
      """SELECT vec_id,
                dot_product(transform(embedding, x -> CAST(x AS DOUBLE)),
                            transform(embedding, x -> CAST(x AS DOUBLE))) AS sq
         FROM emb WHERE vec_id < 10""").collect()
    assert(n.length == 10)
    assert(n.forall(r => math.abs(r.getDouble(1) - 1.0) < 0.01))
  }
}
