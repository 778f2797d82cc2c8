package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

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
