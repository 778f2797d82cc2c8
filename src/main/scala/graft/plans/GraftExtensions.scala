package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.graftexpr.{DotProduct, DotSelfToNorm, SquaredDistance, SquaredNorm}

/** SparkSessionExtensions entry point: exposes the custom Catalyst vector
  * expressions to the SQL surface, so `spark.sql("SELECT dot_product(a,b)")`
  * works alongside the Column API.
  *
  * Wire up either way:
  *   - at session build: `.withExtensions(new GraftExtensions)` or
  *     `spark.sql.extensions=graft.plans.GraftExtensions`
  *   - on a live session: `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("squared_distance"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "squared_distance"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SquaredDistance(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("squared_norm"),
      new ExpressionInfo(classOf[SquaredNorm].getName, "squared_norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SquaredNorm(exprs(0))))
    // optimizer rule: dot_product(v, v) → squared_norm(v) (exact, cheaper)
    e.injectOptimizerRule(_ => DotSelfToNorm)
  }
}

object GraftExtensions {
  /** Same registrations applied to an already-built session (the optimizer
    * rule lands in experimental.extraOptimizations — the live-session
    * injection point). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "squared_distance", exprs => SquaredDistance(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "squared_norm", exprs => SquaredNorm(exprs(0)), "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(DotSelfToNorm))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotSelfToNorm
  }
}
