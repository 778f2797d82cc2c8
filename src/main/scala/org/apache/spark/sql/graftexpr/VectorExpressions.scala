// Lives under org.apache.spark.sql.* because AbstractDataType and
// ExpressionUtils are private[sql] — the standard packaging for third-party
// Catalyst expressions. The graft-facing API is graft.plans.VectorExpressions.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Custom Catalyst expressions (SURVEY.md §2 K4 / §4) for the vector math
  * on embedding columns.
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) evaluate
  * lambdas interpreted (CodegenFallback), which makes per-pair dot products
  * the hot path of the similarity queries. These expressions generate a
  * tight primitive loop inside whole-stage codegen instead — same
  * left-to-right IEEE fold, so results are bit-identical to the HOF form
  * (and to the DuckDB oracle's list_reduce), just ~an order of magnitude
  * cheaper per row.
  */
abstract class VectorFoldExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** Scala form of the per-element accumulation. */
  protected def accumulate(acc: Double, x: Double, y: Double): Double

  /** Java source of the per-element accumulation (s, xi, yi in scope). */
  protected def accumulateJava(s: String, x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s = accumulate(s, x.getDouble(i), y.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${accumulateJava(s, s"$a.getDouble($i)", s"$b.getDouble($i)")}
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — the dot product. */
case class DotProduct(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def accumulate(acc: Double, x: Double, y: Double): Double = acc + x * y
  override protected def accumulateJava(s: String, x: String, y: String): String =
    s"$s += $x * $y;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ (aᵢ-bᵢ)² — squared L2 distance. */
case class SquaredDistance(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def accumulate(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def accumulateJava(s: String, x: String, y: String): String =
    s"{ double d = $x - $y; $s += d * d; }"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ² — squared L2 norm. Same fold order as DotProduct(a, a) (acc + x·x
  * left-to-right), so results are bit-identical, but the generated loop
  * reads ONE array instead of two — norm computations are per-vector
  * preprocessing in every similarity query, so halving element loads there
  * is free throughput. The optimizer rule [[DotSelfToNorm]] applies this
  * rewrite automatically when users write dot_product(v, v). */
case class SquaredNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: dot_product(v, v) → squared_norm(v). Semantically exact
  * (same IEEE fold) and strictly cheaper; fires wherever both sides of a
  * DotProduct are the same attribute/expression. Injected by
  * graft.plans.GraftExtensions. */
object DotSelfToNorm
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.semanticEquals(b) && a.deterministic =>
        SquaredNorm(a)
    }
}

object VectorExpressions {
  /** Column API for the codegen'd dot product. */
  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for the codegen'd squared L2 distance. */
  def squared_distance(a: Column, b: Column): Column =
    ExpressionUtils.column(SquaredDistance(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for the codegen'd squared L2 norm. */
  def squared_norm(a: Column): Column =
    ExpressionUtils.column(SquaredNorm(ExpressionUtils.expression(a)))
}
