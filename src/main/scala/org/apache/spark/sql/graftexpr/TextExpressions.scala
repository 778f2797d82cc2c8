// Lives under org.apache.spark.sql.* because ExpressionUtils (the
// Expression↔Column bridge) is private[sql] — same packaging as
// VectorExpressions. The graft-facing API is graft.plans.TextExpressions.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit bigram simhash of a document as ONE codegen'd expression — the
  * streaming-safe fingerprint column (a stream cannot run the batch
  * builder's lead() window, and the HOF form paid 32 interpreted
  * `aggregate` passes per row). Generated code is a single static call
  * into [[graft.functions.SimhashKernel]], so the fingerprint stays inside
  * whole-stage codegen; bit-identity with the relational batch builder is
  * pinned in StreamingSpec.
  */
case class SimhashBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.SimhashKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def simhash_bigrams(text: Column): Column =
    ExpressionUtils.column(SimhashBigrams(ExpressionUtils.expression(text)))
}
