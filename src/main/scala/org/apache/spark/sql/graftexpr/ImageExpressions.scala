// Lives under org.apache.spark.sql.* because ExpressionUtils (the
// Expression↔Column bridge) is private[sql] — same packaging as
// VectorExpressions/TextExpressions. The graft-facing API is
// graft.multimodal.ImageHeaders.withImageDims.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, IntegerType, StringType}

/** JPEG SOF / PNG IHDR header reads as single codegen'd expressions — one
  * static call into [[graft.functions.ImageHeaderKernel]] per column.
  *
  * The former substr/hex/conv marker-hop projection CHAIN was correct but
  * fragile under optimization: any predicate on the derived dims is pushed
  * through the chain by alias substitution, duplicating the hop tree
  * ~4^hops times into the Filter condition (janino gave up at ~200 KB of
  * generated code and the interpreted fallback measured 5.5 s at sf0.1 on
  * mm_patch_grid). A bounded static call is duplication-proof and stays
  * inside whole-stage codegen. NULL result (unknown signature, truncated
  * header, no SOF within `maxSegments` hops) is the quarantine contract,
  * so the expressions carry explicit null-out codegen.
  */
abstract class ImageHeaderExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
}

case class ImageFmt(child: Expression) extends ImageHeaderExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.ImageHeaderKernel.fmt(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // ctx.freshName, never a fixed local: nullSafeCodeGen only braces the
    // snippet when the child is nullable, so two instances of this
    // expression in one codegen scope (alias-substituted filter + project)
    // would declare duplicate Java locals, janino would refuse, and the
    // stage would silently fall back to interpreted eval (the
    // VectorExpressions convention).
    nullSafeCodeGen(ctx, ev, c => {
      val f = ctx.freshName("imgFmt")
      s"""
      UTF8String $f = graft.functions.ImageHeaderKernel.fmt($c);
      if ($f == null) { ${ev.isNull} = true; } else { ${ev.value} = $f; }
    """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ImageWidth(child: Expression, maxSegments: Int)
    extends ImageHeaderExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.ImageHeaderKernel
      .width(input.asInstanceOf[Array[Byte]], maxSegments)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // ctx.freshName — see ImageFmt.doGenCode
    nullSafeCodeGen(ctx, ev, c => {
      val w = ctx.freshName("imgW")
      s"""
      Integer $w = graft.functions.ImageHeaderKernel.width($c, $maxSegments);
      if ($w == null) { ${ev.isNull} = true; } else { ${ev.value} = $w.intValue(); }
    """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ImageHeight(child: Expression, maxSegments: Int)
    extends ImageHeaderExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.ImageHeaderKernel
      .height(input.asInstanceOf[Array[Byte]], maxSegments)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // ctx.freshName — see ImageFmt.doGenCode
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("imgH")
      s"""
      Integer $h = graft.functions.ImageHeaderKernel.height($c, $maxSegments);
      if ($h == null) { ${ev.isNull} = true; } else { ${ev.value} = $h.intValue(); }
    """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageExpressions {
  def image_fmt(bin: Column): Column =
    ExpressionUtils.column(ImageFmt(ExpressionUtils.expression(bin)))

  def image_width(bin: Column, maxSegments: Int): Column =
    ExpressionUtils.column(
      ImageWidth(ExpressionUtils.expression(bin), maxSegments))

  def image_height(bin: Column, maxSegments: Int): Column =
    ExpressionUtils.column(
      ImageHeight(ExpressionUtils.expression(bin), maxSegments))
}
