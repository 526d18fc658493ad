package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Morton (Z-order) bit interleave of two bucket ranks.
  *
  * The composed-builtin form is a 2k-term sum of
  * `shiftleft(shiftright(...) & 1, ...)` expressions — correct and
  * codegen'd, but the generated code walks 4 ops per bit and the
  * expression tree grows with the bit width. This expression emits the
  * classic constant-time bit-twiddle instead: each 16-bit rank spreads
  * through three shift-or-mask rounds, then the halves interleave with
  * one final or — a handful of ALU ops regardless of bit width.
  *
  * Semantics are pinned to the arithmetic form for the low 16 bits of
  * each input (the z-key of `zorder_layout` uses 6), so swapping it in
  * does not perturb the DuckDB oracle, which keeps stating the
  * per-bit arithmetic. Negative or >16-bit inputs are masked to their
  * low 16 bits — the caller quantizes first, same contract as the
  * arithmetic form.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"MortonInterleave requires (bigint, bigint), got ${left.dataType} / ${right.dataType}")
    }
  }

  @inline private def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $x = $a & 0xffffL;
         |$x = ($x | ($x << 8)) & 0x00ff00ffL;
         |$x = ($x | ($x << 4)) & 0x0f0f0f0fL;
         |$x = ($x | ($x << 2)) & 0x33333333L;
         |$x = ($x | ($x << 1)) & 0x55555555L;
         |long $y = $b & 0xffffL;
         |$y = ($y | ($y << 8)) & 0x00ff00ffL;
         |$y = ($y | ($y << 4)) & 0x0f0f0f0fL;
         |$y = ($y | ($y << 2)) & 0x33333333L;
         |$y = ($y | ($y << 1)) & 0x55555555L;
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutExpressions {
  /** Column API: fused Morton interleave of two long ranks. */
  def morton(x: Column, y: Column): Column =
    ColumnBridge.column(MortonInterleave(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
