package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd fused dot product over two float vectors.
  *
  * The composed-builtin form (`aggregate(zip_with(a, b, multiply),
  * sum)`) materializes an intermediate double array per row and walks
  * the vectors once per fold; this expression is a single fused loop
  * with three scalar accumulators, generated into whole-stage codegen.
  * Used by the ANN / near-dup operators where the pairwise similarity
  * loop dominates (each candidate pair costs exactly one pass over the
  * two vectors, no allocation).
  *
  * Accumulation is sequential in index order, in double precision —
  * bit-identical to the fold form and to the DuckDB oracle's
  * `list_aggregate(list_transform(...), 'sum')`, so swapping this in
  * does not perturb oracle comparisons.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  private def isFloatArray(dt: DataType): Boolean =
    dt == ArrayType(FloatType, false) || dt == ArrayType(FloatType, true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"FloatVecDot requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API: fused float-vector dot product. */
  def dotF32(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
