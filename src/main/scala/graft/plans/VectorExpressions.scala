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

/** Codegen'd fused hyperplane-sign signature: bit j of the result is
  * set iff plane_j · v > 0, all planes evaluated in ONE pass over the
  * vector with no intermediate arrays.
  *
  * The composed-builtin form (`when(aggregate(zip_with(typedLit(plane),
  * v, h*x), sum) > 0, 1<<j)` summed over j) runs the higher-order
  * lambdas INTERPRETED — Spark's array HOFs have no codegen — so every
  * row pays planes × dims boxed lambda invocations plus a zipped
  * double-array allocation per plane; on the LSH band-signature path
  * that interpreted fold dominated the whole near-dup query. Each dot
  * here accumulates sequentially in index order in double precision
  * (plane value × float element promoted to double), bit-identical to
  * the fold form and to the DuckDB oracle's list_aggregate twin.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  private def isFloatArray(dt: DataType): Boolean =
    dt == ArrayType(FloatType, false) || dt == ArrayType(FloatType, true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isFloatArray(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"HyperplaneSig requires array<float> input, got ${child.dataType}")

  override def nullSafeEval(a: Any): Any =
    HyperplaneSig.sig(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HyperplaneSig.sig($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Shared eval/codegen kernel — sequential per-plane fold, sign bit. */
  def sig(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var out = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(p.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += p(i) * v.getFloat(i).toDouble; i += 1 }
      if (s > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Codegen'd fused squared-L2 distance between two vectors, each an
  * array<float> or array<double> column: sum_i (a_i - b_i)^2 with both
  * elements promoted to double, accumulated sequentially in index
  * order — bit-identical to the `aggregate(zip_with(a, b, (x,y) =>
  * (x-y)*(x-y)), sum)` fold it replaces (which ran interpreted: array
  * HOFs have no codegen) and to the DuckDB list_aggregate twin. Used
  * on the PQ/kmeans assignment paths where the distance loop runs per
  * (vector × centroid) joined row.
  */
case class VecL2Dist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  private def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"VecL2Dist2 requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  private def leftIsFloat = elem(left.dataType).contains(FloatType)
  private def rightIsFloat = elem(right.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val getA = if (leftIsFloat) s"((double) $a.getFloat($i))" else s"$a.getDouble($i)"
      val getB = if (rightIsFloat) s"((double) $b.getFloat($i))" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $getA - $getB;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd PQ asymmetric-distance (ADC) sum: codes is one vector's
  * per-block centroid ids (array<long>, index = block), lut one
  * probe's flattened block-distance table (array<long>, index =
  * block*cells + cid, cells = lut.length / codes.length); the result
  * is sum_b lut[b*cells + codes[b]].
  *
  * This replaces the exploded form — a (blk, cid) equi-join of
  * per-block code ROWS against the broadcast LUT followed by a
  * probes×vectors×blocks hash-aggregate — with one array lookup loop
  * per (probe, vector) pair: 16× fewer rows through the join for
  * 16-block codes, no aggregate at all. Long addition over the same
  * quantized micro-unit entries is order-independent, so the sum is
  * bit-identical to the grouped sum(bd) it replaces and the DuckDB
  * oracle's grouped form.
  */
case class PqAdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PqAdcSum requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    PqAdcSum.sum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.PqAdcSum.sum($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcSum {
  /** Shared eval/codegen kernel. */
  def sum(codes: ArrayData, lut: ArrayData): Long = {
    val nb = codes.numElements()
    require(nb > 0 && lut.numElements() % nb == 0,
      s"LUT length ${lut.numElements()} is not a multiple of block count $nb")
    val cells = lut.numElements() / nb
    var acc = 0L
    var b = 0
    while (b < nb) {
      // null elements fail loudly: getLong on a null UnsafeArrayData
      // slot returns 0, which is a VALID code/LUT value — a silent
      // wrong sum, unlike every other guard in this kernel
      require(!codes.isNullAt(b), s"null code at block $b")
      // range-check the LONG before narrowing: a corrupt cid >= 2^32
      // would otherwise truncate into the valid range and silently
      // read the wrong cell
      val cl = codes.getLong(b)
      require(cl >= 0 && cl < cells, s"code $cl out of range [0, $cells)")
      val slot = b * cells + cl.toInt
      require(!lut.isNullAt(slot), s"null LUT entry at slot $slot")
      acc += lut.getLong(slot)
      b += 1
    }
    acc
  }
}

object VectorExpressions {
  /** Column API: fused float-vector dot product. */
  def dotF32(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: fused squared-L2 distance (array<float|double> × 2). */
  def l2Dist2(a: Column, b: Column): Column =
    ColumnBridge.column(VecL2Dist2(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: fused hyperplane sign-bit signature (bit j = sign of
    * planes(j) · v), one pass over the vector.
    */
  def planeSig(v: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(v),
      planes.map(_.toArray).toArray))

  /** Column API: fused PQ ADC sum over (per-block codes, flattened
    * per-probe LUT), both array<bigint>.
    */
  def adcSum(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdcSum(ColumnBridge.expression(codes), ColumnBridge.expression(lut)))
}
