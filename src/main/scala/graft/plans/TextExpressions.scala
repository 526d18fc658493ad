package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingling/n-gram expressions.
  *
  * The composed-builtin forms (`transform(sequence(...), i ->
  * concat_ws(' ', element_at(toks, i), ...))`) are correct but
  * quadratic after optimization: CollapseProject inlines the `split`
  * that produced `toks` into EVERY `element_at` inside the lambda, so
  * each shingle re-splits the whole document. On a 100-token document
  * that is ~300 full splits per row — the single hottest cost in the
  * dedup tier. These expressions take the token array / text once and
  * emit all shingles in one pass; the loop lives in a static helper
  * invoked from generated code, so the surrounding plan stays inside
  * whole-stage codegen.
  */
object TextExprUtil {
  private val Space = UTF8String.fromString(" ")
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Shared immutable empty result — also the NULL-input result, so the
    * expressions keep the composed-builtin contract they replaced
    * ("empty array when shorter than n" extends to missing input) and
    * size()/aggregation consumers never see NULL.
    */
  def emptyArray(): ArrayData = Empty

  /** All word k-shingles of `arr` (k consecutive tokens joined by a
    * space, nulls skipped like concat_ws); empty when fewer than k.
    */
  def wordShingles(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return Empty
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All character n-grams of `s` (codepoint semantics, same as
    * `substring(s, i, n)`); empty when shorter than n.
    */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return Empty
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-row multiplicities of a string array: one struct<t, c> per
    * DISTINCT element, counted by sort + run-length encoding inside the
    * row. Grouping semantics are exactly `explode` + `groupBy(t)`:
    * UTF8String equality IS binary equality, and a null element groups
    * under the null key like SQL GROUP BY. Output order (binary-sorted,
    * nulls first) is deterministic but carries no contract — every
    * consumer re-aggregates or re-sorts.
    */
  def tokenCounts(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return Empty
    val items = new Array[UTF8String](n)
    var m = 0
    var nulls = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1
      else { items(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(items, 0, m,
      null.asInstanceOf[java.util.Comparator[UTF8String]])
    val out = new java.util.ArrayList[Any](math.min(m, 16) + 1)
    if (nulls > 0) {
      out.add(new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](null, nulls)))
    }
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && items(j).equals(items(i))) j += 1
      out.add(new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](items(i), (j - i).toLong)))
      i = j
    }
    new GenericArrayData(out.toArray)
  }
}

case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // NULL input yields the empty array (the composed-builtin CASE form
  // this expression replaced did the same) — never NULL out
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WordShingles requires array<string> input, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextExprUtil.emptyArray()
    else TextExprUtil.wordShingles(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
           |${CodeGenerator.javaType(dataType)} ${ev.value} = ${c.isNull}
           |  ? graft.plans.TextExprUtil.emptyArray()
           |  : graft.plans.TextExprUtil.wordShingles(${c.value}, $k);
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // NULL input yields the empty array — see WordShingles
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CharNgrams requires string input, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextExprUtil.emptyArray()
    else TextExprUtil.charNgrams(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
           |${CodeGenerator.javaType(dataType)} ${ev.value} = ${c.isNull}
           |  ? graft.plans.TextExprUtil.emptyArray()
           |  : graft.plans.TextExprUtil.charNgrams(${c.value}, $n);
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-row distinct-element counter — the map-side half of every
  * "explode tokens/grams, then groupBy(doc_id, g).count" frame in the
  * text tier. The counts are complete WITHIN a row (doc), so emitting
  * them from the row itself turns the (doc, gram)-volume exchange +
  * hash aggregate into pure scan-side work: `explode(tokenCounts(...))`
  * yields the identical (doc_id, t, c) rows the old rollup produced,
  * one per distinct element, no shuffle (guide §2.3/§2.4 — aggregate
  * before you shuffle, taken to its limit: aggregate before you EMIT).
  */
case class TokenCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("t", StringType, nullable = true),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  // NULL input yields the empty array — explode of the old NULL token
  // array emitted no rows, and explode(empty) emits none either
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"TokenCounts requires array<string> input, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextExprUtil.emptyArray()
    else TextExprUtil.tokenCounts(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
           |${CodeGenerator.javaType(dataType)} ${ev.value} = ${c.isNull}
           |  ? graft.plans.TextExprUtil.emptyArray()
           |  : graft.plans.TextExprUtil.tokenCounts(${c.value});
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API: word k-shingles of a token-array column. */
  def wordShingles(toks: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(toks), k))

  /** Column API: character n-grams of a string column. */
  def charNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(text), n))

  /** Column API: per-row distinct-element counts of a string-array
    * column, as array<struct<t: string, c: long>>.
    */
  def tokenCounts(arr: Column): Column =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(arr)))
}
