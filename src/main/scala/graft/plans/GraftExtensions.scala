package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL users. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `withExtensions(new GraftExtensions)`); after that
  * `SELECT float_vec_dot(a, b)`, `word_shingles(toks, k)`,
  * `char_ngrams(text, n)` and `morton_interleave(x, y)` work in plain
  * SQL — the same codegen'd expressions the DataFrame API gets from
  * VectorExpressions / TextExpressions / LayoutExpressions — and the
  * BandJoinRewrite optimizer rule is active.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: size argument must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // scale-rescue rewrite: pure `abs(x - y) <= band` inner joins
    // become bucketed equi-joins instead of nested-loop products
    ext.injectOptimizerRule(_ => BandJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("morton_interleave"),
      new ExpressionInfo(classOf[MortonInterleave].getName, "morton_interleave"),
      (exprs: Seq[Expression]) => MortonInterleave(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) =>
        WordShingles(exprs.head, intArg(exprs(1), "word_shingles"))))
    // trim the input exactly like the DataFrame helper
    // (TextFunctions.charNgrams) — the two public surfaces of the
    // "same" function must agree on whitespace handling
    ext.injectFunction((
      new FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (exprs: Seq[Expression]) =>
        CharNgrams(
          org.apache.spark.sql.catalyst.expressions.StringTrim(exprs.head),
          intArg(exprs(1), "char_ngrams"))))
  }
}
