package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions AND its flagship pipelines for SQL users.
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `withExtensions(new GraftExtensions)`); after that
  * `SELECT float_vec_dot(a, b)`, `word_shingles(toks, k)`,
  * `char_ngrams(text, n)`, `morton_interleave(x, y)` and
  * `qround(x, s)` (the cross-engine float quantization contract —
  * see [[graft.queries.QRound]]) work in plain SQL — the same codegen'd expressions the DataFrame API gets from
  * VectorExpressions / TextExpressions / LayoutExpressions — the
  * BandJoinRewrite optimizer rule is active, and the pipeline TABLE
  * functions compose in FROM clauses:
  *
  * {{{
  *   SELECT * FROM dedup_verdicts('/data/sf0.01') WHERE verdict = 'drop';
  *   SELECT * FROM text_quality_filter('/data/sf0.01');
  *   SELECT * FROM content_defined_chunks('/data/sf0.01');
  *   SELECT * FROM graft_query('tpch_q1_pricing_summary', '/data/sf0.01');
  * }}}
  *
  * Each TVF expands to the SAME logical plan the registered query
  * builds (the registry is the single source of truth), so a pure-SQL
  * user gets the identical oracle-gated semantics — and Catalyst
  * optimizes straight through the expansion (filters push into the
  * underlying scans; there is no materialization boundary).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.StringType

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: size argument must be an integer literal, got $other")
  }

  private def strArg(e: Expression, fn: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) if s != null =>
      s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be a string literal, got $other")
  }

  /** Registers `name(dir)` as a table function expanding to registered
    * query `query` over the parquet tables in `dir`.
    */
  private def pipelineTvf(ext: SparkSessionExtensions, name: String, query: String): Unit =
    ext.injectTableFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo("graft.SparkEntry", name),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 1, s"$name expects one argument: the data directory")
        queryPlan(query, strArg(exprs.head, name))
      }))

  private def queryPlan(query: String, dir: String): LogicalPlan = {
    val fns = graft.SparkEntry.queries
    require(fns.contains(query),
      s"unknown graft query '$query'; see SparkEntry.queries.keys")
    fns(query)(org.apache.spark.sql.SparkSession.active, dir)
      .queryExecution.logical
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
    // qround(x, s): the repo's cross-engine float contract as a SQL
    // function — the EXACT expression tree QRound.col builds
    // (floor(x·10^s + 0.5)/10^s, pure IEEE, bit-identical on any
    // engine that evaluates it in doubles; DuckDB twin:
    // `floor(x * 1e<s> + 0.5) / 1e<s>`). Finite inputs only and
    // |x|·10^s < 2^53 — see the QRound scaladoc.
    ext.injectFunction((
      new FunctionIdentifier("qround"),
      new ExpressionInfo("graft.queries.QRound", "qround"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "qround expects (x, scale)")
        import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Floor, Multiply}
        val p = Literal(math.pow(10.0, intArg(exprs(1), "qround")))
        Divide(Floor(Add(Multiply(exprs.head, p), Literal(0.5))), p)
      }))
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
    // flagship pipelines as SQL table functions, plus the generic escape
    // hatch over the whole registry
    pipelineTvf(ext, "dedup_verdicts", "dedup_verdicts")
    pipelineTvf(ext, "text_quality_filter", "text_quality_filter")
    pipelineTvf(ext, "content_defined_chunks", "content_defined_chunks")
    ext.injectTableFunction((
      new FunctionIdentifier("graft_query"),
      new ExpressionInfo("graft.SparkEntry", "graft_query"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2,
          "graft_query expects (query name, data directory)")
        queryPlan(strArg(exprs.head, "graft_query"), strArg(exprs(1), "graft_query"))
      }))
  }
}
