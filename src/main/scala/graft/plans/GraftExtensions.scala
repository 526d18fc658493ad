package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL users. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `withExtensions(new GraftExtensions)`); after that
  * `SELECT float_vec_dot(a, b)` works in plain SQL — same codegen'd
  * expression the DataFrame API gets from VectorExpressions.dotF32.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(exprs.head, exprs(1))))
  }
}
