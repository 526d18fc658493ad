package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions

/** CLI probe for the custom Catalyst expressions: edge inputs (nulls,
  * mismatched lengths, empties) through the public Column API, plus a
  * codegen-vs-interpreted consistency check.
  * Usage: runMain graft.ExprDemo
  */
object ExprDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = Seq(
      ("both", Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(4.0f, 5.0f, 6.0f))),
      ("null_right", Some(Seq(1.0f, 2.0f)), None),
      ("mismatch", Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(10.0f))),
      ("empty", Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("case", "a", "b")
      .withColumn("dot", VectorExpressions.dotF32(col("a"), col("b")))

    df.collect().foreach(r =>
      println(s"[expr-demo] ${r.getString(0)}: dot=${if (r.isNullAt(3)) "NULL" else r.getDouble(3)}"))

    // codegen vs interpreted must agree
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = df.collect().map(r => if (r.isNullAt(3)) null else r.getDouble(3)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val gen = df.collect().map(r => if (r.isNullAt(3)) null else r.getDouble(3)).toSeq
    println(s"[expr-demo] codegen==interpreted: ${interp == gen}")
    spark.stop()
  }
}
