package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.TextExpressions

/** The fused per-row RLE counter must be EXACTLY explode + groupBy:
  * every text-tier rewrite onto tokenCounts (r17) rests on this
  * equivalence, including the null-key and empty/NULL-array edges.
  */
class TokenCountsSpec extends AnyFunSuite {
  import TestSpark.spark

  private def viaExpr(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"), explode(TextExpressions.tokenCounts(col("arr"))).as("s"))
    .select(col("id"), col("s.t").as("t"), col("s.c").as("c"))

  private def viaGroupBy(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"), explode(col("arr")).as("t"))
    .groupBy(col("id"), col("t")).agg(count(lit(1)).as("c"))

  test("tokenCounts == explode+groupBy on duplicates, unicode, null elements") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("b", "a", "b", "a", "b")),
      (2L, Seq("x")),
      (3L, Seq("é", "日本", "é", "", "")),
      (4L, Seq[String](null, "a", null))
    ).toDF("id", "arr")
    val got = viaExpr(df).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = viaGroupBy(df).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.contains((1L, "b", 3L)) && got.contains((3L, "", 2L)))
    assert(got.contains((4L, null, 2L)))
  }

  test("tokenCounts of empty and NULL arrays emits no rows, like explode of the old rollup") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq.empty[String]), (2L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "arr")
    assert(viaExpr(df).count() == 0L)
  }

  test("tokenCounts over charNgrams matches the old ngram_lm dg frame on corpus docs") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id").as("id"),
        graft.functions.TextFunctions.charNgrams("text", 2).as("arr"))
    val got = viaExpr(docs)
    val want = viaGroupBy(docs)
    assert(got.exceptAll(want).count() == 0L && want.exceptAll(got).count() == 0L)
  }
}
