package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Storage-layout analytics: Z-order (Morton) clustering — the
  * multi-dimensional sort key that makes min/max file skipping work
  * for range predicates on EITHER dimension at 100 TB. Sorting by an
  * interleaved key tiles the (x, y) grid into aligned blocks, so every
  * contiguous key range (≈ one output file) has tightly bounded
  * per-column min/max stats — the property a lakehouse's data-skipping
  * index exploits.
  *
  * The query quantizes two lineitem dimensions to 6-bit ranks with
  * pure integer arithmetic (exact cross-engine), interleaves them into
  * a 12-bit Morton key, and rolls up per 64-key bucket. Because the 6
  * low Morton bits hold 3 bits of each dimension, every bucket is an
  * aligned 8×8 tile — the per-bucket min/max spans are provably ≤ 8,
  * which LayoutSpec asserts (the sharp form of "files stay skippable
  * on both columns").
  */
object LayoutAnalytics {

  /** Per-row Morton frame (qx, qy, z) over lineitem — the write-side
    * clustering key. ScalePostureSpec writes this frame z-clustered vs
    * round-robin and proves the skipping payoff at read time (a
    * tile-range scan materializes a fraction of the rows).
    */
  def mortonFrame(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("q"),
        expr("unix_seconds(CAST(l_shipdate AS TIMESTAMP)) div 86400").as("day"))
    val bounds = days.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    days.crossJoin(broadcast(bounds))
      // integer quantization: exact and identical in both engines
      .withColumn("qx", least(col("q"), lit(63L)))
      .withColumn("qy", expr("((day - d0) * 63) div greatest(d1 - d0, 1)"))
      // fused codegen'd bit-twiddle interleave (plans/LayoutExpressions)
      // — semantics identical to the oracle's per-bit arithmetic
      .withColumn("z", graft.plans.LayoutExpressions.morton(col("qx"), col("qy")))
      .select(col("qx"), col("qy"), col("z"))
  }

  private def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    mortonFrame(spark, dir)
      .groupBy(expr("z div 64").as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("qx")).as("qx_min"), max(col("qx")).as("qx_max"),
        min(col("qy")).as("qy_min"), max(col("qy")).as("qy_max"))
      .withColumn("covered_cells",
        (col("qx_max") - col("qx_min") + 1) * (col("qy_max") - col("qy_min") + 1))
  }

  private val zorderOracle = {
    val morton = (0 until 6).map(i =>
      s"(((qx >> $i) & 1) << ${2 * i}) + (((qy >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS q,
       |         CAST(FLOOR(EPOCH(l_shipdate)) AS BIGINT) // 86400 AS day
       |  FROM lineitem),
       |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
       |ranked AS (
       |  SELECT least(q, 63) AS qx,
       |         ((day - d0) * 63) // greatest(d1 - d0, 1) AS qy
       |  FROM d CROSS JOIN b),
       |z AS (SELECT qx, qy, $morton AS z FROM ranked)
       |SELECT CAST(z // 64 AS BIGINT) AS z_bucket, count(*) AS n_rows,
       |       CAST(min(qx) AS BIGINT) AS qx_min, CAST(max(qx) AS BIGINT) AS qx_max,
       |       CAST(min(qy) AS BIGINT) AS qy_min, CAST(max(qy) AS BIGINT) AS qy_max,
       |       CAST((max(qx) - min(qx) + 1) * (max(qy) - min(qy) + 1) AS BIGINT) AS covered_cells
       |FROM z GROUP BY 1""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("zorder_layout", Some(zorderOracle), zorderLayout),
  )
}
