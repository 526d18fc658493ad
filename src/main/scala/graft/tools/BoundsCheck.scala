package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-scale re-assertion of the three engine-private (rows-only)
  * queries' accuracy bounds (VERDICT r15 item 6): q5_uv_approx,
  * uv_sketch_rollup and column_stats have no SQL oracle by design
  * (Bloom/HLL/Datasketches internals differ across engines) and are
  * bounded against exact twins in specs at TEST scale only — this main
  * runs the SAME bound checks on an arbitrary corpus (testdata_sf10)
  * and records the measured errors, so the trio carries at-scale
  * evidence like the hash-exact registry.
  *
  * Usage: runMain graft.tools.BoundsCheck <sfDir> <outJson>
  */
object BoundsCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bounds-check")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

    // 1. q5_uv_approx (Bloom-gated UV) vs q4_uv_hourly (exact distinct):
    //    spec bound |approx - exact| <= 10% * exact + 2 per window
    val uvJoined = q("q4_uv_hourly")(spark, sfDir)
      .join(q("q5_uv_approx")(spark, sfDir), "window_start")
      .select(col("uv"), col("uv_approx"),
        (abs(col("uv_approx") - col("uv")) /
          greatest(col("uv").cast("double"), lit(1.0))).as("rel_err"),
        (abs(col("uv_approx") - col("uv")) >
          col("uv") * 0.1 + lit(2)).cast("long").as("viol"))
      .agg(count(lit(1)).as("n"), max(col("rel_err")).as("max_rel"),
        avg(col("rel_err")).as("avg_rel"), sum(col("viol")).as("viols"))
      .first()
    val uvJson =
      s"""{"windows": ${uvJoined.getLong(0)}, "max_rel_err": ${fmt(uvJoined.getDouble(1))}, """ +
      s""""avg_rel_err": ${fmt(uvJoined.getDouble(2))}, "bound": "10% + 2", """ +
      s""""violations": ${uvJoined.getLong(3)}}"""
    println(s"[bounds] q5_uv_approx: $uvJson")

    // 2. uv_sketch_rollup: daily-HLL union == direct sketch (exact
    //    associativity), estimate within 5% + 2 of exact, day-sum is an
    //    upper bound
    val roll = q("uv_sketch_rollup")(spark, sfDir)
    val direct = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("uv_direct"))
    val rollAgg = roll.join(direct, "event_type")
      .select(col("uv_est"), col("uv_exact"), col("uv_day_sum"), col("uv_direct"),
        (abs(col("uv_est") - col("uv_exact")) /
          greatest(col("uv_exact").cast("double"), lit(1.0))).as("rel_err"))
      .agg(count(lit(1)).as("n"),
        sum((col("uv_est") =!= col("uv_direct")).cast("long")).as("union_mismatch"),
        max(col("rel_err")).as("max_rel"),
        sum((abs(col("uv_est") - col("uv_exact")) >
          col("uv_exact") * 0.05 + lit(2)).cast("long")).as("viols"),
        sum((col("uv_day_sum") < col("uv_exact")).cast("long")).as("daysum_below"))
      .first()
    val rollJson =
      s"""{"groups": ${rollAgg.getLong(0)}, "union_vs_direct_mismatches": ${rollAgg.getLong(1)}, """ +
      s""""max_rel_err": ${fmt(rollAgg.getDouble(2))}, "bound": "5% + 2", """ +
      s""""violations": ${rollAgg.getLong(3)}, "day_sum_below_exact": ${rollAgg.getLong(4)}}"""
    println(s"[bounds] uv_sketch_rollup: $rollJson")

    // 3. column_stats (HLL++ rsd=0.02 NDV) vs column_stats_exact:
    //    NDV within 3 sigma ~ 6% + 2; nulls/min/max exactly equal
    val exact = q("column_stats_exact")(spark, sfDir)
      .select(col("column_name"), col("ndv").as("ndv_exact"),
        col("null_count").as("nulls_exact"), col("min_value").as("min_exact"),
        col("max_value").as("max_exact"))
    val csAgg = q("column_stats")(spark, sfDir).join(exact, "column_name")
      .select(col("ndv"), col("ndv_exact"),
        (abs(col("ndv") - col("ndv_exact")) /
          greatest(col("ndv_exact").cast("double"), lit(1.0))).as("rel_err"),
        (abs(col("ndv") - col("ndv_exact")) >
          col("ndv_exact") * 0.06 + lit(2)).cast("long").as("viol"),
        (col("null_count") =!= col("nulls_exact") ||
          col("min_value") =!= col("min_exact") ||
          col("max_value") =!= col("max_exact")).cast("long").as("rest_bad"))
      .agg(count(lit(1)).as("n"), max(col("rel_err")).as("max_rel"),
        sum(col("viol")).as("viols"), sum(col("rest_bad")).as("rest_bad"))
      .first()
    val csJson =
      s"""{"columns": ${csAgg.getLong(0)}, "max_ndv_rel_err": ${fmt(csAgg.getDouble(1))}, """ +
      s""""bound": "6% + 2 (3 sigma at rsd=0.02)", "ndv_violations": ${csAgg.getLong(2)}, """ +
      s""""non_ndv_mismatches": ${csAgg.getLong(3)}}"""
    println(s"[bounds] column_stats: $csJson")

    val ok = uvJoined.getLong(3) == 0 && rollAgg.getLong(1) == 0 &&
      rollAgg.getLong(3) == 0 && rollAgg.getLong(4) == 0 &&
      csAgg.getLong(2) == 0 && csAgg.getLong(3) == 0
    val doc =
      s"""{
         |"check": "at-scale accuracy bounds for the three rows-only (engine-private sketch) queries, re-asserted on $sfDir with the exact spec bounds: q5_uv_approx vs exact UV per window (10%+2), uv_sketch_rollup union==direct + estimate vs exact (5%+2) + day-sum upper bound, column_stats NDV vs column_stats_exact (6%+2, 3-sigma HLL++ rsd 0.02) with non-NDV stats exactly equal",
         |"sf_dir": "$sfDir",
         |"q5_uv_approx": $uvJson,
         |"uv_sketch_rollup": $rollJson,
         |"column_stats": $csJson,
         |"all_bounds_hold": $ok
         |}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), doc + "\n")
    println(s"[bounds] wrote $outJson (all_bounds_hold=$ok)")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
