package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.QRound

/** Executable record of the r14 float knife-edge class
  * (FULL_ORACLE_sf1_r14.json): the exact doubles that split Spark's
  * native `round` from DuckDB's, and the cross-engine-stable QRound
  * quantization that replaced it on the iterative-float surfaces.
  */
class QRoundSpec extends AnyFunSuite {
  import TestSpark.spark

  // THE knife-edge double: shortest decimal repr is "1.3708125" but
  // the exact binary value is 1.37081249999999998934... — BELOW the
  // .5 boundary. Spark's native round feeds the shortest repr to
  // HALF_UP (-> .813); DuckDB rounds the exact binary value
  // (-> .812). One ulp lower (1.3708124999999998, exact
  // ...97672972...) the shortest repr is itself below the boundary
  // and both engines' natives agree on .812 — r14's red test pinned
  // that neighbor by mistake and blamed the evaluation path.
  private val KnifeEdge = 1.3708125
  private val UlpBelow = 1.3708124999999998

  test("Spark's native round splits from the exact-binary round on the knife edge") {
    // route through parquet so the assertion exercises the runtime
    // column path the r14 sf1 oracle sweep measured (a constant-folded
    // literal is a different evaluation path; both give the same
    // answer here, but the pin should be on the path the finding came
    // from)
    val dir = java.nio.file.Files.createTempDirectory("qround").toString
    val s = spark
    import s.implicits._
    Seq(KnifeEdge, UlpBelow).toDF("x").write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir).select(
        col("x"),
        round(col("x"), 6).as("native"),
        QRound.col(col("x"), 6).as("qround"))
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // DuckDB's native semantics: round the EXACT binary value
    def exactBinaryRound(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    // the split: Spark native .813 (shortest-repr HALF_UP), DuckDB
    // native .812 (exact binary below the boundary)
    assert(rows(KnifeEdge)._1 == 1.370813, "Spark native: shortest-repr HALF_UP")
    assert(exactBinaryRound(KnifeEdge) == 1.370812, "DuckDB native: exact binary value")
    // QRound is the same pure-IEEE formula on both engines, so it
    // CANNOT split — it answers .813 here (x*1e6 rounds up to exactly
    // 1370812.5) and that answer is engine-independent by construction
    assert(rows(KnifeEdge)._2 == 1.370813, "QRound: identical on both engines")
    assert(rows(KnifeEdge)._2 == math.floor(KnifeEdge * 1e6 + 0.5) / 1e6)
    // one ulp below, no split anywhere: both natives and QRound say .812
    assert(rows(UlpBelow)._1 == 1.370812)
    assert(exactBinaryRound(UlpBelow) == 1.370812)
    assert(rows(UlpBelow)._2 == 1.370812)
  }

  test("QRound matches the pure-IEEE reference on regular and boundary values") {
    val vals = Seq(KnifeEdge, 0.5930624999999998, 0.1234565, -0.59769169049,
      0.0, 1.0, 123.456789, -0.5000005)
    val s = spark
    import s.implicits._
    val got = vals.toDF("x")
      .select(QRound.col(col("x"), 6).as("q6"), QRound.col(col("x"), 9).as("q9"))
      .collect()
    vals.zip(got).foreach { case (x, r) =>
      assert(r.getDouble(0) == math.floor(x * 1e6 + 0.5) / 1e6, s"q6($x)")
      assert(r.getDouble(1) == math.floor(x * 1e9 + 0.5) / 1e9, s"q9($x)")
    }
  }

  test("the duck twin emits the identical IEEE formula") {
    assert(QRound.duck("r", 6) == "floor((r) * 1e6 + 0.5) / 1e6")
    assert(QRound.duck("w1 - s1/n", 9) == "floor((w1 - s1/n) * 1e9 + 0.5) / 1e9")
  }

  test("qround(x, s) is registered for SQL users and matches QRound.col") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    var ext: SparkSession = null
    try {
      ext = SparkSession.builder()
        .master("local[2]").appName("qround-ext-test")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      // the knife edge through the SQL surface: same answer as
      // QRound.col, engine-independent by construction
      val r = ext.sql(s"SELECT qround(x, 6) AS q6, qround(x, 9) AS q9 " +
        s"FROM (SELECT CAST($KnifeEdge AS DOUBLE) AS x)").head()
      assert(r.getDouble(0) == math.floor(KnifeEdge * 1e6 + 0.5) / 1e6)
      assert(r.getDouble(1) == math.floor(KnifeEdge * 1e9 + 0.5) / 1e9)
      // non-literal scale is rejected (the formula must fold the power)
      intercept[Exception] {
        ext.sql("SELECT qround(1.5, CAST(rand() * 3 AS INT))").collect()
      }
    } finally {
      // session-scoped cleanup (ADVICE r15): ext.stop() is NOT the fix —
      // the builder reuses the one JVM-wide SparkContext, so stop() here
      // would kill the shared TestSpark context for every suite after
      // this one. Clear the extension session's listener bus and cached
      // relations instead; the session object itself becomes unreachable
      // once default/active are restored below.
      if (ext != null) {
        assert(ext.sparkContext eq spark.sparkContext,
          "ext unexpectedly owns its own SparkContext; stop() it instead")
        ext.listenerManager.clear()
        ext.catalog.clearCache()
      }
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("Scala-computed decimal literals are NOT their parsed forms (the PrBase trap)") {
    // 1 - 0.85 computed in doubles lands one ULP above the parse of
    // "0.15" — an engine/oracle literal asymmetry that compounds
    // through iterative queries onto knife edges; literals must be
    // DECLARED, never computed
    assert(1.0 - 0.85 != 0.15)
    assert(1.0 - 0.85 == 0.15000000000000002)
    // while exactly-representable complements are safe (the Bm25B case)
    assert(1.0 - 0.75 == 0.25)
  }
}
