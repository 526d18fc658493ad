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

  // the rank value three sf1 nodes landed on: shortest decimal repr is
  // "1.3708125" but the binary value is below the .5 boundary
  private val KnifeEdge = 1.3708124999999998

  test("Spark's native round splits from the exact value on the knife edge") {
    val row = spark.range(1).select(
      round(lit(KnifeEdge), 6).as("native"),
      QRound.col(lit(KnifeEdge), 6).as("qround"))
      .collect()(0)
    // Spark rounds the SHORTEST repr ("1.3708125") HALF_UP -> .813;
    // the exact binary value is below the boundary -> .812 (DuckDB's
    // answer, and QRound's on both engines)
    assert(row.getDouble(0) == 1.370813, "native round via shortest-repr HALF_UP")
    assert(row.getDouble(1) == 1.370812, "QRound quantizes the exact binary value")
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
