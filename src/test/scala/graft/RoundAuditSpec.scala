package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.RoundAudit
import graft.tools.RoundAudit.{Entry, Site}

/** Executable twin of ROUND_AUDIT.md (VERDICT r15 item 3): every native
  * `round(` call site under src/main must carry a committed
  * classification in round_audit_sites.tsv, so a new rational-valued
  * (U-class) site cannot land unclassified — the exact drift that
  * produced the r14 lr divergence and the three U3 sites r16's own
  * sweep found (chars_per_token, train_acc/pred_pos_rate, KMV trio).
  */
class RoundAuditSpec extends AnyFunSuite {
  private lazy val current: Map[Site, Int] = RoundAudit.extract()
  private lazy val listed: Seq[Entry] = RoundAudit.readList()

  test("every native round( site is classified; no stale entries") {
    val listedMap = listed.map(e => e.site -> e.count).toMap
    val unlisted = current.keySet -- listedMap.keySet
    assert(unlisted.isEmpty,
      s"\nUNCLASSIFIED native round( sites — classify each under the " +
        s"ROUND_AUDIT.md four-class rule (or swap to QRound) and " +
        s"regenerate with `runMain graft.tools.RoundAudit --write`:\n" +
        unlisted.toSeq.sortBy(_.key).map(s => s"  ${s.file}: ${s.snippet}")
          .mkString("\n"))
    val stale = listedMap.keySet -- current.keySet
    assert(stale.isEmpty,
      s"\nStale round_audit_sites.tsv entries (site no longer in source " +
        s"— regenerate the list):\n" +
        stale.toSeq.sortBy(_.key).map(s => s"  ${s.file}: ${s.snippet}")
          .mkString("\n"))
    val drifted = current.filter { case (s, n) => listedMap(s) != n }
    assert(drifted.isEmpty,
      s"\nOccurrence-count drift (a site was added or removed on an " +
        s"already-listed line — re-audit and regenerate):\n" +
        drifted.map { case (s, n) =>
          s"  ${s.file}: ${s.snippet} (listed ${listedMap(s)}, found $n)"
        }.mkString("\n"))
  }

  test("every listed class is in the taxonomy and none is UNCLASSIFIED") {
    val bad = listed.filterNot(e => RoundAudit.AllowedClasses(e.clazz))
    assert(bad.isEmpty,
      "\nEntries outside the ROUND_AUDIT.md taxonomy " +
        s"(${RoundAudit.AllowedClasses.toSeq.sorted.mkString("/")}):\n" +
        bad.map(e => s"  ${e.clazz}\t${e.site.file}: ${e.site.snippet}")
          .mkString("\n"))
  }

  test("the detector itself reds on a fresh unlisted site (self-test)") {
    val found = RoundAudit.extractFrom("synthetic.scala",
      """val a = round(x / y, 6)          // native: must be caught
        |val b = qround(x, 6)             // registered QRound SQL fn: exempt
        |val c = bround(x, 6)             // banker's: separate fn, exempt
        |// round(comment, 6) is not a site
        |/* round(block, 6) neither */
        |val d = math.round(z * 100)      // JVM native rounding: caught
        |""".stripMargin)
    assert(found.map(_.snippet) ==
      Seq("val a = round(x / y, 6)", "val d = math.round(z * 100)"))
  }

  test("S4 guard: outlier_events output is bounded away from the signed-zero trap") {
    // ROUND_AUDIT S4: z_score keeps native round ONLY because the
    // |value-mean| > 3*std filter bounds every emitted |z| strictly
    // above 3 (no tiny-negative can round to -0.0) while std==0 groups
    // can still emit ±Inf (which QRound's floor would corrupt). This
    // pins the invariant the classification relies on.
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("outlier_events")(spark, TestSpark.sf)
      .select("z_score").collect()
    assert(rows.nonEmpty, "guard vacuous: no outliers at test scale")
    rows.foreach { r =>
      val z = r.getDouble(0)
      assert(z.isNaN == false && math.abs(z) > 3.0,
        s"outlier z_score $z violates the |z|>3 S4 guard")
    }
  }
}
