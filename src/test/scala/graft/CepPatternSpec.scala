package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CepPattern, CepPatterns, StateMachines, StreamingJobs}
import graft.streaming.CepPatterns.CepEv

/** The generic CEP combinator ([[CepPattern]]): NFA semantics (strict
  * next, relaxed followedBy, within, noSkip overlap), equivalence with
  * the hand-rolled login FSM it re-expresses, batch/stream agreement of
  * the incremental fold, and the streaming twin of the registered
  * fail-fail-success query.
  */
class CepPatternSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def ev(sec: Long, id: Long, t: String): (Long, CepEv) = (sec, CepEv(sec, id, t))

  test("strict next with noSkip: overlapping adjacent pairs all match") {
    val p = CepPatterns.loginFail(2)
    val ms = p.foldSorted(Seq(100L, 101L, 102L, 200L).map(s => (s, ())))
    // (100,101) (101,102) — gap 102->200 exceeds within
    assert(ms.map(m => (m.tsOf("first"), m.tsOf("second"))) ==
      Vector((100L, 101L), (101L, 102L)))
  }

  test("pattern login-fail equals the hand-rolled loginFold on a mixed fixture") {
    // the registered q9_login_fail_fsm (and the reference's CEP job)
    // consume the ERROR-FILTERED stream — both forms fold that
    val fails = Seq(100L, 101L, 300L, 301L, 5000L, 5002L)
    val viaFold = StateMachines.loginFold(7L, fails.map((_, true)), maxGapSec = 2)
      .map(w => (w.first_fail, w.last_fail))
    val viaPattern = CepPatterns.loginFail(2)
      .foldSorted(fails.map((_, ())))
      .map(m => (m.tsOf("first"), m.tsOf("second")))
    assert(viaPattern == viaFold)
    assert(viaPattern == Vector((100L, 101L), (300L, 301L), (5000L, 5002L)))
  }

  test("strict step dies on a non-matching event in between") {
    val p = CepPatterns.failFailSuccess(3600)
    // error, view, error, click: the view kills the first partial;
    // (error click) is only 2 steps deep - no match anywhere
    assert(p.foldSorted(Seq(ev(1, 1, "error"), ev(2, 2, "view"),
      ev(3, 3, "error"), ev(4, 4, "click"))).isEmpty)
    // error error click: full match
    val ms = p.foldSorted(Seq(ev(1, 1, "error"), ev(2, 2, "error"), ev(3, 3, "click")))
    assert(ms.map(m => (m.tsOf("f1"), m.tsOf("f2"), m.tsOf("ok"), m("ok").id)) ==
      Vector((1L, 2L, 3L, 3L)))
  }

  test("followedBy skips non-matching events and binds the FIRST match") {
    val p = CepPattern.begin[CepEv]("a")(_.etype == "error")
      .followedBy("b")(_.etype == "purchase")
      .within(100)
    val ms = p.foldSorted(Seq(ev(1, 1, "error"), ev(2, 2, "view"),
      ev(3, 3, "purchase"), ev(4, 4, "purchase")))
    // one match: (1,3). Flink followedBy (not followedByAny) — the 4
    // only matches a partial opened at a later 'error', and there is none
    assert(ms.map(m => (m.tsOf("a"), m.tsOf("b"))) == Vector((1L, 3L)))
  }

  test("within bounds last-minus-first; expired relaxed partials die") {
    val p = CepPattern.begin[CepEv]("a")(_.etype == "error")
      .followedBy("b")(_.etype == "purchase")
      .within(10)
    assert(p.foldSorted(Seq(ev(1, 1, "error"), ev(50, 2, "purchase"))).isEmpty)
    assert(p.foldSorted(Seq(ev(1, 1, "error"), ev(11, 2, "purchase"))).size == 1)
  }

  test("incremental step over arbitrary batch splits equals one-shot fold") {
    val p = CepPatterns.failFailSuccess(3600)
    val events = Seq(
      ev(1, 1, "error"), ev(2, 2, "error"), ev(3, 3, "error"), ev(4, 4, "view"),
      ev(5, 5, "error"), ev(6, 6, "error"), ev(7, 7, "purchase"), ev(8, 8, "error"))
    val oneShot = p.foldSorted(events)
    for (cut1 <- 0 to events.size; cut2 <- cut1 to events.size) {
      val (a, rest) = events.splitAt(cut1)
      val (b, c) = rest.splitAt(cut2 - cut1)
      val (s1, m1) = p.step(Vector.empty, a)
      val (s2, m2) = p.step(s1, b)
      val (_, m3) = p.step(s2, c)
      assert(m1 ++ m2 ++ m3 == oneShot, s"split at ($cut1, $cut2)")
    }
  }

  test("prunedBelow evicts only partials the watermark makes uncompletable") {
    val p = CepPatterns.failFailSuccess(100)
    // two live partials: (10, waiting on ok) and (50, waiting on f2)
    val (partials, _) = p.step(Vector.empty, Seq(ev(10, 1, "error"), ev(50, 2, "error")))
    assert(partials.map(p => (p.startTs, p.idx)) == Vector((10L, 2), (50L, 1)))
    // watermark 140: any partial opened before 40 can never satisfy
    // within=100 against a future event — evicted; the rest survive
    assert(p.prunedBelow(partials, watermarkSec = 140).map(_.startTs) == Vector(50L))
  }

  test("streaming fail-fail-success twin equals the registered batch query") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.cepFailFailSuccessStream(spark, sf).toDF(), "cep_ffs", "append")
    val batch = SparkEntry.queries("cep_fail_fail_success")(spark, sf)
    assert(batch.count() > 0, "fixture must produce matches at this scale")
    assert(sortedRows(stream) == sortedRows(batch))
  }
}
