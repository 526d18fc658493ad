package graft.streaming

/** Flink-CEP-style pattern combinators — the user surface the reference
  * exposes via `Pattern.begin("x").where(...).next("y").where(...)
  * .within(Time.seconds(n))` (LF/app/LoginFailWithCEP.scala:38-47),
  * compiled to the same per-key event-time fold the hand-rolled FSM
  * cores in [[StateMachines]] run on.
  *
  * A pattern is a sequence of named predicate steps; each step after
  * the first is either STRICT (`next` — must match the immediately
  * following event in the key's event-time order) or RELAXED
  * (`followedBy` — non-matching events are skipped; the FIRST matching
  * event advances, Flink's followedBy — not followedByAny — contract).
  * `within(gap)` bounds last-minus-first event time of a match.
  *
  * Matching is an NFA fold with Flink's noSkip after-match strategy: a
  * new partial match opens at EVERY event satisfying the first step, so
  * overlapping matches (fail1-fail2, fail2-fail3) all emit — exactly
  * the reference CEP job's behavior.
  *
  * The fold is incremental — `step(state, batch)` returns the carried
  * state plus this batch's matches — so ONE core drives both the batch
  * `flatMapGroups` form and the streaming `flatMapGroupsWithState`
  * form, like every other FSM in this package. State is the set of
  * live partial matches; with `within` set, any partial older than
  * `watermark - gap` can never complete and is evicted
  * ([[prunedBelow]]), so per-key streaming state stays bounded. A
  * STRICT step needs no watermark at all: its partials die on the very
  * next event unless they advance.
  */
object CepPattern {

  final case class Step[E](name: String, pred: E => Boolean, strict: Boolean)

  /** A completed match: step name → (eventTimeSec, event), in step order. */
  final case class Match[E](bound: Vector[(String, Long, E)]) {
    def apply(name: String): E = bound.find(_._1 == name).get._3
    def tsOf(name: String): Long = bound.find(_._1 == name).get._2
    def firstTs: Long = bound.head._2
    def lastTs: Long = bound.last._2
  }

  /** A live partial match: opened at `startTs`, waiting on step `idx`. */
  final case class Partial[E](startTs: Long, idx: Int, bound: Vector[(String, Long, E)])

  def begin[E](name: String)(pred: E => Boolean): CepPattern[E] =
    new CepPattern(Vector(Step(name, pred, strict = true)), None)
}

final class CepPattern[E] private[streaming] (
    val steps: Vector[CepPattern.Step[E]],
    val withinSec: Option[Long]) extends Serializable {
  import CepPattern._

  /** Strictly-consecutive next step (Flink `next`). */
  def next(name: String)(pred: E => Boolean): CepPattern[E] =
    new CepPattern(steps :+ Step(name, pred, strict = true), withinSec)

  /** Relaxed next step (Flink `followedBy`): skip non-matching events,
    * first match advances.
    */
  def followedBy(name: String)(pred: E => Boolean): CepPattern[E] =
    new CepPattern(steps :+ Step(name, pred, strict = false), withinSec)

  /** Max event-time span (last - first, seconds, inclusive) of a match. */
  def within(gapSec: Long): CepPattern[E] =
    new CepPattern(steps, Some(gapSec))

  /** One incremental fold step over an event-time-sorted slice: carried
    * partials + this slice's events → surviving partials + matches.
    */
  def step(partials: Vector[Partial[E]], sorted: Seq[(Long, E)])
      : (Vector[Partial[E]], Vector[Match[E]]) = {
    var live = partials
    val out = Vector.newBuilder[Match[E]]
    for ((ts, e) <- sorted) {
      val next = Vector.newBuilder[Partial[E]]
      for (p <- live) {
        val st = steps(p.idx)
        val withinOk = withinSec.forall(g => ts - p.startTs <= g)
        if (withinOk && st.pred(e)) {
          val b2 = p.bound :+ ((st.name, ts, e))
          if (p.idx + 1 == steps.length) out += Match(b2)
          else next += Partial(p.startTs, p.idx + 1, b2)
        } else if (withinOk && !st.strict) {
          next += p // relaxed step: skip this event, keep waiting
        }
        // strict miss or past the within bound: the partial dies
      }
      // noSkip: a new partial opens at every event matching step 0
      if (steps.head.pred(e)) {
        val b0 = Vector((steps.head.name, ts, e))
        if (steps.length == 1) out += Match(b0)
        else next += Partial(ts, 1, b0)
      }
      live = next.result()
    }
    (live, out.result())
  }

  /** Batch form: fold a whole key's sorted history from empty state. */
  def foldSorted(sorted: Seq[(Long, E)]): Vector[Match[E]] =
    step(Vector.empty, sorted)._2

  /** Streaming eviction: partials opened before `watermarkSec - gap`
    * can never satisfy `within` against any future event (ts >=
    * watermark), so drop them. Only meaningful when `within` is set —
    * a relaxed pattern without it would hold state forever, which is
    * why the streaming runner requires `withinSec` to be defined.
    */
  def prunedBelow(partials: Vector[Partial[E]], watermarkSec: Long): Vector[Partial[E]] =
    withinSec match {
      case Some(g) => partials.filter(_.startTs >= watermarkSec - g)
      case None => partials
    }
}

/** The concrete patterns the engine ships, shared by the batch queries
  * (StatefulQueries) and their streaming twins (StreamingJobs) so both
  * forms compile the SAME combinator chain.
  */
object CepPatterns {
  /** Event shape the event-log patterns match over. */
  final case class CepEv(sec: Long, id: Long, etype: String)

  /** C1 as the reference writes it with Flink CEP
    * (LF/app/LoginFailWithCEP.scala:38-47): two strictly-consecutive
    * fails within the gap. Runs over the error-filtered stream, so the
    * step predicates are trivially true — the structure (next + within)
    * carries the semantics.
    */
  def loginFail(gapSec: Long): CepPattern[Unit] =
    CepPattern.begin[Unit]("first")(_ => true)
      .next("second")(_ => true)
      .within(gapSec)

  /** A pattern the reference does NOT ship — two consecutive failures
    * resolved by a success within the gap — the "user brings a new
    * pattern" path: pure combinators, no new FSM.
    */
  def failFailSuccess(gapSec: Long): CepPattern[CepEv] =
    CepPattern.begin[CepEv]("f1")(_.etype == "error")
      .next("f2")(_.etype == "error")
      .next("ok")(_.etype != "error")
      .within(gapSec)
}
