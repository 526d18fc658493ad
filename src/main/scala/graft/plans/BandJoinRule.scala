package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite pure band joins — inner joins whose ONLY
  * cross-side predicate is `abs(x - y) <= band` — into the bucketed
  * equi-join form of [[graft.operators.Joins.bandJoin]].
  *
  * Catalyst plans a range-only join condition as a nested-loop cross
  * product (every left row against every right row), which is the one
  * plan shape that cannot survive 100 TB. The rewrite buckets both
  * sides by `floor(val / band)` and equi-joins each left bucket
  * against its up-to-5 candidate right buckets (±1 always; ±2 only
  * within a few ulp of a bucket edge, where the two floating-point
  * divisions can round in opposite directions — same epsilon analysis
  * as Joins.bandJoin). The original predicate is kept as the join
  * post-filter, so the result set is row-for-row identical; only the
  * physical strategy changes (shuffle hash/sort-merge on the bucket
  * key instead of BroadcastNestedLoopJoin).
  *
  * Scope guards, by design conservative:
  *  - inner joins only, and only when NO cross-side equality conjunct
  *    exists (with one, the join is already a hash join and the band
  *    predicate rides along as a cheap post-filter);
  *  - both band operands must be deterministic DOUBLE expressions,
  *    each referencing exactly one side;
  *  - the band must be a positive literal (post-constant-folding);
  *  - plans already rewritten are skipped (bucket column marker).
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` in
  * [[GraftExtensions]]: `SELECT ... FROM a JOIN b ON abs(a.v - b.v)
  * <= 0.05` scales without the caller knowing about bucketing.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private val BucketCol = "__graft_band_bucket"

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if !l.output.exists(_.name == BucketCol) &&
          !r.output.exists(_.name == BucketCol) =>
      val conj = splitConj(cond)
      // <=> counts too: Spark plans a cross-side null-safe equality as a
      // hash join already, so stacking the 5x explode there is pure cost
      val hasCrossEquality = conj.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
            (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
        case EqualNullSafe(a, b) =>
          (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
            (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
        case _ => false
      }
      val bandPred =
        if (hasCrossEquality) None
        else conj.collectFirst {
          case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(b: Double, DoubleType))
              if b > 0 && x.deterministic && y.deterministic &&
                x.dataType == DoubleType && y.dataType == DoubleType &&
                x.references.nonEmpty && y.references.nonEmpty &&
                ((x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet)) ||
                  (x.references.subsetOf(r.outputSet) && y.references.subsetOf(l.outputSet))) =>
            if (x.references.subsetOf(l.outputSet)) (x, y, b) else (y, x, b)
        }
      bandPred match {
        case None => j
        case Some((lv, rv, band)) =>
          val lb = Alias(Floor(Divide(lv, Literal(band))), BucketCol)()
          val l2 = Project(l.output :+ lb, l)
          val rq = Divide(rv, Literal(band))
          val rb = Floor(rq)
          val eps = Greatest(Seq(Literal(1e-9), Multiply(Abs(rq), Literal(1e-12))))
          val frac = Subtract(rq, Cast(rb, DoubleType))
          def off(d: Long): Expression =
            if (d >= 0) Add(rb, Literal(d)) else Subtract(rb, Literal(-d))
          // duplicate probes collapse via array_distinct (the
          // conditional ±2 probes yield rb when inactive)
          val probes = ArrayDistinct(CreateArray(Seq(
            off(-1), rb, off(1),
            If(GreaterThanOrEqual(frac, Subtract(Literal(1.0), eps)), off(2), rb),
            If(LessThanOrEqual(frac, eps), off(-2), rb))))
          val probeAttr = AttributeReference(BucketCol, LongType)()
          val r2 = Generate(Explode(probes), Nil, outer = false, None, Seq(probeAttr), r)
          val newCond = And(EqualTo(lb.toAttribute, probeAttr), cond)
          Project(j.output, Join(l2, r2, Inner, Some(newCond), hint))
      }
  }
}
