package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a pure time-proximity band join into the binned
  * equi-join q99 builds by hand (SCALE.md "Binned interval join").
  *
  * The shape it targets: an INNER join whose entire condition is a band
  * over one integral column pair from opposite sides,
  *
  * {{{   a >= b - H  AND  a <= b + H          (|a − b| ≤ H)   }}}
  *
  * with no equi conjunct. Catalyst has no equi key to hash on, so the
  * planner falls back to BroadcastNestedLoopJoin / CartesianProduct —
  * O(|L|·|R|) comparisons, the plan that cannot run at 100 TB. The
  * rewrite buckets both sides by `H`-wide bins, explodes the left side to
  * probe `[bin−1, bin, bin+1]`, joins on bin equality, and keeps the
  * original band predicate inside the join:
  *
  * {{{
  *   Join(L, R, Inner, |a−b| ≤ H)
  *   ⇒ Project(L.out ++ R.out,
  *       Join(Project(L.out :+ binL = lT DIV H + probe,
  *              Generate(Explode([-1,0,1]), L)),
  *            Project(R.out :+ binR = rT DIV H, R),
  *            Inner, binL = binR AND |a−b| ≤ H))
  * }}}
  *
  * Semantics are exactly preserved for INNER joins: any pair with
  * |a − b| ≤ H has |trunc(a/H) − trunc(b/H)| ≤ 1, so it meets in exactly
  * ONE bin (the right row's own), and pairs outside the band are removed
  * by the retained predicate — the output multiset is identical.
  *
  * LEFT OUTER band joins rewrite too, with the probe explode flipped to
  * the NON-preserved side (exploding the left would triplicate unmatched
  * preserved rows): the right side probes `[bin−1, bin, bin+1]`, the left
  * keeps one bin per row, and a matching pair still meets exactly once
  * (unique probe). The outer result is then
  *
  * {{{   inner-bin-join(L, R³)  ∪  anti-bin-join(L, R³) ⋈ nulls(R)   }}}
  *
  * — the anti join preserves a left row iff NO (right row, probe) matched,
  * which is exactly the null-extension set, and both branches are hash
  * joins on the bin key. Full outer / right joins stay unmatched (the
  * right side is the exploded one; a symmetric flip would be needed).
  *
  * The rewrite is idempotent by construction: the new condition carries a
  * bin-equality conjunct, and joins with any equi conjunct are skipped
  * (they already hash-partition fine).
  *
  * Registered via `GraftExtensions` (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`. Reference context: the
  * reference's 90-day lookback pairing (s3_rankings_collector.py:36)
  * delegates proximity matching to warehouse SQL; this rule keeps the
  * same declarative form scalable on Spark.
  */
case class BandJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Probe = "__graft_band_probe"
  private val BinL = "__graft_band_bin_l"
  private val BinR = "__graft_band_bin_r"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !hasEquiConjunct(cond, left, right) =>
      extractBand(cond, left, right) match {
        case Some((lTime, rTime, h)) if h > 0 =>
          val probe =
            AttributeReference(Probe, LongType, nullable = false)()
          val gen = Generate(
            Explode(CreateArray(Seq(-1L, 0L, 1L).map(Literal(_)))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(probe), child = left)
          val binL = Alias(
            Add(IntegralDivide(asLong(lTime), Literal(h)), probe), BinL)()
          val binR = Alias(
            IntegralDivide(asLong(rTime), Literal(h)), BinR)()
          val projL = Project(left.output :+ binL, gen)
          val projR = Project(right.output :+ binR, right)
          val banded = Join(projL, projR, Inner,
            Some(And(EqualTo(binL.toAttribute, binR.toAttribute), cond)),
            hint)
          Project(left.output ++ right.output, banded)
        case _ => j
      }

    case j @ Join(left, right, LeftOuter, Some(cond), hint)
        if j.resolved && !hasEquiConjunct(cond, left, right) =>
      extractBand(cond, left, right) match {
        case Some((lTime, rTime, h)) if h > 0 =>
          val inner = bandedRightProbe(left, right, cond, hint,
            lTime, rTime, h, Inner)
          val anti = bandedRightProbe(left, right, cond, hint,
            lTime, rTime, h, LeftAnti)
          val nullsR = right.output.map(a =>
            Alias(Literal.create(null, a.dataType), a.name)())
          Union(Seq(
            Project(left.output ++ right.output, inner),
            Project(left.output ++ nullsR, anti)))
        case _ => j
      }
  }

  /** The bin join with the probe explode on the RIGHT side (each matching
    * pair meets in exactly one probe; the left multiset is never altered,
    * so LeftAnti over it is exact null-extension membership).
    */
  private def bandedRightProbe(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, lTime: Attribute, rTime: Attribute,
      h: Long, joinType: org.apache.spark.sql.catalyst.plans.JoinType): Join = {
    val probe = AttributeReference(Probe, LongType, nullable = false)()
    val gen = Generate(
      Explode(CreateArray(Seq(-1L, 0L, 1L).map(Literal(_)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(probe), child = right)
    val binL = Alias(IntegralDivide(asLong(lTime), Literal(h)), BinL)()
    val binR = Alias(
      Add(IntegralDivide(asLong(rTime), Literal(h)), probe), BinR)()
    Join(Project(left.output :+ binL, left),
      Project(right.output :+ binR, gen), joinType,
      Some(And(EqualTo(binL.toAttribute, binR.toAttribute), cond)), hint)
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Any `l = r` conjunct across sides means the join already has a hash
    * key — leave it to the planner (also the idempotence marker). */
  private def hasEquiConjunct(
      cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a: Attribute, b: Attribute) => acrossSides(a, b, left, right)
      case EqualNullSafe(a: Attribute, b: Attribute) =>
        acrossSides(a, b, left, right)
      case _ => false
    }

  private def acrossSides(
      a: Attribute, b: Attribute,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
      (left.outputSet.contains(b) && right.outputSet.contains(a))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Match the whole condition as `a >= b − h AND a <= b + h` (in any
    * conjunct order / comparison orientation) with `a`, `b` integral
    * attributes from opposite sides and one shared literal `h`. Returns
    * (leftSideTime, rightSideTime, h). */
  private def extractBand(
      cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Attribute, Attribute, Long)] = {
    val cs = conjuncts(cond)
    if (cs.length != 2) return None
    (bound(cs(0)), bound(cs(1))) match {
      case (Some((a1, b1, h1, lo1)), Some((a2, b2, h2, lo2)))
          if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
            h1 == h2 && lo1 != lo2 &&
            Seq(a1, b1).forall(x =>
              x.dataType == LongType || x.dataType == IntegerType) =>
        // sides must be opposite; orient the result as (left, right)
        if (left.outputSet.contains(a1) && right.outputSet.contains(b1))
          Some((a1, b1, h1))
        else if (left.outputSet.contains(b1) && right.outputSet.contains(a1))
          Some((b1, a1, h1))
        else None
      case _ => None
    }
  }

  /** One band bound: lower `a >= b − h` or upper `a <= b + h`, either
    * comparison orientation. Returns (a, b, h, isLower). */
  private def bound(
      e: Expression): Option[(Attribute, Attribute, Long, Boolean)] =
    e match {
      case GreaterThanOrEqual(a: Attribute, Subtract(b: Attribute, l, _)) =>
        intLit(l).map(h => (a, b, h, true))
      case LessThanOrEqual(Subtract(b: Attribute, l, _), a: Attribute) =>
        intLit(l).map(h => (a, b, h, true))
      case LessThanOrEqual(a: Attribute, Add(b: Attribute, l, _)) =>
        intLit(l).map(h => (a, b, h, false))
      case GreaterThanOrEqual(Add(b: Attribute, l, _), a: Attribute) =>
        intLit(l).map(h => (a, b, h, false))
      case _ => None
    }

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType)   => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _                            => None
  }
}
