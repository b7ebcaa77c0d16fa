package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, Cast, Divide, EqualTo, Explode,
  Expression, Floor, GreaterThan, GreaterThanOrEqual, If, LessThan,
  LessThanOrEqual, Literal, PredicateHelper, Sequence
}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Bucketized range-join rewrite.
  *
  * An inner join whose only cross-side predicate is a range
  * (`p.x >= i.lo AND p.x <= i.hi`) has no equi key, so Spark plans a
  * BroadcastNestedLoopJoin — O(|P|·|I|) compares, and a hard broadcast
  * requirement on one side. At 100 TB that plan is not slow, it is
  * impossible. The classic fix (publicly documented as the bin-size
  * range-join optimization in several engines, and what DuckDB's IEJoin
  * replaces) is to quantize the domain into fixed-width bins:
  *
  *   - point side:    bin = floor(x / W)           (one bin per row)
  *   - interval side: explode bins floor(lo/W)..floor(hi/W)
  *   - equi-join on bin, re-apply the exact range as a residual filter
  *
  * A point lands in exactly one bin, so no pair is produced twice and no
  * dedup pass is needed. Cost: |I| inflates by ~len/W rows, the join
  * becomes a hash/sort-merge equi-join that shuffles by bin — skew-safe,
  * AQE-splittable, no broadcast requirement. Double-cast bucketing is
  * monotone (IEEE rounding preserves order), so a point's bin always
  * falls inside its matching interval's bin span even at the edges of
  * double precision.
  *
  * The rule is opt-in: it fires only when `spark.graft.rangeJoin.binSize`
  * is set to a positive width (same contract as bin-size hints elsewhere
  * — the user knows the typical interval length; pick W of that order).
  * Joins that already have an equi conjunct are left alone: they hash on
  * that key and the range is a cheap post-filter. The rewrite keeps the
  * original condition as the residual, so strict/non-strict bounds and
  * null semantics are untouched. Idempotent by construction — the
  * rewritten join gains an equi conjunct, which disqualifies it from
  * matching again inside the optimizer's fixed-point batch.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  /** One reading of a comparison conjunct: `point` is bounded by `bound`
    * from below (`lower=true`) or above. */
  private case class Bound(
      point: Expression, bound: Expression, pointLeft: Boolean, lower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w =
      try conf.getConfString(BinSizeKey, "0").toDouble
      catch { case _: NumberFormatException => 0.0 }
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, w).getOrElse(j)
    }
  }

  private def sideOf(e: Expression, j: Join): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None

  /** Both readings of `a (>|>=|<|<=) b` as point-vs-bound, keeping only
    * those where point and bound sit on opposite sides. */
  private def bounds(c: Expression, j: Join): Seq[Bound] = {
    def mk(point: Expression, bound: Expression, lower: Boolean): Seq[Bound] =
      (sideOf(point, j), sideOf(bound, j)) match {
        // deterministic only: the rewrite evaluates the point expression
        // twice (bin key + residual) and the bounds three times — a
        // rand()-bearing predicate would change value between them
        case (Some(pl), Some(bl)) if pl != bl &&
            point.deterministic && bound.deterministic &&
            point.dataType.isInstanceOf[NumericType] &&
            bound.dataType.isInstanceOf[NumericType] =>
          Bound(point, bound, pl, lower) :: Nil
        case _ => Nil
      }
    c match {
      case GreaterThanOrEqual(a, b) => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case GreaterThan(a, b)        => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case LessThanOrEqual(a, b)    => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case LessThan(a, b)           => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case _                        => Nil
    }
  }

  private def rewrite(j: Join, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    // an existing cross-side equi conjunct means the join already hashes
    // on a real key; the range predicate is a cheap residual there
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a, j), sideOf(b, j)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    val cands = conjuncts.flatMap(bounds(_, j))
    val pair = (for {
      lo <- cands if lo.lower
      hi <- cands if !hi.lower &&
        hi.pointLeft == lo.pointLeft && hi.point.semanticEquals(lo.point)
    } yield (lo, hi)).headOption
    pair.map { case (lo, hi) =>
      val wLit = Literal(w, DoubleType)
      def bin(e: Expression): Expression = Floor(Divide(Cast(e, DoubleType), wLit))

      val (pPlan, iPlan) =
        if (lo.pointLeft) (j.left, j.right) else (j.right, j.left)
      val pBin = Alias(bin(lo.point), "__graft_bin")()
      val pProj = Project(pPlan.output :+ pBin, pPlan)
      val iBin = AttributeReference("__graft_bin", LongType)()
      // Sequence is TimeZoneAwareExpression: the analyzer's ResolveTimeZone
      // has already run, so the rule must fill timeZoneId itself or the
      // node stays unresolved and plan validation rejects the rewrite.
      // The If-guard covers degenerate intervals (lo > hi): sequence
      // THROWS on reversed bounds, while join semantics are "no match" —
      // exploding the null branch contributes zero rows instead.
      val seq = Sequence(
        bin(lo.bound), bin(hi.bound), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      val guarded = If(
        LessThanOrEqual(lo.bound, hi.bound), seq,
        Literal.create(null, seq.dataType))
      val gen = Generate(
        Explode(guarded),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBin), child = iPlan)
      val newCond = And(EqualTo(pBin.toAttribute, iBin), j.condition.get)
      val newJoin =
        if (lo.pointLeft) Join(pProj, gen, Inner, Some(newCond), j.hint)
        else Join(gen, pProj, Inner, Some(newCond), j.hint)
      Project(j.output, newJoin)
    }
  }
}
