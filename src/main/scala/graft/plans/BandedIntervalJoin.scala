package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: plan interval-containment theta joins as banded
  * equi-joins — the SQL-surface twin of `operators/RangeJoin` (which covers
  * the DataFrame API). Stock Spark plans
  *
  *   SELECT ... FROM points p JOIN ranges r ON p.v BETWEEN r.lo AND r.hi
  *
  * as BroadcastNestedLoopJoin: O(|P|·|R|) compares and a full broadcast of
  * one side — the first thing that dies on a fact×fact range join at
  * 100 TB, and the reference's only answer to this shape was the same
  * nested loop (`NestedLoopJoinDirectExec`, reference
  * `DirectPlanConverter.scala:150-178`). This rule detects the containment
  * pair inside an inner join's condition (lo <= p AND p <= hi, any conjunct
  * order, either join side holding the point) and rewrites to the banded
  * form: the point side gains band(p) = floorDiv(p, W); the ranges side
  * explodes to every band its interval overlaps; the join becomes an
  * ordinary shuffle equi-join on the band id with the ORIGINAL condition
  * kept as a residual — so the rewrite is exact for any band width W
  * (bands only route rows; the residual decides), and W
  * (`graft.rangeJoin.bandWidth`, default 1024) trades replication
  * (range/W + 1 rows per range) against per-band selectivity.
  *
  * Fires only when it is the difference between an equi-join and a nested
  * loop: inner joins, no existing equi conjunct (those already hash-join;
  * this also makes the rule idempotent — its own output carries a band
  * equality), no user join hint, integral point/bound types, deterministic
  * expressions. Null semantics are preserved by construction: a null
  * point/bound nulls the band equality or empties the exploded sequence,
  * excluding the row exactly as the original predicate's null did.
  * Correctness is RangeJoinRuleSpec (rewrite ≡ rule-off results, plan
  * BNLJ-free) plus the q102 contract query's DuckDB oracle.
  */
object BandedIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Explicit width wins; otherwise the candidate's own derived width
    * (the ε-band form knows its interval length at plan time); otherwise
    * 1024. Width is performance-only — the rewrite is exact regardless —
    * but a width far above the key domain collapses everything into a few
    * bands and the residual degenerates toward the nested loop (observed:
    * day-granularity keys under the 1024 default), so derive when we can
    * and let the user pin `graft.rangeJoin.bandWidth` when we cannot. */
  private def bandWidth(derived: Option[Long]): Long = {
    val conf = SQLConf.get.getConfString("graft.rangeJoin.bandWidth", "")
    if (conf.nonEmpty) conf.toLong
    else derived.filter(_ >= 1).getOrElse(1024L)
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Exact floor-division band id (negative-safe: the pmod-adjusted
    * numerator is exactly divisible, so integral divide == floor). */
  private def bandOf(e: Expression, w: Long): Expression = {
    val k = Cast(e, LongType)
    IntegralDivide(Subtract(k, Pmod(k, Literal(w))), Literal(w))
  }

  /** Normalize a conjunct into (point, bound, pointIsLhsOfGeq). */
  private def asGeq(c: Expression): Seq[(Expression, Expression)] = c match {
    case GreaterThanOrEqual(p, lo) => Seq((p, lo))
    case LessThanOrEqual(lo, p) => Seq((p, lo))
    case _ => Nil
  }
  private def asLeq(c: Expression): Seq[(Expression, Expression)] = c match {
    case LessThanOrEqual(p, hi) => Seq((p, hi))
    case GreaterThanOrEqual(hi, p) => Seq((p, hi))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if hint == JoinHint.NONE && !j.isStreaming =>
      val conj = splitConjunctivePredicates(cond)
      val hasEqui = conj.exists {
        case Equality(a, b) =>
          (canEvaluate(a, l) && canEvaluate(b, r)) ||
            (canEvaluate(a, r) && canEvaluate(b, l))
        case _ => false
      }
      if (hasEqui) j
      else {
        // the ε-band spelling |a − b| <= eps is containment in disguise:
        // point = a, bounds = (b − eps, b + eps). eps must be foldable so
        // the bounds stay single-side expressions.
        // derived width = the interval length (2ε + 1), known at plan time
        // here — bands then hold ~one interval's worth of keys each
        def epsWidth(eps: Expression): Option[Long] = eps.eval() match {
          case n: Number => Some(2 * n.longValue + 1)
          case _ => None
        }
        val absBands = conj.flatMap {
          case LessThanOrEqual(Abs(Subtract(a, b, _), _), eps) if eps.foldable =>
            Seq((a, Subtract(b, eps), Add(b, eps), epsWidth(eps)),
              (b, Subtract(a, eps), Add(a, eps), epsWidth(eps)))
          case GreaterThanOrEqual(eps, Abs(Subtract(a, b, _), _)) if eps.foldable =>
            Seq((a, Subtract(b, eps), Add(b, eps), epsWidth(eps)),
              (b, Subtract(a, eps), Add(a, eps), epsWidth(eps)))
          case _ => Nil
        }
        // (point, lo, hi, pointSideIsLeft): the first containment pair whose
        // point sits wholly on one side and both bounds on the other
        val geqs = conj.flatMap(asGeq)
        val leqs = conj.flatMap(asLeq)
        val contained = for {
          (p1, lo) <- geqs
          (p2, hi) <- leqs
          if p1.semanticEquals(p2)
        } yield (p1, lo, hi, None: Option[Long])
        val found = ((contained ++ absBands).iterator.flatMap {
          case (p, lo, hi, derivedW) =>
            if (!Seq(p, lo, hi).forall(e => e.deterministic && isIntegral(e))) None
            else if (canEvaluate(p, l) && canEvaluate(lo, r) && canEvaluate(hi, r))
              Some((p, lo, hi, derivedW, true))
            else if (canEvaluate(p, r) && canEvaluate(lo, l) && canEvaluate(hi, l))
              Some((p, lo, hi, derivedW, false))
            else None
        }).nextOption()
        found match {
          case None => j
          case Some((p, lo, hi, derivedW, pointOnLeft)) =>
            val w = bandWidth(derivedW)
            val (pPlan, bPlan) = if (pointOnLeft) (l, r) else (r, l)
            val pband = Alias(bandOf(p, w), "__graft_pband")()
            val pointSide = Project(pPlan.output :+ pband, pPlan)
            // hi < lo ranges match nothing and would walk sequence()
            // backwards — drop them up front (exact: the residual would
            // reject every row anyway)
            val liveRanges = Filter(GreaterThanOrEqual(hi, lo), bPlan)
            // explicit timeZoneId: ResolveTimeZone ran back in the
            // analyzer, so a tz-aware expression built HERE must arrive
            // pre-resolved or the plan validator rejects the batch
            val seq = Sequence(bandOf(lo, w), bandOf(hi, w), None,
              Some(SQLConf.get.sessionLocalTimeZone))
            val rband = AttributeReference("__graft_rband", LongType,
              nullable = false)()
            val rangeSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(rband),
              child = liveRanges)
            val banded = Join(pointSide, rangeSide, Inner,
              Some(And(EqualTo(pband.toAttribute, rband), cond)), JoinHint.NONE)
            Project(j.output, banded)
        }
      }
  }
}
