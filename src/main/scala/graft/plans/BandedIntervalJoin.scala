package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Max}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Physical reinterpret of a timestamp (with or without time zone) as its
  * underlying epoch-microseconds Long — `unix_micros` generalized to
  * TimestampNTZ, which stock `UnixMicros` rejects. Both timestamp types
  * store Long µs, so this is an identity pass-through: no time-zone
  * semantics, strictly monotonic by construction, which is all band routing
  * needs (the residual predicate compares the ORIGINAL typed values). */
private[graft] case class TimestampMicros(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): TimestampMicros =
    copy(child = newChild)
}

/** The inverse reinterpret: an epoch-µs Long back to TIMESTAMP or
  * TIMESTAMP_NTZ. `timestamp_micros()` covers only TimestampType, and a
  * TIMESTAMP → NTZ cast shifts by the session zone — this pass-through
  * restores the exact physical value [[TimestampMicros]] read, so
  * toLong/fromLong round-trips bit-exactly for both timestamp types
  * (operators/TimeKeys uses the pair for native-key interval operators). */
private[graft] case class MicrosAsTimestamp(child: Expression,
    dataType: DataType) extends UnaryExpression {
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): MicrosAsTimestamp =
    copy(child = newChild)
}

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
  * pair inside the join condition (lo <= p AND p <= hi, any conjunct order,
  * either join side holding the point) and rewrites to the banded form: the
  * point side gains band(p) = floorDiv(p, W); the ranges side explodes to
  * every band its interval overlaps; the join becomes an ordinary shuffle
  * equi-join on the band id with the ORIGINAL condition kept as a residual
  * — so the rewrite is exact for any band width W (bands only route rows;
  * the residual decides).
  *
  * Keys: integral types band natively; DATE keys band on days
  * (`UnixDate`); TIMESTAMP / TIMESTAMP_NTZ keys band on epoch µs
  * ([[TimestampMicros]]) — so the natural spellings `l_shipdate BETWEEN
  * o_orderdate AND o_orderdate + INTERVAL '13' DAY` and `a.ts BETWEEN b.ts
  * AND b.ts + INTERVAL '2' HOUR` fire without any manual epoch conversion.
  * All three key expressions must sit on one scale family (they do by
  * construction post-analysis: comparison coercion unifies them).
  *
  * Width: an explicit `graft.rangeJoin.bandWidth` wins; otherwise the rule
  * DERIVES the width at plan time whenever the interval length is foldable
  * — the ε-band form (2ε+1) and the ubiquitous `hi = lo + k` BETWEEN form
  * (`lo + 13`, `date_add(lo, 13)`, `lo + INTERVAL '13' DAY`, timestamp +
  * day-time interval), where width = k+1 puts ~one interval per band;
  * otherwise 1024. Width is performance-only — a band far wider than the
  * key domain degenerates toward the nested loop's compare count (observed:
  * day-granularity keys under a 1024 default, 11.5 s vs 0.96 s) but never
  * changes the result.
  *
  * Join types: Inner (point on either side), LEFT OUTER / LEFT SEMI / LEFT
  * ANTI / existence joins with the point on the LEFT, and RIGHT OUTER with
  * the point on the RIGHT — in every supported shape only the RANGES side
  * explodes, and replicated range rows are harmless: inner/outer emit one
  * row per qualifying (point, range) pair because a containing range shares
  * the point's band exactly once, and semi/anti/existence are blind to
  * right-side multiplicity. The preserved/probed side is never replicated,
  * so outer null-extension, semi/anti row multiplicity, and the existence
  * bit are byte-identical to the nested loop's. (FULL OUTER would preserve
  * the exploded side's unmatched copies — not rewritten.)
  *
  * Interval-OVERLAP joins (a.lo <= b.hi AND b.lo <= a.hi — both sides
  * carry an interval; the temporal-join shape: overlapping sessions,
  * concurrent bookings) rewrite as a fallback when no containment pair
  * matched. Inner: BOTH sides explode to their covered bands and a
  * pair is emitted only at its canonical band — band(max(a.lo, b.lo)),
  * the overlap region's low end, which both replicas provably cover
  * exactly once — so multiplicity matches the nested loop for any width.
  * LEFT SEMI / LEFT ANTI / existence joins (the EXISTS / NOT EXISTS
  * decontamination spellings, incl. EXISTS under OR or in a projection):
  * the preserved side's multiplicity lifts to distinct tuples
  * (group-with-count → band-exploded ExistenceJoin → any-replica-matched
  * aggregate → filter or exists-bit → re-expand by count), so no
  * preserved replica ever survives visibly; exact because any overlapping
  * pair shares its canonical band and semi/anti/existence are blind to
  * match multiplicity.
  *
  * Fires only when it is the difference between an equi-join and a nested
  * loop: no existing equi conjunct (those already hash-join; this also
  * makes the rule idempotent — its own output carries a band equality), no
  * user join hint, deterministic key expressions. Null semantics are
  * preserved by construction: a null point/bound nulls the band equality or
  * empties the exploded sequence, excluding (or null-extending) the row
  * exactly as the original predicate's null did. Correctness is
  * RangeJoinRuleSpec (rewrite ≡ rule-off results per join type / key type /
  * width, plan BNLJ-free) plus the q102/q103 contract queries' DuckDB
  * oracles.
  *
  * Documented ε-form corner: `|a − b| <= ε` is read as REAL arithmetic.
  * A pair sitting within ε of OPPOSITE type extremes — which stock
  * non-ANSI Spark "matches" only because the narrow subtract wraps
  * (Int.MaxValue − Int.MinValue ≡ −1), and on which ANSI Spark throws —
  * is not routed to a shared band. The synthesized bounds themselves are
  * wrap-free (built in Long with plan-time If-clamps at the Long domain
  * edges), so every genuinely-within-ε pair routes exactly, including at
  * the extremes the r13 narrow-typed bounds dropped.
  *
  * ANSI note: the rewrite is error-ELIMINATING, never error-introducing —
  * band routing skips residual evaluation for far-apart pairs, so an ANSI
  * overflow the nested loop would have raised on a non-qualifying pair may
  * not fire (the same latitude Spark's own predicate pushdown/reorder
  * rules take); every synthesized expression (bands, clamped bounds) is
  * overflow-free by construction.
  */
object BandedIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** A containment candidate: point ∈ [lo, hi] with an optional plan-time
    * derived band width (in the key family's Long units). */
  private case class Cand(p: Expression, lo: Expression, hi: Expression,
      width: Option[Long])

  /** Explicit conf wins; otherwise the candidate's own plan-time derived
    * width; otherwise a TYPE-AWARE default — 1024 is sane for abstract
    * integers but collapses day-granularity domains into a handful of
    * bands (the measured r13 trap: 11.5 s vs 0.96 s), so date keys
    * default to 32 days and timestamp keys to one day of µs (the scales
    * real promo/session windows live at). */
  private def bandWidth(derived: Option[Long], keyDt: DataType): Long = {
    val conf = SQLConf.get.getConfString("graft.rangeJoin.bandWidth", "")
    if (conf.nonEmpty) conf.toLong
    else derived.filter(_ >= 1).getOrElse(keyDt match {
      case DateType => 32L
      case TimestampType | TimestampNTZType => 86400L * 1000 * 1000
      case _ => 1024L
    })
  }

  /** Band-scale family: all of (point, lo, hi) must map to Long on ONE
    * scale for band routing to cover (0 = native integral, 1 = days,
    * 2 = epoch µs). */
  private def family(dt: DataType): Option[Int] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(0)
    case DateType => Some(1)
    case TimestampType | TimestampNTZType => Some(2)
    case _ => None
  }

  /** Monotonic exact Long image of a supported key expression. */
  private def longUnits(e: Expression): Expression = e.dataType match {
    case DateType => Cast(UnixDate(e), LongType)
    case TimestampType | TimestampNTZType => TimestampMicros(e)
    case _ => Cast(e, LongType)
  }

  /** Exact floor-division band id over the FULL Long domain: truncating
    * IntegralDivide, minus one when a negative dividend had a remainder.
    * No pmod/subtract intermediate, so no wraparound near Long.MinValue. */
  private def bandOf(k: Expression, w: Long): Expression = {
    val div = IntegralDivide(k, Literal(w))
    If(And(LessThan(k, Literal(0L)),
        Not(EqualTo(Remainder(k, Literal(w)), Literal(0L)))),
      Subtract(div, Literal(1L)), div)
  }

  /** Normalize a conjunct into (point, bound) for each comparison side. */
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

  /** The ε-band spelling |a − b| <= eps is containment in disguise: point
    * = a, bounds = (b − ε, b + ε), derived width 2ε+1. Bounds are built in
    * Long with If-clamps at the domain edges (ε is foldable, so the clamp
    * thresholds are plan-time constants) — a narrow-typed or unclamped
    * b ± ε would wrap near the type extremes and misroute rows the
    * original nested loop matched. */
  private def epsCands(a: Expression, b: Expression, eps: Expression): Seq[Cand] = {
    val ev = eps.eval() match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    ev.toSeq.filter(_ >= 0).flatMap { e =>
      def bounds(x: Expression): (Expression, Expression) = {
        val xl = Cast(x, LongType)
        (If(LessThan(xl, Literal(Long.MinValue + e)), Literal(Long.MinValue),
          Subtract(xl, Literal(e))),
          If(GreaterThan(xl, Literal(Long.MaxValue - e)), Literal(Long.MaxValue),
            Add(xl, Literal(e))))
      }
      val w = if (e <= (Long.MaxValue - 1) / 2) Some(2 * e + 1) else None
      val (blo, bhi) = bounds(b)
      val (alo, ahi) = bounds(a)
      Seq(Cand(a, blo, bhi, w), Cand(b, alo, ahi, w))
    }
  }

  /** Plan-time width for the BETWEEN form: when hi ≡ lo + k with foldable
    * k, the interval length is known — return k+1 in the key family's Long
    * units (native / days / µs). Covers the post-analysis shapes of
    * integral `lo + k`, `date_add(lo, k)` and date + ANSI day interval
    * (both resolve to DateAdd with a foldable days argument), date +
    * day-only CalendarInterval, and timestamp/ntz + day-time interval
    * (TimestampAddInterval — its interval literal IS Long µs). */
  private def betweenWidth(lo: Expression, hi: Expression): Option[Long] = {
    def longOf(k: Expression): Option[Long] = k.eval() match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    val split: Option[(Expression, Long)] = hi match {
      case Add(b, k, _) if k.foldable => longOf(k).map((b, _))
      case Add(k, b, _) if k.foldable && !b.foldable => longOf(k).map((b, _))
      case DateAdd(b, k) if k.foldable => longOf(k).map((b, _))
      case DateAddInterval(b, k, _, _) if k.foldable =>
        Option(k.eval()).collect {
          case i: CalendarInterval if i.months == 0 && i.microseconds == 0 =>
            (b, i.days.toLong)
        }
      case TimestampAddInterval(b, k, _) if k.foldable => longOf(k).map((b, _))
      case _ => None
    }
    split.collect {
      case (b, k) if b.semanticEquals(lo) && k >= 0 && k < Long.MaxValue => k + 1
    }
  }

  private def supportedJoinType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
    case _: ExistenceJoin => true
    case _ => false
  }

  /** Interval-OVERLAP pair (a.lo <= b.hi AND b.lo <= a.hi — both sides
    * carry an interval): two <= conjuncts whose operands split so that the
    * first's lhs and the second's rhs sit on the LEFT plan and the rest on
    * the RIGHT. Fallback when no containment pair matched; Inner only —
    * both sides explode, so any preserved/probed side would duplicate.
    * Returns (lLo, lHi, rLo, rHi, derived width = min of the two foldable
    * interval lengths when known). */
  private def overlapCand(conj: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Expression, Expression, Option[Long])] = {
    val leqs = conj.flatMap(asLeq)
    (for {
      (x1, y1) <- leqs.iterator
      (x2, y2) <- leqs.iterator
      if canEvaluate(x1, l) && canEvaluate(y2, l) &&
        canEvaluate(x2, r) && canEvaluate(y1, r)
      es = Seq(x1, y2, x2, y1)
      // references.nonEmpty: a foldable bound canEvaluate on EITHER side —
      // without this, a pure one-sided range filter (5 <= a.y AND a.y <= 7)
      // would masquerade as a constant "interval" and band a cross join
      if es.forall(e => e.references.nonEmpty && e.deterministic)
      fams = es.map(e => family(e.dataType))
      if fams.forall(_.isDefined) && fams.distinct.size == 1
    } yield {
      val dw = Seq(betweenWidth(x1, y2), betweenWidth(x2, y1))
        .flatten.reduceOption((a, b) => math.min(a, b))
      (x1, y2, x2, y1, dw) // (lLo, lHi, rLo, rHi, width)
    }).nextOption()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, jt, Some(cond), hint)
        if supportedJoinType(jt) && hint == JoinHint.NONE && !j.isStreaming =>
      val conj = splitConjunctivePredicates(cond)
      // references.nonEmpty on BOTH sides: a bare-literal equality
      // (`l.flag = 'Y'` under LEFT OUTER, where the conjunct cannot push
      // below the join) canEvaluate anywhere and would masquerade as an
      // equi conjunct, declining the rewrite and leaving a nested loop
      // that Spark cannot hash-join anyway. A one-sided equality is just
      // residual filtering — only a genuinely two-sided key equality
      // means a hash join already exists.
      val hasEqui = conj.exists {
        case Equality(a, b) if a.references.nonEmpty && b.references.nonEmpty =>
          (canEvaluate(a, l) && canEvaluate(b, r)) ||
            (canEvaluate(a, r) && canEvaluate(b, l))
        case _ => false
      }
      if (hasEqui) j
      else {
        val absBands = conj.flatMap {
          case LessThanOrEqual(Abs(Subtract(a, b, _), _), eps) if eps.foldable =>
            epsCands(a, b, eps)
          case GreaterThanOrEqual(eps, Abs(Subtract(a, b, _), _)) if eps.foldable =>
            epsCands(a, b, eps)
          case _ => Nil
        }
        // the first containment pair whose point sits wholly on one side,
        // both bounds on the other — and whose side assignment the join
        // type supports (only the RANGES side may explode)
        val geqs = conj.flatMap(asGeq)
        val leqs = conj.flatMap(asLeq)
        val contained = for {
          (p1, lo) <- geqs
          (p2, hi) <- leqs
          if p1.semanticEquals(p2)
        } yield Cand(p1, lo, hi, betweenWidth(lo, hi))
        val found = ((contained ++ absBands).iterator.flatMap { c =>
          val es = Seq(c.p, c.lo, c.hi)
          val fams = es.map(e => family(e.dataType))
          if (fams.exists(_.isEmpty) || fams.distinct.size != 1 ||
              !es.forall(_.deterministic)) None
          else {
            val pl = canEvaluate(c.p, l) && canEvaluate(c.lo, r) && canEvaluate(c.hi, r)
            val pr = canEvaluate(c.p, r) && canEvaluate(c.lo, l) && canEvaluate(c.hi, l)
            jt match {
              case Inner if pl => Some((c, true))
              case Inner if pr => Some((c, false))
              case (LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin) if pl =>
                Some((c, true))
              case RightOuter if pr => Some((c, false))
              case _ => None
            }
          }
        }).nextOption()
        found match {
          case None =>
            val liftable = jt == LeftSemi || jt == LeftAnti ||
              jt.isInstanceOf[ExistenceJoin]
            if (jt != Inner && !liftable) j
            else overlapCand(conj, l, r) match {
              case None => j
              // the lift groups by the left's WHOLE row — a non-groupable
              // column (map) would turn a working (if quadratic) nested
              // loop into an analysis error, so leave those untouched
              case Some((lLo, lHi, rLo, rHi, derivedW))
                  if jt != Inner &&
                    !l.output.forall(a => RowOrdering.isOrderable(a.dataType)) =>
                j
              case Some((lLo, lHi, rLo, rHi, derivedW)) if jt != Inner =>
                // LEFT SEMI / LEFT ANTI overlap — the EXISTS / NOT EXISTS
                // decontamination spelling ("does my window hit any
                // embargo window?"). The preserved side cannot explode
                // visibly (several band replicas of one row would survive
                // a semi), so multiplicity lifts to distinct tuples: group
                // the left by its whole row with a count, explode the
                // GROUPS to their bands, decide existence per replica
                // (ExistenceJoin — band equality + the original predicate),
                // re-aggregate to "did ANY replica match?", filter, and
                // re-expand by the count. Exact for any width: any
                // overlapping pair shares its canonical band, so routing
                // is complete, and semi/anti are blind to match
                // multiplicity. Cost note: the lift pays one hash
                // aggregate over the left's rows — the price of proving
                // (anti) or testing (semi) overlap without replicating a
                // preserved side.
                val w = bandWidth(derivedW, lLo.dataType)
                val tz = Some(SQLConf.get.sessionLocalTimeZone)
                val cntA = Alias(Count(Literal(1)).toAggregateExpression(),
                  "__graft_cnt")()
                val grouped = Aggregate(l.output, l.output :+ cntA, l)
                // the LEFT explode is outer=true with a NULLABLE band: a
                // null-bounded tuple produces a null band sequence, and an
                // inner Generate would DROP it — wrong for ANTI (a null
                // predicate matches nothing, so the nested loop KEEPS the
                // row) and for the existence bit (the row must surface
                // with exists=false). outer=true keeps it with a null
                // band; the band equality then nulls out, no replica
                // matches, and the tuple flows to the anti/existence
                // output exactly as the nested loop's. (The r13-caught
                // lesson: the suite's own shared session surfaced this —
                // sqlBanded leaves the rule attached by design, so every
                // rewrite shape must be exactness-safe, not just the ones
                // a contract query exercises.)
                val lband = AttributeReference("__graft_lband", LongType,
                  nullable = true)()
                val rband = AttributeReference("__graft_rband", LongType,
                  nullable = false)()
                def bandsOf(lo: Expression, hi: Expression): Expression = {
                  val loL = longUnits(lo)
                  Sequence(bandOf(loL, w),
                    bandOf(Greatest(Seq(loL, longUnits(hi))), w), None, tz)
                }
                val gx = Generate(Explode(bandsOf(lLo, lHi)),
                  unrequiredChildIndex = Nil, outer = true, qualifier = None,
                  generatorOutput = Seq(lband), child = grouped)
                val rx = Generate(Explode(bandsOf(rLo, rHi)),
                  unrequiredChildIndex = Nil, outer = false, qualifier = None,
                  generatorOutput = Seq(rband), child = r)
                val exists = AttributeReference("__graft_exists", BooleanType,
                  nullable = false)()
                val ej = Join(gx, rx, ExistenceJoin(exists),
                  Some(And(EqualTo(lband, rband), cond)), JoinHint.NONE)
                val matchedA = Alias(Max(exists).toAggregateExpression(),
                  "__graft_matched")()
                val cnt2A = Alias(Max(cntA.toAttribute).toAggregateExpression(),
                  "__graft_cnt2")()
                val agg2 = Aggregate(l.output,
                  l.output ++ Seq(cnt2A, matchedA), ej)
                // semi/anti filter the tuples; an existence join keeps
                // them all and exposes the bit under the join's own
                // exists attribute (same exprId, so the parent projection
                // that consumes it resolves unchanged)
                val filtered = jt match {
                  case LeftSemi => Filter(matchedA.toAttribute, agg2)
                  case LeftAnti => Filter(Not(matchedA.toAttribute), agg2)
                  case _ => agg2
                }
                val idx = AttributeReference("__graft_i", LongType,
                  nullable = false)()
                val expand = Generate(
                  Explode(Sequence(Literal(1L), cnt2A.toAttribute, None, tz)),
                  unrequiredChildIndex = Nil, outer = false, qualifier = None,
                  generatorOutput = Seq(idx), child = filtered)
                val out = jt match {
                  case ExistenceJoin(ea) =>
                    l.output :+ Alias(matchedA.toAttribute, ea.name)(
                      exprId = ea.exprId)
                  case _ => j.output
                }
                Project(out, expand)
              case Some((lLo, lHi, rLo, rHi, derivedW)) =>
                val w = bandWidth(derivedW, lLo.dataType)
                val lband = AttributeReference("__graft_lband", LongType,
                  nullable = false)()
                val rband = AttributeReference("__graft_rband", LongType,
                  nullable = false)()
                // NOT filtered on hi >= lo: the overlap predicate can
                // match an INVERTED interval (both inequalities can hold
                // with lo > hi). Algebra then forces the other side's lo
                // at or below this side's lo, so the canonical band is
                // band(lo) — covered by the degenerate sequence that
                // Greatest(lo, hi) produces. Normal rows unaffected.
                def sideOf(plan: LogicalPlan, lo: Expression, hi: Expression,
                    band: Attribute): LogicalPlan = {
                  val loL = longUnits(lo)
                  val seq = Sequence(bandOf(loL, w),
                    bandOf(Greatest(Seq(loL, longUnits(hi))), w), None,
                    Some(SQLConf.get.sessionLocalTimeZone))
                  Generate(Explode(seq), unrequiredChildIndex = Nil,
                    outer = false, qualifier = None,
                    generatorOutput = Seq(band), child = plan)
                }
                // a pair shares every band its overlap region covers —
                // emit it ONLY at the canonical one (the region's low end,
                // band(max(lLo, rLo)), covered by both replicas exactly
                // once) so multiplicity matches the nested loop
                val canon = EqualTo(lband, bandOf(
                  Greatest(Seq(longUnits(lLo), longUnits(rLo))), w))
                val banded = Join(sideOf(l, lLo, lHi, lband),
                  sideOf(r, rLo, rHi, rband), Inner,
                  Some(And(And(EqualTo(lband, rband), canon), cond)),
                  JoinHint.NONE)
                Project(j.output, banded)
            }
          case Some((Cand(p, lo, hi, derivedW), pointOnLeft)) =>
            val w = bandWidth(derivedW, p.dataType)
            val pband = Alias(bandOf(longUnits(p), w), "__graft_pband")()
            val rband = AttributeReference("__graft_rband", LongType,
              nullable = false)()
            def rangeSideOf(bPlan: LogicalPlan): LogicalPlan = {
              // hi < lo (or null-bounded) ranges match nothing and would
              // walk sequence() backwards — drop them up front (exact: the
              // residual would reject every row anyway, and in every
              // supported join type the exploded side is non-preserved)
              val live = Filter(GreaterThanOrEqual(hi, lo), bPlan)
              // explicit timeZoneId: ResolveTimeZone ran back in the
              // analyzer, so a tz-aware expression built HERE must arrive
              // pre-resolved or the plan validator rejects the batch
              val seq = Sequence(bandOf(longUnits(lo), w),
                bandOf(longUnits(hi), w), None,
                Some(SQLConf.get.sessionLocalTimeZone))
              Generate(Explode(seq), unrequiredChildIndex = Nil,
                outer = false, qualifier = None, generatorOutput = Seq(rband),
                child = live)
            }
            val (left2, right2) =
              if (pointOnLeft) (Project(l.output :+ pband, l), rangeSideOf(r))
              else (rangeSideOf(l), Project(r.output :+ pband, r))
            val banded = Join(left2, right2, jt,
              Some(And(EqualTo(pband.toAttribute, rband), cond)), JoinHint.NONE)
            Project(j.output, banded)
        }
      }
  }
}
