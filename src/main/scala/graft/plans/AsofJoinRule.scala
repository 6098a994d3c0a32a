package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{First, Last}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: plan the SQL spelling of an AS-OF join as
  * [[graft.operators.AsofJoin]]'s one-shuffle union-stream window — the
  * SQL-surface twin of that DataFrame operator, closing the last layer
  * asymmetry in the temporal family (VERDICT r15 item 1).
  *
  * Spark has no ASOF syntax (DuckDB's `ASOF JOIN`, pandas `merge_asof`), so
  * a SQL user writes the row_number-over-theta-join idiom:
  *
  *   SELECT ... FROM (
  *     SELECT p.*, q.*, row_number() OVER (
  *       PARTITION BY p.<every probe column> ORDER BY q.t DESC) AS rn
  *     FROM p LEFT JOIN q ON p.k = q.k AND q.t <= p.t) WHERE rn = 1
  *
  * Stock Spark runs the inner join as a hash join on k whose output is the
  * full PAIR EXPLOSION — every probe row times every at-or-before quote of
  * its key, O(|P|·|Q|) per key worst case — then ranks and discards all but
  * one pair per probe. (The reference could only nested-loop the theta
  * shape outright — reference `DirectPlanConverter.scala:150-178`.) This
  * rule detects the idiom and replaces join + window + filter with the
  * union-stream form: both inputs union into one stream partitioned by key
  * and sorted by time, a running last/first carries the nearest quote to
  * each probe — ONE shuffle on the key, per-partition external sort,
  * O(n log n) at any scale, no pair ever materialized. Matched pieces:
  *
  *  - join: Inner / LEFT OUTER with the probe side preserved (RIGHT OUTER
  *    with the probe on the right), equi keys plus EXACTLY ONE
  *    time inequality (`q.t <= p.t` backward, `>=` forward, strict
  *    variants excluded-at-equal), no other residual conjuncts;
  *  - window: a single row_number() partitioned by the probe side's ENTIRE
  *    output (the probe-row identity — anything less is not an as-of: the
  *    rank would merge distinct probe rows), ordered by the quote time
  *    DESC (backward) / ASC (forward), then optional quote-side tie-breaks;
  *  - filter: rn = 1 (rn <= 1 / rn < 2), other conjuncts reapplied on top.
  *
  * Exactness notes. Duplicate probe tuples: the idiom's rank keeps ONE row
  * per distinct probe tuple (duplicates share a window partition), so the
  * rewrite groups probes first — the hash aggregate is the price of exact
  * multiplicity. Null keys: quotes with a null key or null time are
  * filtered from the stream (SQL equality/inequality never matches them);
  * a null-keyed or null-timed probe then meets no quote in its frame and
  * null-extends (LEFT) or drops (INNER), exactly as the join did. Ties:
  * the original ranks same-time quotes by the residual ORDER BY keys; the
  * union-stream mirrors each tie-break REVERSED for backward (its running
  * last takes the ascending order's last) and as-is for forward. Probe
  * rows interleave with same-instant quotes by a stream flag ordered so
  * that <= / >= include the equal instant and < / > exclude it.
  *
  * Fires only when every matched expression is deterministic and the probe
  * row type is groupable; declines (leaving the stock plan) on anything
  * else — the rule stays attached to shared sessions, so every rewrite
  * shape must be exact for ALL inputs, not just the contract queries
  * (RangeJoinRuleSpec discipline). Correctness: AsofRuleSpec (rewrite ≡
  * rule-off results across join types / directions / strictness /
  * duplicates / null keys and times, plan join-free) plus the q125
  * contract query hash-matched against DuckDB's native ASOF JOIN.
  */
object AsofJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** rn pinned to exactly its top rank: rn = 1, rn <= 1, rn < 2. */
  private def pinsToOne(c: Expression, rn: Attribute): Boolean = c match {
    case EqualTo(a: Attribute, IntegerLiteral(1)) => a.semanticEquals(rn)
    case EqualTo(IntegerLiteral(1), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, IntegerLiteral(1)) => a.semanticEquals(rn)
    case GreaterThanOrEqual(IntegerLiteral(1), a: Attribute) => a.semanticEquals(rn)
    case LessThan(a: Attribute, IntegerLiteral(2)) => a.semanticEquals(rn)
    case GreaterThan(IntegerLiteral(2), a: Attribute) => a.semanticEquals(rn)
    case _ => false
  }

  private def reverseDir(d: SortDirection): SortDirection =
    if (d == Ascending) Descending else Ascending
  private def reverseNulls(n: NullOrdering): NullOrdering =
    if (n == NullsFirst) NullsLast else NullsFirst

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(fc,
        w @ Window(Seq(rnAlias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, wchild, _)) =>
      rewrite(f, fc, rnAlias.toAttribute, partitionSpec, orderSpec, wchild)
        .getOrElse(f)
  }

  private def rewrite(f: Filter, fc: Expression, rn: Attribute,
      partitionSpec: Seq[Expression], orderSpec: Seq[SortOrder],
      wchild: LogicalPlan): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(fc)
    val (rnPins, residualFilter) = conjuncts.partition(pinsToOne(_, rn))
    if (rnPins.isEmpty || residualFilter.exists(_.references.contains(rn)))
      return None

    // strip the WindowGroupLimit the stock optimizer inserted for this very
    // filter, and see through a pruning (attribute-only) projection
    val noLimit = wchild match {
      case WindowGroupLimit(_, _, _, _, c) => c
      case c => c
    }
    val (visible: Seq[Attribute], joinPlan) = noLimit match {
      case p @ Project(projList, c) if projList.forall(_.isInstanceOf[Attribute]) =>
        (projList.map(_.asInstanceOf[Attribute]), c)
      case c => (c.output, c)
    }
    val j = joinPlan match {
      case j @ Join(_, _, _, Some(_), hint)
          if hint == JoinHint.NONE && !j.isStreaming => j
      case _ => return None
    }

    // probe side = the side whose ENTIRE output is the window partition key
    if (!partitionSpec.forall(_.isInstanceOf[Attribute])) return None
    val partSet = AttributeSet(partitionSpec.map(_.asInstanceOf[Attribute]))
    def sameSet(a: AttributeSet, b: AttributeSet) =
      a.subsetOf(b) && b.subsetOf(a)
    val (probe, quote, probeIsLeft) =
      if (sameSet(partSet, j.left.outputSet)) (j.left, j.right, true)
      else if (sameSet(partSet, j.right.outputSet)) (j.right, j.left, false)
      else return None
    val preservedOk = j.joinType match {
      case Inner => true
      case LeftOuter => probeIsLeft
      case RightOuter => !probeIsLeft
      case _ => false
    }
    if (!preservedOk) return None
    val outerJoin = j.joinType != Inner

    // condition: equi key pairs + exactly one probe/quote time inequality
    def onProbe(e: Expression) = canEvaluate(e, probe) && e.references.nonEmpty
    def onQuote(e: Expression) = canEvaluate(e, quote) && e.references.nonEmpty
    var keys = Seq.empty[(Expression, Expression)] // (probe key, quote key)
    // (probe time, quote time, backward?, inclusive?)
    var time: Option[(Expression, Expression, Boolean, Boolean)] = None
    for (c <- splitConjunctivePredicates(j.condition.get)) c match {
      case EqualTo(a, b) if onProbe(a) && onQuote(b) => keys :+= ((a, b))
      case EqualTo(a, b) if onQuote(a) && onProbe(b) => keys :+= ((b, a))
      case _ =>
        val cls = c match { // normalize to (quote ? probe)
          case LessThanOrEqual(a, b) => Seq((a, b, true, true))
          case GreaterThanOrEqual(a, b) => Seq((b, a, true, true))
          case LessThan(a, b) => Seq((a, b, true, false))
          case GreaterThan(a, b) => Seq((b, a, true, false))
          case _ => Nil
        }
        val t = cls.flatMap {
          case (qe, pe, _, incl) if onQuote(qe) && onProbe(pe) =>
            Seq((pe, qe, true, incl)) // quote <= probe: backward
          case (pe, qe, _, incl) if onProbe(pe) && onQuote(qe) =>
            Seq((pe, qe, false, incl)) // probe <= quote: forward
          case _ => Nil
        }
        if (t.isEmpty || time.nonEmpty) return None
        time = Some(t.head)
    }
    val (pt, qt, backward, inclusive) = time.getOrElse(return None)
    if (pt.dataType != qt.dataType) return None

    // window order: quote time first, in the as-of direction, then
    // quote-side tie-breaks; probe-side keys are constant per partition
    // (the partition IS the probe row) and are ignored
    if (orderSpec.isEmpty) return None
    val head = orderSpec.head
    if (!head.child.semanticEquals(qt)) return None
    if (backward && head.direction != Descending) return None
    if (!backward && head.direction != Ascending) return None
    var ties = Seq.empty[SortOrder]
    for (so <- orderSpec.tail) {
      if (onQuote(so.child)) ties :+= so
      else if (!canEvaluate(so.child, probe)) return None
    }

    val everything = keys.flatMap(k => Seq(k._1, k._2)) ++ Seq(pt, qt) ++
      ties.map(_.child) :+ fc
    if (everything.exists(!_.deterministic)) return None
    if (!probe.output.forall(a => RowOrdering.isOrderable(a.dataType)))
      return None
    if (keys.exists { case (a, b) => a.dataType != b.dataType }) return None
    if (!RowOrdering.isOrderable(pt.dataType)) return None

    // ---- build the union stream ----
    val pAttrs = probe.output
    val qAttrs = quote.output
    // the match struct carries only the quote columns anything above needs
    val neededQ = qAttrs.filter(a =>
      visible.exists(_.exprId == a.exprId) ||
        ties.exists(_.child.references.contains(a)))
    val structFields: Seq[(String, Expression)] =
      if (neededQ.nonEmpty) neededQ.map(a => (a.name, a: Expression))
      else Seq(("__one", Literal(1)))
    val qStructIdx: Map[ExprId, Int] =
      neededQ.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
    val qStruct = CreateNamedStruct(
      structFields.flatMap { case (n, e) => Seq(Literal(n), e) })
    val structDt = qStruct.dataType

    // the idiom keeps one row per DISTINCT probe tuple — mirror it
    val dedupP = Aggregate(pAttrs, pAttrs, probe)
    // null-keyed / null-timed quotes can never match anyone; a window
    // partition would group them with null-keyed probes, so drop them here
    val qNotNull = (keys.map(_._2) :+ qt)
      .map(IsNotNull(_): Expression).reduce(And)
    val qFiltered = Filter(qNotNull, quote)

    def gk(i: Int) = s"__graft_k$i"
    val pStream = Project(
      pAttrs ++
        keys.zipWithIndex.map { case ((pk, _), i) => Alias(pk, gk(i))() } ++ Seq(
        Alias(pt, "__graft_t")(),
        Alias(Literal(0), "__graft_isq")(),
        Alias(Literal.create(null, structDt), "__graft_q")()),
      dedupP)
    val qStream = Project(
      pAttrs.map(a => Alias(Literal.create(null, a.dataType), a.name)()) ++
        keys.zipWithIndex.map { case ((_, qk), i) => Alias(qk, gk(i))() } ++ Seq(
        Alias(qt, "__graft_t")(),
        Alias(Literal(1), "__graft_isq")(),
        Alias(qStruct, "__graft_q")()),
      qFiltered)
    val union = Union(Seq(pStream, qStream))
    val uOut = union.output
    val n = pAttrs.size
    val m = keys.size
    val uProbe = uOut.take(n) // same exprIds as probe.output, nullability merged
    val gkAttrs: Seq[Expression] = uOut.slice(n, n + m)
    val gtAttr = uOut(n + m)
    val isqAttr = uOut(n + m + 1)
    val gqAttr = uOut(n + m + 2)

    def tieToStream(so: SortOrder, rev: Boolean): SortOrder = {
      val e = so.child.transform {
        case a: Attribute if qStructIdx.contains(a.exprId) =>
          GetStructField(gqAttr, qStructIdx(a.exprId), Some(a.name))
      }
      if (rev) SortOrder(e, reverseDir(so.direction),
        reverseNulls(so.nullOrdering), Nil)
      else SortOrder(e, so.direction, so.nullOrdering, Nil)
    }
    // backward: running LAST over [start, current] — ascending time, quotes
    // before probes at an equal instant iff inclusive, tie-breaks reversed
    // (the order's last = the original order's first). forward: running
    // FIRST over [current, end] — probes before quotes iff inclusive,
    // tie-breaks as written. Null probe times sort where no quote can
    // reach them (quote times are never null here).
    val ordering =
      if (backward)
        Seq(SortOrder(gtAttr, Ascending, NullsFirst, Nil),
          SortOrder(isqAttr, if (inclusive) Descending else Ascending, NullsLast, Nil)) ++
          ties.map(tieToStream(_, rev = true))
      else
        Seq(SortOrder(gtAttr, Ascending, NullsLast, Nil),
          SortOrder(isqAttr, if (inclusive) Ascending else Descending, NullsFirst, Nil)) ++
          ties.map(tieToStream(_, rev = false))
    val frame =
      if (backward) SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
      else SpecifiedWindowFrame(RowFrame, CurrentRow, UnboundedFollowing)
    val carry =
      if (backward) Last(gqAttr, ignoreNulls = true).toAggregateExpression()
      else First(gqAttr, ignoreNulls = true).toAggregateExpression()
    val mAlias = Alias(
      WindowExpression(carry, WindowSpecDefinition(gkAttrs, ordering, frame)),
      "__graft_m")()
    val win = Window(Seq(mAlias), gkAttrs, ordering, union)
    val mAttr = mAlias.toAttribute

    val probeOnly: Expression = EqualTo(isqAttr, Literal(0))
    val keep = if (outerJoin) probeOnly else And(probeOnly, IsNotNull(mAttr))
    val filtered = Filter(keep, win)

    // restore the original output: probe attrs pass through the union with
    // their exprIds (nullability re-tightened — only real probe rows
    // survive); quote attrs come out of the matched struct; rn is the
    // constant its filter pinned
    val uProbeById = uProbe.map(a => a.exprId -> a).toMap
    // every visible column must be a probe attr or a struct-carried quote
    // attr (neededQ covers visible ∩ quote by construction, but guard)
    if (visible.exists(a => !uProbeById.contains(a.exprId) &&
        !qStructIdx.contains(a.exprId))) return None
    val outCols: Seq[NamedExpression] = visible.map { a =>
      uProbeById.get(a.exprId) match {
        case Some(ua) =>
          if (!a.nullable) Alias(KnownNotNull(ua), a.name)(exprId = a.exprId)
          else ua
        case None =>
          val field = GetStructField(mAttr, qStructIdx(a.exprId), Some(a.name))
          val e = if (!a.nullable && !outerJoin) KnownNotNull(field) else field
          Alias(e, a.name)(exprId = a.exprId)
      }
    } :+ Alias(Literal(1), rn.name)(exprId = rn.exprId)

    val projected = Project(outCols, filtered)
    Some(if (residualFilter.isEmpty) projected
    else Filter(residualFilter.reduce(And), projected))
  }
}
