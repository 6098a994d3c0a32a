package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Banded range joins — the scale rewrite for the non-equi join classes the
  * reference can only run as nested loops (reference defaultJoin NLJ path,
  * `DirectPlanConverter.scala:150-178`; SURVEY §2.3 "Range / as-of /
  * interval joins: absent"). Stock Spark plans `|a.k − b.k| <= eps` and
  * `lo <= p AND p <= hi` as BroadcastNestedLoopJoin — O(|L|·|R|) compares
  * and a full broadcast of one side, which is exactly what dies first at
  * 100 TB (neither side of a fact×fact band join is broadcastable).
  *
  * The rewrite: quantize the join key into fixed-width bands and equi-join
  * on the band id, so Catalyst plans a plain shuffle hash/sort-merge join
  * partitioned by band — both sides shuffle once on a key with corpus-wide
  * cardinality, no broadcast, no quadratic compare. A residual predicate
  * re-checks the true condition, removing band-collision false positives;
  * completeness is arithmetic, not probabilistic:
  *
  *  - ε-band: with band(x) = floorDiv(x, eps), |a−b| <= eps implies
  *    |band(a) − band(b)| <= 1, so replicating ONE side to its band ±1
  *    covers every qualifying pair exactly once per (a,b).
  *  - point-in-interval: a point visits its single band; a range [lo, hi]
  *    replicates to each band it overlaps (ceil((hi−lo)/W) + 1 rows), so a
  *    containing range always shares the point's band, and shares it once.
  *
  * Keys may be integral, DATE or TIMESTAMP/NTZ (one scale family per call
  * — TimeKeys maps each to a monotonic exact Long image: native units /
  * days / epoch µs, the same families as the optimizer rule's `longUnits`;
  * scale decimals to longs up front): the band arithmetic is exact integer
  * math, so the rewrite is lossless — proven pair-for-pair equal to the
  * naive theta join in RangeJoinSpec. Widths/eps are Longs in the family's
  * units (days for DATE, µs for timestamps).
  *
  * 100 TB knobs: `eps`/`bandWidth` trades replication against selectivity —
  * right-side blowup is ×3 (ε-band) or ×(range/W + 1) (interval), while the
  * per-band candidate count shrinks linearly with width. Pick W near the
  * typical range length so replication stays O(1) per row. Hot bands (value
  * clustering) are ordinary join skew — AQE's skew split or SkewJoin's salt
  * applies unchanged, because after the rewrite this IS an ordinary join.
  */
object RangeJoin {

  /** Exact floor-division band id for integral keys over the FULL Long
    * domain: truncating `div` (IntegralDivide), minus one when a negative
    * dividend had a remainder — the same remainder-adjusted form as the
    * Catalyst twin BandedIntervalJoinRule.bandOf, so the two layers agree
    * everywhere. No pmod/subtract intermediate, so nothing wraps near
    * Long.MinValue (the `k - pmod(k, w)` spelling this replaces underflowed
    * for keys within w of Long.MinValue; the earlier `/` spelling went
    * through DoubleType and misrouted ~6% of band ids above 2^53). The
    * whole computation stays in Long — band ids are exact for nanosecond
    * epochs and scaled 18-digit decimals alike. (`div - 1` cannot itself
    * underflow: |div| < |k| for w > 1, and at w = 1 the remainder is
    * always zero.) */
  private[operators] def bandOf(c: Column, w: Long): Column = {
    val k = c.cast(LongType)
    val div = call_function("div", k, lit(w))
    when(k < 0 && k % lit(w) =!= lit(0L), div - lit(1L)).otherwise(div)
  }

  /** ε-band join: all pairs with |left.leftKey − right.rightKey| <= eps
    * (inclusive), as an equi-join on band id. The RIGHT side replicates ×3
    * (band −1/0/+1) — put the smaller input right. Keys may be integral,
    * DATE or TIMESTAMP/NTZ (one family per call — TimeKeys); eps is in
    * the family's Long units (native / days / µs). Column sets must be
    * disjoint; output carries left's columns then right's. */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, eps: Long): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "bandJoin inputs must have disjoint column names")
    val (ldt, rdt) = (left.schema(leftKey).dataType, right.schema(rightKey).dataType)
    require(TimeKeys.familyOf(ldt) == TimeKeys.familyOf(rdt),
      s"bandJoin keys mix scale families: $ldt vs $rdt")
    def lk = TimeKeys.toLong(col(leftKey), ldt)
    def rk = TimeKeys.toLong(col(rightKey), rdt)
    val l = left.withColumn("__lband", bandOf(lk, eps))
    val r = right.withColumn("__rband", explode(array(
      bandOf(rk, eps) - 1, bandOf(rk, eps), bandOf(rk, eps) + 1)))
    l.join(r, col("__lband") === col("__rband") && abs(lk - rk) <= lit(eps))
      .drop("__lband", "__rband")
  }

  /** Interval-overlap join: every (a, b) pair whose closed intervals
    * intersect — a.lo <= b.hi AND b.lo <= a.hi — the temporal-join shape
    * (overlapping sessions, concurrent bookings, colliding windows) that
    * stock Spark and the reference both run as a nested loop. BOTH sides
    * replicate to the bands their interval covers and equi-join on the
    * band id; a pair sharing several bands would duplicate, so each pair
    * is emitted ONLY at its canonical band — band(max(a.lo, b.lo)), the
    * overlap region's low end, which both replicas provably cover exactly
    * once. Exact for any width (residual + canonical-band predicate
    * decide; bands only route). Empty intervals (hi < lo) drop up front.
    * Width trades replication (len/W + 1 per row per side) against
    * per-band selectivity — pick W near the typical interval length.
    * Column sets must be disjoint; output carries left's columns then
    * right's. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long): DataFrame =
    intervalOverlap(left, right, Nil, Nil, lLo, lHi, rLo, rHi, bandWidth)

  /** PER-KEY interval-overlap join — pairs must overlap AND agree on the
    * positionally-aligned key columns ("which of THIS user's sessions
    * collide?"). The keys join as extra equality conjuncts, so the
    * shuffle co-partitions on (key, band): per-key band occupancy decides
    * the candidate count instead of corpus-wide time-band collisions —
    * the difference between a per-user and an all-users quadratic at
    * 100 TB (an unkeyed overlap + post-filter would compute every
    * cross-key collision first). Null keys match nothing (equality
    * semantics), exactly as the naive keyed theta join. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lKeys: Seq[String], rKeys: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "intervalOverlap inputs must have disjoint column names")
    require(lKeys.size == rKeys.size, "lKeys and rKeys must align positionally")
    val keyEq = lKeys.zip(rKeys)
      .map { case (a, b) => col(a) === col(b) }
      .foldLeft(lit(true))(_ && _)
    val w = bandWidth
    val dt = left.schema(lLo).dataType
    TimeKeys.requireSameFamily("intervalOverlap", left, Seq(lLo, lHi))
    TimeKeys.requireSameFamily("intervalOverlap", right, Seq(rLo, rHi))
    require(TimeKeys.familyOf(dt) == TimeKeys.familyOf(right.schema(rLo).dataType),
      "intervalOverlap sides mix scale families")
    def lk(c: String) = TimeKeys.toLong(col(c), dt)
    def rk(c: String) = TimeKeys.toLong(col(c), right.schema(rLo).dataType)
    // NOT filtered on hi >= lo: unlike containment, the overlap predicate
    // can match an INVERTED interval (a = [50, 45] overlaps b = [28, 60] —
    // both inequalities hold). When a side is inverted, algebra forces the
    // other side's lo at or below this side's lo, so the canonical band is
    // band(lo) — covered by the degenerate sequence(band(lo), band(lo))
    // that greatest(lo, hi) produces. Normal rows are unaffected.
    val l = left.withColumn("__lband", explode(sequence(
      bandOf(lk(lLo), w), bandOf(greatest(lk(lLo), lk(lHi)), w))))
    val r = right.withColumn("__rband", explode(sequence(
      bandOf(rk(rLo), w), bandOf(greatest(rk(rLo), rk(rHi)), w))))
    l.join(r, keyEq && col("__lband") === col("__rband") &&
        col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__lband") === bandOf(greatest(lk(lLo), rk(rLo)), w))
      .drop("__lband", "__rband")
  }

  /** Interval-overlap SEMI join — left rows whose interval overlaps ANY
    * right interval ("does this doc's validity window hit any embargo
    * window?" — the decontamination shape for interval×interval). A naive
    * banded semi would explode the PRESERVED left side and let several
    * band replicas of one row survive, so multiplicity lifts to distinct
    * tuples instead: group identical left rows with their count, decide
    * overlap-existence once per distinct tuple (band-exploded semi — no
    * canonical-band needed, semi is blind to match multiplicity; any
    * overlapping pair shares at least the canonical band, so routing is
    * complete), re-expand by count. Exact at any width; inverted
    * intervals route via greatest(lo, hi) like [[intervalOverlap]]; null
    * bounds match nothing. Left columns must be groupable (no maps). */
  def intervalOverlapSemi(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long): DataFrame =
    overlapSemiAnti(left, right, Nil, Nil, lLo, lHi, rLo, rHi, bandWidth,
      anti = false)

  /** PER-KEY overlap SEMI — "does this session hit any of ITS OWN user's
    * embargo windows?"; keys join as equality conjuncts (co-partition on
    * key+band), null keys match nothing. */
  def intervalOverlapSemi(left: DataFrame, right: DataFrame,
      lKeys: Seq[String], rKeys: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long): DataFrame =
    overlapSemiAnti(left, right, lKeys, rKeys, lLo, lHi, rLo, rHi, bandWidth,
      anti = false)

  /** Interval-overlap ANTI join — left rows whose interval overlaps NO
    * right interval (the keep-side of interval decontamination). Same
    * distinct-tuple lift as [[intervalOverlapSemi]]. */
  def intervalOverlapAnti(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long): DataFrame =
    overlapSemiAnti(left, right, Nil, Nil, lLo, lHi, rLo, rHi, bandWidth,
      anti = true)

  /** PER-KEY overlap ANTI — keep left rows overlapping NONE of their own
    * key's right intervals; a left row whose key has no right group at
    * all is kept (overlaps nothing), matching the naive keyed NOT EXISTS. */
  def intervalOverlapAnti(left: DataFrame, right: DataFrame,
      lKeys: Seq[String], rKeys: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long): DataFrame =
    overlapSemiAnti(left, right, lKeys, rKeys, lLo, lHi, rLo, rHi, bandWidth,
      anti = true)

  private def overlapSemiAnti(left: DataFrame, right: DataFrame,
      lKeys: Seq[String], rKeys: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long, anti: Boolean): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "intervalOverlapSemi/Anti inputs must have disjoint column names")
    require(lKeys.size == rKeys.size, "lKeys and rKeys must align positionally")
    val w = bandWidth
    val (ldt, rdt) = (left.schema(lLo).dataType, right.schema(rLo).dataType)
    TimeKeys.requireSameFamily("intervalOverlapSemi/Anti", left, Seq(lLo, lHi))
    TimeKeys.requireSameFamily("intervalOverlapSemi/Anti", right, Seq(rLo, rHi))
    require(TimeKeys.familyOf(ldt) == TimeKeys.familyOf(rdt),
      "intervalOverlapSemi/Anti sides mix scale families")
    def lk(c: String) = TimeKeys.toLong(col(c), ldt)
    def rk(c: String) = TimeKeys.toLong(col(c), rdt)
    val grouped = left.groupBy(left.columns.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val gx = grouped.withColumn("__lband", explode(sequence(
      bandOf(lk(lLo), w), bandOf(greatest(lk(lLo), lk(lHi)), w))))
    val rx = right.withColumn("__rband", explode(sequence(
      bandOf(rk(rLo), w), bandOf(greatest(rk(rLo), rk(rHi)), w))))
    val keyEq = lKeys.zip(rKeys)
      .map { case (a, b) => col(a) === col(b) }
      .foldLeft(lit(true))(_ && _)
    val overlap = col(lLo) <= col(rHi) && col(rLo) <= col(lHi)
    val matched = gx
      .join(rx, keyEq && col("__lband") === col("__rband") && overlap,
        "left_semi")
      .drop("__lband").distinct()
    val kept =
      if (anti) grouped.join(matched,
        left.columns.map(c => grouped(c) <=> matched(c)).reduce(_ && _),
        "left_anti")
      else matched
    kept.withColumn("__i", explode(sequence(lit(1L), col("__cnt"))))
      .select(left.columns.map(col): _*)
  }

  /** Interval-overlap FULL OUTER join — matched overlapping pairs plus
    * null-extended unmatched rows from BOTH sides (the dual of
    * [[pointInIntervalFullOuter]] for interval×interval). No single banded
    * join can express it (both sides are preserved AND both explode), so
    * it composes three banded legs: matched pairs via [[intervalOverlap]]
    * (canonical-band dedup keeps pair multiplicity exact), unmatched-left
    * via [[intervalOverlapAnti]] null-extended on the right, and
    * unmatched-right via the mirrored anti null-extended on the left —
    * the antis' distinct-tuple lift preserves duplicate-row multiplicity
    * on each preserved side. Null or inverted bounds follow the overlap
    * predicate exactly as the nested loop would (null bounds match
    * nothing and surface as unmatched). Both sides' columns must be
    * groupable (no maps) and disjoint; output carries left's columns then
    * right's. */
  def intervalOverlapFullOuter(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long): DataFrame =
    intervalOverlapFullOuter(left, right, Nil, Nil, lLo, lHi, rLo, rHi,
      bandWidth)

  /** PER-KEY overlap FULL OUTER — the keys thread through all three
    * banded legs, so every leg co-partitions on (key, band). */
  def intervalOverlapFullOuter(left: DataFrame, right: DataFrame,
      lKeys: Seq[String], rKeys: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      bandWidth: Long): DataFrame = {
    val matched = intervalOverlap(left, right, lKeys, rKeys,
      lLo, lHi, rLo, rHi, bandWidth)
    val unmatchedL = intervalOverlapAnti(left, right, lKeys, rKeys,
        lLo, lHi, rLo, rHi, bandWidth)
      .select(left.columns.map(col) ++ right.schema.map(f =>
        lit(null).cast(f.dataType).as(f.name)): _*)
    val unmatchedR = intervalOverlapAnti(right, left, rKeys, lKeys,
        rLo, rHi, lLo, lHi, bandWidth)
      .select(left.schema.map(f =>
        lit(null).cast(f.dataType).as(f.name)) ++ right.columns.map(col): _*)
    matched.unionByName(unmatchedL).unionByName(unmatchedR)
  }

  /** FULL OUTER containment join — the one containment shape the
    * optimizer rule deliberately leaves on the nested loop (the exploded
    * ranges side is preserved under FULL OUTER, so its unmatched REPLICAS
    * would each null-extend). Banded composition instead:
    * matched pairs (banded inner) UNION ALL unmatched points (banded
    * left-anti, null-extended range columns) UNION ALL unmatched ranges
    * (null-extended point columns). The third leg recovers range-side
    * multiplicity without exploding a preserved side: group identical
    * range rows with their count, decide matched-ness on the DISTINCT
    * tuples (exploded semi-join against the points — identical tuples
    * match identically, so the decision lifts to the group), then
    * re-expand the unmatched groups by their count. Exact for any width;
    * null or inverted (hi < lo) bounds match nothing and surface as
    * unmatched ranges, null points as unmatched points — byte-for-byte
    * the nested loop's FULL OUTER. Range columns must be groupable
    * (no maps). Output: points' columns then ranges'. */
  def pointInIntervalFullOuter(points: DataFrame, ranges: DataFrame,
      pointKey: String, loKey: String, hiKey: String,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(points.columns.toSet.intersect(ranges.columns.toSet).isEmpty,
      "pointInIntervalFullOuter inputs must have disjoint column names")
    val w = bandWidth
    val (pdt, rdt) = (points.schema(pointKey).dataType, ranges.schema(loKey).dataType)
    TimeKeys.requireSameFamily("pointInIntervalFullOuter", ranges, Seq(loKey, hiKey))
    require(TimeKeys.familyOf(pdt) == TimeKeys.familyOf(rdt),
      "pointInIntervalFullOuter sides mix scale families")
    val contains = col(pointKey) >= col(loKey) && col(pointKey) <= col(hiKey)
    val p = points.withColumn("__pband", bandOf(TimeKeys.toLong(col(pointKey), pdt), w))
    def rangeBands = explode(sequence(
      bandOf(TimeKeys.toLong(col(loKey), rdt), w),
      bandOf(TimeKeys.toLong(col(hiKey), rdt), w)))
    val rx = ranges.filter(col(hiKey) >= col(loKey))
      .withColumn("__rband", rangeBands)
    val matched = p.join(rx, col("__pband") === col("__rband") && contains)
      .drop("__pband", "__rband")
    // null pointKey ⇒ null band ⇒ no equality match ⇒ anti keeps the row,
    // exactly as the nested loop (null BETWEEN anything is never true)
    val unmatchedP = p
      .join(rx, col("__pband") === col("__rband") && contains, "left_anti")
      .drop("__pband")
      .select(points.columns.map(col) ++ ranges.schema.map(f =>
        lit(null).cast(f.dataType).as(f.name)): _*)
    // range-side recovery on distinct tuples: count multiplicity, decide
    // matched-ness once per tuple (band-exploded semi vs the points — a
    // tuple matched iff ANY of its band replicas matched), re-expand
    val grouped = ranges.groupBy(ranges.columns.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val gx = grouped.filter(col(hiKey) >= col(loKey))
      .withColumn("__rband", rangeBands)
    val matchedTuples = gx
      .join(p, col("__pband") === col("__rband") && contains, "left_semi")
      .drop("__rband").distinct()
    val unmatchedR = grouped.join(matchedTuples,
        ranges.columns.map(c => grouped(c) <=> matchedTuples(c)).reduce(_ && _),
        "left_anti")
      .withColumn("__i", explode(sequence(lit(1L), col("__cnt"))))
      .select(points.schema.map(f =>
        lit(null).cast(f.dataType).as(f.name)) ++ ranges.columns.map(col): _*)
    matched.unionByName(unmatchedP).unionByName(unmatchedR)
  }

  /** Point-in-interval join: every (point, range) pair with
    * ranges.loKey <= points.pointKey <= ranges.hiKey (closed interval), as
    * an equi-join on band id. Ranges replicate to each band they overlap;
    * empty ranges (hi < lo) are dropped up front (they can match nothing,
    * and sequence() would otherwise walk backwards). Column sets must be
    * disjoint; output carries points' columns then ranges'. */
  def pointInInterval(points: DataFrame, ranges: DataFrame,
      pointKey: String, loKey: String, hiKey: String, bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(points.columns.toSet.intersect(ranges.columns.toSet).isEmpty,
      "pointInInterval inputs must have disjoint column names")
    val (pdt, rdt) = (points.schema(pointKey).dataType, ranges.schema(loKey).dataType)
    TimeKeys.requireSameFamily("pointInInterval", ranges, Seq(loKey, hiKey))
    require(TimeKeys.familyOf(pdt) == TimeKeys.familyOf(rdt),
      "pointInInterval sides mix scale families")
    val p = points.withColumn("__pband",
      bandOf(TimeKeys.toLong(col(pointKey), pdt), bandWidth))
    val r = ranges.filter(col(hiKey) >= col(loKey))
      .withColumn("__pband", explode(sequence(
        bandOf(TimeKeys.toLong(col(loKey), rdt), bandWidth),
        bandOf(TimeKeys.toLong(col(hiKey), rdt), bandWidth))))
    p.join(r, Seq("__pband"))
      .filter(col(pointKey) >= col(loKey) && col(pointKey) <= col(hiKey))
      .drop("__pband")
  }

  /** PER-KEY point-in-interval join — "each user's events inside that
    * user's own promo windows": the positionally-aligned key columns join
    * as equality conjuncts, so the shuffle co-partitions on (key, band)
    * and candidates are bounded by per-key band occupancy, not the
    * corpus-wide day's traffic. Null keys match nothing. */
  def pointInInterval(points: DataFrame, ranges: DataFrame,
      pKeys: Seq[String], rKeys: Seq[String],
      pointKey: String, loKey: String, hiKey: String,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(points.columns.toSet.intersect(ranges.columns.toSet).isEmpty,
      "pointInInterval inputs must have disjoint column names")
    require(pKeys.size == rKeys.size, "pKeys and rKeys must align positionally")
    val (pdt, rdt) = (points.schema(pointKey).dataType, ranges.schema(loKey).dataType)
    TimeKeys.requireSameFamily("pointInInterval", ranges, Seq(loKey, hiKey))
    require(TimeKeys.familyOf(pdt) == TimeKeys.familyOf(rdt),
      "pointInInterval sides mix scale families")
    val keyEq = pKeys.zip(rKeys)
      .map { case (a, b) => col(a) === col(b) }
      .foldLeft(lit(true))(_ && _)
    val p = points.withColumn("__pband",
      bandOf(TimeKeys.toLong(col(pointKey), pdt), bandWidth))
    val r = ranges.filter(col(hiKey) >= col(loKey))
      .withColumn("__rband", explode(sequence(
        bandOf(TimeKeys.toLong(col(loKey), rdt), bandWidth),
        bandOf(TimeKeys.toLong(col(hiKey), rdt), bandWidth))))
    p.join(r, keyEq && col("__pband") === col("__rband") &&
        col(pointKey) >= col(loKey) && col(pointKey) <= col(hiKey))
      .drop("__pband", "__rband")
  }
}
