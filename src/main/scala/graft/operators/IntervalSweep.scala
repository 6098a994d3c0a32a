package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Linear-time temporal operators over closed integer intervals [lo, hi] —
  * the questions every session/booking/validity-window table gets asked
  * ("how many were active at once?", "how much time was covered?", "what
  * is left after the embargo windows?") and that naive SQL answers with a
  * self-join the reference could only run as a nested loop (reference
  * defaultJoin NLJ path, `DirectPlanConverter.scala:150-178`). None of the
  * operators here pays the pair explosion:
  *
  *  - [[maxConcurrent]] is the classic boundary sweep — O(n log n) per key
  *    (one shuffle on the key + one windowed scan) instead of the O(n²)
  *    "count intervals containing each start" self-join.
  *  - [[mergeIntervals]] is gaps-and-islands — the same single windowed
  *    scan, emitting the union of the intervals as maximal disjoint
  *    islands.
  *  - [[subtractIntervals]] clips intervals against a merged island set —
  *    a banded left-outer join plus one higher-order gap walk.
  *
  * 100 TB: the sweeps are one shuffle on the grouping key followed by a
  * per-partition external-sorted window — the same plan class as any
  * windowed query, no pair blowup at any scale. A single key with a huge
  * timeline still external-sorts; key skew is ordinary window skew. Keys
  * must be integral (scale timestamps to epoch seconds/µs up front);
  * interval bounds must satisfy hi < Long.MaxValue (the sweep closes an
  * interval at hi + 1).
  */
object IntervalSweep {

  /** Per key, the maximum number of simultaneously-active closed intervals
    * [lo, hi] — +1 at lo, −1 at hi + 1, running sum ordered by boundary,
    * max per key. The running sum uses the default RANGE frame, whose
    * current-row bound includes every peer at the same instant — so
    * coincident boundaries coalesce inside the window itself (a
    * same-instant close+open never shows a phantom peak) and the whole
    * operator is ONE shuffle: the window exchange on the key, whose
    * hash(keys) partitioning also satisfies the final per-key max (subset
    * clustering — no second exchange; plan-asserted in the spec). Empty
    * intervals (hi < lo) are dropped. Output: keyCols ++ max_concurrent;
    * keys with no live interval are absent (max of nothing is undefined).
    */
  def maxConcurrent(df: DataFrame, keyCols: Seq[String],
      lo: String, hi: String): DataFrame = {
    val keys = keyCols.map(col)
    val bounds = df.filter(col(hi) >= col(lo))
      .select(keys :+ explode(array(
        struct(col(lo).cast(LongType).as("t"), lit(1L).as("d")),
        struct((col(hi).cast(LongType) + 1).as("t"), lit(-1L).as("d"))))
        .as("__b"): _*)
      .select(keys :+ col("__b.t").as("__t") :+ col("__b.d").as("__d"): _*)
    // default frame with an ORDER BY = RANGE UNBOUNDED PRECEDING..CURRENT
    // ROW: peers at the same __t are IN the frame, which is exactly the
    // boundary-coalescing the sweep needs
    val run = Window.partitionBy(keys: _*).orderBy(col("__t"))
    bounds.withColumn("__active", sum(col("__d")).over(run))
      .groupBy(keys: _*)
      .agg(max(col("__active")).as("max_concurrent"))
  }

  /** Interval SUBTRACTION — clip each left interval against a set of
    * DISJOINT, non-adjacent forbidden islands (the output contract of
    * [[mergeIntervals]]: pass raw windows through it first), emitting the
    * allowed fragments: left minus the islands' union. The "clip sessions
    * to allowed time" decontamination shape — the set-difference dual of
    * the overlap-anti join (anti DROPS a touched interval; subtract keeps
    * its clean parts).
    *
    * Plan: banded overlap join (via [[RangeJoin.intervalOverlap]]'s
    * banding, inlined here as a left-outer so untouched intervals pass
    * through whole) routes each left interval to the islands it overlaps;
    * the overlapping islands collect per left row (sorted — they are
    * disjoint, so (lo, hi) order is total), and a single `aggregate`
    * higher-order walk emits the gaps. No pair explosion: each left row
    * meets only the islands sharing its bands, and the collected list is
    * bounded by len/islandMinLen + 1.
    *
    * Left rows need a unique id column (`idCol`) to regroup fragments —
    * as-of/session tables have one; the walk is per id. The island set is
    * GLOBAL (one forbidden timeline for every row — the embargo shape);
    * for per-key islands, prefix both sides' times with a key offset or
    * filter per key first. Empty left intervals (hi < lo) drop; a
    * fully-covered interval emits zero fragments. Output: idCol ++
    * (frag_lo, frag_hi), one row per allowed fragment. */
  def subtractIntervals(left: DataFrame, islands: DataFrame,
      idCol: String, lLo: String, lHi: String,
      iLo: String, iHi: String, bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val w = bandWidth
    // shared full-Long-domain band id (RangeJoin.bandOf) — one spelling for
    // both layers, exact down to Long.MinValue
    def bandOf(c: Column): Column = RangeJoin.bandOf(c, w)
    val keys = Seq.empty[Column]
    val l = left.filter(col(lHi) >= col(lLo))
      .withColumn("__lband", explode(sequence(bandOf(col(lLo)), bandOf(col(lHi)))))
    val r = islands.filter(col(iHi) >= col(iLo))
      .withColumn("__rband", explode(sequence(bandOf(col(iLo)), bandOf(col(iHi)))))
    // canonical band on the overlap region's low end — each (left, island)
    // pair lands exactly once, islands that miss the interval null-extend
    val joined = l.join(r,
      col("__lband") === col("__rband") &&
        col(lLo) <= col(iHi) && col(iLo) <= col(lHi) &&
        col("__lband") === bandOf(greatest(col(lLo).cast(LongType),
          col(iLo).cast(LongType))), "left_outer")
      .filter(col("__rband").isNotNull || col("__lband") === bandOf(col(lLo)))
    val collected = joined
      .groupBy((col(idCol) +: keys) :+ col(lLo) :+ col(lHi): _*)
      .agg(sort_array(collect_list(when(col(iLo).isNotNull,
        struct(col(iLo).cast(LongType).as("lo"),
          col(iHi).cast(LongType).as("hi"))))).as("__blk"))
    // the walk: cursor starts at lLo; each island emits the gap before it
    // (if any) and advances the cursor past it; the finish step emits the
    // tail gap. Islands are disjoint and sorted, so one pass suffices.
    val frags = collected.withColumn("__frags", expr(
      s"""aggregate(
         |  __blk,
         |  named_struct('cur', CAST($lLo AS BIGINT), 'acc',
         |    CAST(array() AS ARRAY<STRUCT<lo: BIGINT, hi: BIGINT>>)),
         |  (st, b) -> named_struct(
         |    'cur', greatest(st.cur, b.hi + 1L),
         |    'acc', CASE WHEN b.lo > st.cur
         |      THEN array_append(st.acc,
         |        named_struct('lo', st.cur, 'hi', least(b.lo - 1L, CAST($lHi AS BIGINT))))
         |      ELSE st.acc END),
         |  st -> CASE WHEN st.cur <= CAST($lHi AS BIGINT)
         |    THEN array_append(st.acc,
         |      named_struct('lo', st.cur, 'hi', CAST($lHi AS BIGINT)))
         |    ELSE st.acc END)""".stripMargin))
    frags.select((col(idCol) +: keys) :+
        explode(col("__frags")).as("__f"): _*)
      .select((col(idCol) +: keys) :+
        col("__f.lo").as("frag_lo") :+ col("__f.hi").as("frag_hi"): _*)
  }

  /** Per key, the union of the closed intervals [lo, hi] as maximal
    * disjoint islands — intervals that overlap OR are adjacent (next.lo <=
    * current max hi + 1: [1,5] and [6,9] cover contiguous integers) merge.
    * Gaps-and-islands: running max of hi over the lo-ordered prefix
    * (exclusive of the current row); a row opens a new island when its lo
    * clears that max by more than 1; islands aggregate to their extent.
    * Empty intervals (hi < lo) are dropped. Output: keyCols ++ (island_lo,
    * island_hi, n_intervals) — one row per island.
    *
    * keyCols = Nil merges GLOBALLY — one window partition, so reserve it
    * for bounded inputs (e.g. unioning a blackout/embargo set before an
    * overlap-anti join, where the merged result is exactly what keeps the
    * join's band occupancy small — see q111). At lake scale a global merge
    * wants range-partition + per-range merge + boundary fix-up instead. */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
      lo: String, hi: String): DataFrame = {
    val keys = keyCols.map(col)
    val ord = Window.partitionBy(keys: _*)
      .orderBy(col(lo).cast(LongType), col(hi).cast(LongType))
    val prevMax = max(col(hi).cast(LongType))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    df.filter(col(hi) >= col(lo))
      .withColumn("__new",
        when(prevMax.isNull || col(lo).cast(LongType) > prevMax + 1, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keys :+ col("__island"): _*)
      .agg(min(col(lo).cast(LongType)).as("island_lo"),
        max(col(hi).cast(LongType)).as("island_hi"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }
}
