package graft

import graft.operators.IntervalSweep
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IntervalSweep vs brute force: max concurrency must equal the naive
  * "count intervals containing each boundary instant" self-join, and the
  * island union must cover exactly the same integer points as the inputs —
  * including touching endpoints, nested/identical/empty intervals, negative
  * coordinates and single-point intervals. */
class IntervalSweepSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // (key, lo, hi): overlapping chains, a same-instant close+open (hi = 10,
  // next lo = 10 — concurrency 2 at t=10), adjacent-not-overlapping
  // ([1,5] + [6,9] — islands merge, concurrency stays 1), nested, identical
  // duplicates, single-point, empty (hi < lo, dropped), negatives.
  private val iv = Seq(
    ("a", 0L, 10L), ("a", 10L, 20L), ("a", 5L, 7L), ("a", 5L, 7L),
    ("a", 40L, 45L), ("a", 46L, 50L), ("a", 60L, 59L),
    ("b", -10L, -1L), ("b", 0L, 0L), ("b", 2L, 3L),
    ("c", 100L, 200L), ("c", 150L, 160L), ("c", 150L, 160L), ("c", 190L, 210L))
    .toDF("k", "lo", "hi")

  test("maxConcurrent == naive count-at-boundaries self-join") {
    val got = IntervalSweep.maxConcurrent(iv, Seq("k"), "lo", "hi")
      .orderBy(col("k")).collect().map(r => (r.getString(0), r.getLong(1)))
    // concurrency is piecewise-constant between boundaries and only rises
    // at an interval's lo, so max over {lo points} is the global max
    val live = iv.filter(col("hi") >= col("lo"))
    val naive = live.select(col("k"), col("lo")).distinct()
      .join(live.select(col("k").as("k2"), col("lo").as("l2"), col("hi").as("h2")),
        col("k") === col("k2") && col("l2") <= col("lo") && col("lo") <= col("h2"))
      .groupBy(col("k"), col("lo")).agg(count(lit(1)).as("c"))
      .groupBy(col("k")).agg(max(col("c")).as("m"))
      .orderBy(col("k")).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == naive.toSeq)
    assert(got.toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 3L))
  }

  test("mergeIntervals covers exactly the input's integer points; island counts exact") {
    val islands = IntervalSweep.mergeIntervals(iv, Seq("k"), "lo", "hi")
    // islands are disjoint, non-adjacent, and their union of points equals
    // the union of the inputs' points (explode both sides and compare)
    val islandPts = islands
      .select(col("k"), explode(sequence(col("island_lo"), col("island_hi"))).as("p"))
      .distinct().orderBy(col("k"), col("p"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val inputPts = iv.filter(col("hi") >= col("lo"))
      .select(col("k"), explode(sequence(col("lo"), col("hi"))).as("p"))
      .distinct().orderBy(col("k"), col("p"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(islandPts == inputPts)
    // adjacency merged: no two islands of one key touch (gap >= 2)
    val perKey = islands.collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((_, is) <- perKey if is.size > 1; w <- is.sliding(2) if w.size == 2)
      assert(w(1)._2 > w(0)._3 + 1, s"adjacent islands not merged: $w")
    // n_intervals sums to the live input count
    assert(islands.agg(sum(col("n_intervals"))).collect()(0).getLong(0) ==
      iv.filter(col("hi") >= col("lo")).count())
    // a: [0,20]+[5,7]dup merge; [40,45]+[46,50] adjacent-merge; empty dropped
    assert(perKey("a").map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0L, 20L, 4L), (40L, 50L, 2L)))
  }

  test("subtractIntervals: fragment points == left points minus island points, at 3 widths") {
    // left intervals vs a DISJOINT island set (mergeIntervals output
    // contract): fully-covered (zero fragments), untouched, edge-covered
    // lo/hi, island strictly inside (splits in two), several islands in
    // one interval, touching endpoints, negatives, empty left (dropped)
    val left = Seq((0L, 10L, 1L), (20L, 22L, 2L), (-15L, -5L, 3L),
      (30L, 60L, 4L), (41L, 43L, 5L), (70L, 69L, 6L), (100L, 130L, 7L))
      .toDF("s_lo", "s_hi", "sid")
    val islands = Seq((-20L, -10L), (2L, 4L), (7L, 8L), (19L, 23L),
      (40L, 45L), (55L, 75L), (110L, 112L), (120L, 121L))
      .toDF("i_lo", "i_hi")
    for (w <- Seq(1L, 8L, 1024L)) {
      val frags = IntervalSweep.subtractIntervals(
        left, islands, "sid", "s_lo", "s_hi", "i_lo", "i_hi", w)
      // multiplicity/attribution: fragments regroup under their sid and
      // tile exactly the allowed points of THAT interval
      val got = frags
        .select(col("sid"), explode(sequence(col("frag_lo"), col("frag_hi"))).as("p"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val leftPts = left.filter(col("s_hi") >= col("s_lo"))
        .select(col("sid"), explode(sequence(col("s_lo"), col("s_hi"))).as("p"))
      val islandPts = islands
        .select(explode(sequence(col("i_lo"), col("i_hi"))).as("p"))
      val want = leftPts.join(islandPts, Seq("p"), "left_anti")
        .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.toSeq
      assert(got == want && got.nonEmpty,
        s"w=$w: extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
      // no duplicate points means fragments are disjoint; also assert the
      // walk emits them as maximal runs (no two fragments of one sid touch)
      val byId = frags.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
      for ((_, fs) <- byId if fs.size > 1; p <- fs.sliding(2) if p.size == 2)
        assert(p(1)._2 > p(0)._3 + 1, s"fragments not maximal: $p")
    }
  }

  test("both sweeps are ONE shuffle: the window exchange's hash(keys) satisfies every later grouping") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((name, df) <- Seq(
          "maxConcurrent" -> IntervalSweep.maxConcurrent(iv, Seq("k"), "lo", "hi"),
          "mergeIntervals" -> IntervalSweep.mergeIntervals(iv, Seq("k"), "lo", "hi"))) {
        val ex = df.queryExecution.executedPlan
          .collect { case e: ShuffleExchangeExec => e }
        assert(ex.size == 1, s"$name: expected 1 exchange, got ${ex.size}:\n" +
          df.queryExecution.executedPlan)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
