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
