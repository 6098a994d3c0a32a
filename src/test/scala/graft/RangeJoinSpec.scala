package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** The banded range-join rewrite must be pair-for-pair EQUAL to the naive
  * theta join it replaces (the rewrite is arithmetic, not probabilistic),
  * and must actually plan as an equi-join — no BroadcastNestedLoopJoin, no
  * CartesianProduct — because avoiding the quadratic compare is its whole
  * reason to exist at 100 TB. */
class RangeJoinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def cents(c: String, as: String) =
    floor(col(c) * 100 + 0.5).cast("long").as(as)

  test("bandJoin == naive theta join on real data (acctbal bands, eps spanning band edges)") {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), cents("c_acctbal", "c_cents"))
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), cents("s_acctbal", "s_cents"))
    val banded = RangeJoin.bandJoin(cust, sup, "c_cents", "s_cents", 2500L)
      .select(col("c_custkey"), col("s_suppkey"))
      .collect().map(_.toString).sorted.toSeq
    val naive = cust.crossJoin(sup)
      .filter(abs(col("c_cents") - col("s_cents")) <= 2500L)
      .select(col("c_custkey"), col("s_suppkey"))
      .collect().map(_.toString).sorted.toSeq
    assert(banded.nonEmpty, "test eps too tight — nothing matched")
    assert(banded == naive,
      s"banded != naive: extra=${banded.diff(naive).take(3)} missing=${naive.diff(banded).take(3)}")
  }

  test("bandJoin exact across zero and at exact band-boundary distances (negative keys)") {
    import spark.implicits._
    // keys straddle 0 and land exactly eps apart / exactly on band edges —
    // the floorDiv(±1) completeness argument's worst cases
    val a = Seq(-10L, -7L, -5L, -1L, 0L, 1L, 4L, 5L, 9L, 10L, 15L)
      .toDF("av").withColumn("aid", col("av") + 100)
    val b = Seq(-15L, -10L, -6L, -5L, 0L, 3L, 5L, 10L, 14L, 20L)
      .toDF("bv").withColumn("bid", col("bv") + 1000)
    for (eps <- Seq(1L, 3L, 5L)) {
      val banded = RangeJoin.bandJoin(a, b, "av", "bv", eps)
        .select(col("aid"), col("bid")).collect().map(_.toString).sorted.toSeq
      val naive = a.crossJoin(b).filter(abs(col("av") - col("bv")) <= eps)
        .select(col("aid"), col("bid")).collect().map(_.toString).sorted.toSeq
      assert(banded == naive && banded.nonEmpty, s"eps=$eps: $banded vs $naive")
    }
  }

  test("pointInInterval == naive BETWEEN join; closed bounds; empty ranges dropped") {
    import spark.implicits._
    val points = Seq(-8L, -4L, 0L, 3L, 7L, 10L, 13L, 16L, 21L, 32L)
      .toDF("pv").withColumn("pid", col("pv") + 100)
    // ranges include: touching bounds exactly, spanning several bands,
    // within one band, crossing zero, and an EMPTY range (hi < lo)
    // rid is data-derived, NOT monotonically_increasing_id(): mid ids are
    // partition-encoded, so the same DF evaluated in two different plans
    // (banded vs naive) numbers rows differently under a non-default
    // session parallelism — bit us in the full-suite run
    val ranges = Seq((-9L, -4L), (-2L, 3L), (0L, 0L), (3L, 21L), (7L, 7L),
      (13L, 16L), (30L, 40L), (5L, 2L)).zipWithIndex
      .map { case ((lo, hi), i) => (lo, hi, i.toLong) }
      .toDF("lo", "hi", "rid")
    for (w <- Seq(1L, 4L, 16L)) {
      val banded = RangeJoin.pointInInterval(points, ranges, "pv", "lo", "hi", w)
        .select(col("pid"), col("rid")).collect().map(_.toString).sorted.toSeq
      val naive = points.crossJoin(ranges)
        .filter(col("pv") >= col("lo") && col("pv") <= col("hi"))
        .select(col("pid"), col("rid")).collect().map(_.toString).sorted.toSeq
      assert(banded == naive && banded.nonEmpty, s"w=$w: $banded vs $naive")
    }
  }

  test("intervalOverlap == naive overlap join; multiplicity exact when pairs share MANY bands") {
    import spark.implicits._
    // long intervals at a small width: overlapping pairs share up to 8
    // bands — without canonical-band emission every shared band would
    // duplicate the pair; with it each pair appears exactly once. Edges:
    // touching endpoints (hi == lo), nested intervals, identical
    // intervals, empty interval (hi < lo), negatives straddling zero.
    val a = Seq((-20L, 10L, 1L), (0L, 30L, 2L), (5L, 6L, 3L), (10L, 40L, 4L),
      (25L, 25L, 5L), (50L, 45L, 6L), (-7L, -3L, 7L))
      .toDF("alo", "ahi", "aid")
    val b = Seq((-30L, -20L, 101L), (-5L, 35L, 102L), (6L, 6L, 103L),
      (28L, 60L, 104L), (41L, 44L, 105L), (90L, 80L, 106L))
      .toDF("blo", "bhi", "bid")
    for (w <- Seq(1L, 4L, 64L)) {
      val banded = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", w)
        .select(col("aid"), col("bid")).collect().map(_.toString).sorted.toSeq
      val naive = a.crossJoin(b)
        .filter(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
        .select(col("aid"), col("bid")).collect().map(_.toString).sorted.toSeq
      assert(banded == naive && banded.nonEmpty,
        s"w=$w: extra=${banded.diff(naive)} missing=${naive.diff(banded)}")
      // duplicate check is implicit in the sorted-seq equality: the naive
      // cross join emits each qualifying pair exactly once
    }
  }

  test("pointInIntervalFullOuter == naive FULL OUTER theta join (nulls, empty ranges, duplicate rows)") {
    import spark.implicits._
    // unmatched points (p=99), unmatched ranges ([200,210] — no point),
    // DUPLICATE identical unmatched ranges (multiplicity must survive the
    // group/re-expand recovery), empty range (hi < lo — matches nothing,
    // must surface null-extended), null point and null-bounded range, and
    // ranges spanning several width-8 bands
    val pts = Seq(Some(5L) -> 1L, Some(12L) -> 2L, Some(12L) -> 3L,
      Some(99L) -> 4L, (None: Option[Long]) -> 5L)
      .map { case (v, i) => (v, i) }.toDF("pv", "pid")
    val rng = Seq((Some(0L), Some(20L), 101L), (Some(10L), Some(12L), 102L),
      (Some(200L), Some(210L), 103L), (Some(200L), Some(210L), 103L),
      (Some(50L), Some(40L), 104L), (None: Option[Long], Some(7L), 105L))
      .toDF("lo", "hi", "rid")
    for (w <- Seq(1L, 8L, 1024L)) {
      val got = RangeJoin
        .pointInIntervalFullOuter(pts, rng, "pv", "lo", "hi", w)
        .collect().map(_.toString).sorted.toSeq
      val naive = pts.join(rng,
          col("pv") >= col("lo") && col("pv") <= col("hi"), "full_outer")
        .collect().map(_.toString).sorted.toSeq
      assert(got == naive && got.nonEmpty,
        s"w=$w: extra=${got.diff(naive).take(5)} missing=${naive.diff(got).take(5)}")
    }
  }

  test("intervalOverlapSemi/Anti == naive EXISTS / NOT EXISTS (duplicate left rows keep multiplicity)") {
    import spark.implicits._
    // duplicate left rows (multiplicity must survive the distinct-tuple
    // lift), inverted intervals on both sides, a left row matching MANY
    // rights (must emit once per input row, not per match), and a
    // null-bounded left row (matches nothing — semi drops, anti keeps)
    val a = Seq((Some(-20L), Some(10L), 1L), (Some(0L), Some(30L), 2L),
      (Some(0L), Some(30L), 2L), (Some(50L), Some(45L), 6L),
      (Some(70L), Some(75L), 8L), (None: Option[Long], Some(5L), 9L))
      .toDF("alo", "ahi", "aid")
    val b = Seq((-30L, -20L, 101L), (-5L, 35L, 102L), (6L, 6L, 103L),
      (28L, 60L, 104L), (90L, 80L, 106L)).toDF("blo", "bhi", "bid")
    val pred = col("alo") <= col("bhi") && col("blo") <= col("ahi")
    for (w <- Seq(1L, 8L, 64L)) {
      val semi = RangeJoin
        .intervalOverlapSemi(a, b, "alo", "ahi", "blo", "bhi", w)
        .collect().map(_.toString).sorted.toSeq
      val anti = RangeJoin
        .intervalOverlapAnti(a, b, "alo", "ahi", "blo", "bhi", w)
        .collect().map(_.toString).sorted.toSeq
      val naiveSemi = a.join(b, pred, "left_semi")
        .collect().map(_.toString).sorted.toSeq
      val naiveAnti = a.join(b, pred, "left_anti")
        .collect().map(_.toString).sorted.toSeq
      assert(semi == naiveSemi && semi.nonEmpty,
        s"w=$w semi: extra=${semi.diff(naiveSemi)} missing=${naiveSemi.diff(semi)}")
      assert(anti == naiveAnti && anti.nonEmpty,
        s"w=$w anti: extra=${anti.diff(naiveAnti)} missing=${naiveAnti.diff(anti)}")
    }
  }

  // r14 (ADVICE high): band ids must be exact ABOVE 2^53 — the old
  // double-division bandOf misrouted ~6% of huge keys (nanosecond epochs,
  // scaled 18-digit decimals), silently dropping qualifying pairs the
  // residual could never recover.
  test("bandJoin and pointInInterval exact on keys above 2^53 (integer-exact band ids)") {
    import spark.implicits._
    // all-positive-huge + small-negative keys: cross-sign HUGE pairs would
    // overflow the naive baseline's Long subtract under ANSI (the rewrite
    // itself never subtracts unbanded pairs)
    val base = 4611686018427387904L // 2^62
    val ks = Seq(base, base + 1, base + 999, base + 1000, base + 1500,
      base + 2500, base + 3001, -1000000L, -999500L, 9007199254740993L)
    val a = ks.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("av", "aid")
    val b = ks.zipWithIndex.map { case (v, i) => (v + 400, i + 100L) }.toDF("bv", "bid")
    val banded = RangeJoin.bandJoin(a, b, "av", "bv", 1000L)
      .select(col("aid"), col("bid")).collect().map(_.toString).sorted.toSeq
    val naive = a.crossJoin(b).filter(abs(col("av") - col("bv")) <= 1000L)
      .select(col("aid"), col("bid")).collect().map(_.toString).sorted.toSeq
    assert(banded == naive && banded.nonEmpty,
      s"huge-key bandJoin: extra=${banded.diff(naive).take(5)} missing=${naive.diff(banded).take(5)}")
    val pts = ks.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("pv", "pid")
    val rng = ks.zipWithIndex.map { case (v, i) => (v - 300, v + 700, i + 100L) }
      .toDF("lo", "hi", "rid")
    val bandedP = RangeJoin.pointInInterval(pts, rng, "pv", "lo", "hi", 512L)
      .select(col("pid"), col("rid")).collect().map(_.toString).sorted.toSeq
    val naiveP = pts.crossJoin(rng)
      .filter(col("pv") >= col("lo") && col("pv") <= col("hi"))
      .select(col("pid"), col("rid")).collect().map(_.toString).sorted.toSeq
    assert(bandedP == naiveP && bandedP.nonEmpty,
      s"huge-key pointInInterval: extra=${bandedP.diff(naiveP).take(5)} missing=${naiveP.diff(bandedP).take(5)}")
  }

  // r15 (ADVICE r14 low): the DataFrame bandOf now carries the rule's
  // remainder-adjusted IntegralDivide form — keys within w of Long.MinValue
  // used to wrap through `k - pmod(k, w)` and silently drop matching pairs.
  test("bandJoin and pointInInterval exact at the Long.MinValue domain edge") {
    import spark.implicits._
    val mn = Long.MinValue
    val ks = Seq(mn, mn + 1, mn + 99, mn + 100, mn + 150, mn + 999,
      mn + 1000, mn + 2500, -1000L, 0L, 1000L)
    val a = ks.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("av", "aid")
    val b = ks.zipWithIndex.map { case (v, i) => (v + 70, i + 100L) }.toDF("bv", "bid")
    val banded = RangeJoin.bandJoin(a, b, "av", "bv", 100L)
      .select(col("aid"), col("bid")).collect().map(_.toString).sorted.toSeq
    // decimal(38,0) baseline subtract: exact at the Long extremes where a
    // Long subtract would throw under ANSI (the cross join compares EVERY
    // pair, including the far-apart ones the banded form never touches)
    val naive = a.crossJoin(b).filter(abs(col("av").cast("decimal(38,0)") -
        col("bv").cast("decimal(38,0)")) <= 100L)
      .select(col("aid"), col("bid")).collect().map(_.toString).sorted.toSeq
    assert(banded == naive && banded.nonEmpty,
      s"MinValue-edge bandJoin: extra=${banded.diff(naive).take(5)} missing=${naive.diff(banded).take(5)}")
    val pts = ks.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("pv", "pid")
    val rng = ks.zipWithIndex.map { case (v, i) =>
      (v, v + 130, i + 100L) }.toDF("lo", "hi", "rid")
    val bandedP = RangeJoin.pointInInterval(pts, rng, "pv", "lo", "hi", 64L)
      .select(col("pid"), col("rid")).collect().map(_.toString).sorted.toSeq
    val naiveP = pts.crossJoin(rng)
      .filter(col("pv") >= col("lo") && col("pv") <= col("hi"))
      .select(col("pid"), col("rid")).collect().map(_.toString).sorted.toSeq
    assert(bandedP == naiveP && bandedP.nonEmpty,
      s"MinValue-edge pointInInterval: extra=${bandedP.diff(naiveP).take(5)} missing=${naiveP.diff(bandedP).take(5)}")
  }

  // r15: keyed variants — pairs must ALSO agree on the key columns; the
  // shuffle co-partitions on (key, band) so candidates are bounded by
  // per-key band occupancy. Null keys match nothing, a key with no
  // partner group behaves as fully-unmatched.
  test("keyed overlap inner/semi/anti/fullOuter and keyed pointInInterval == naive keyed joins") {
    import spark.implicits._
    val a = Seq((Some("u1"), 0L, 30L, 1L), (Some("u1"), 0L, 30L, 1L),
      (Some("u2"), 0L, 30L, 2L), (Some("u3"), 5L, 8L, 3L),
      ((None: Option[String]), 0L, 30L, 4L), (Some("u1"), 100L, 130L, 5L))
      .toDF("au", "alo", "ahi", "aid")
    val b = Seq((Some("u1"), 20L, 60L, 101L), (Some("u1"), 25L, 26L, 102L),
      (Some("u2"), 40L, 70L, 103L), ((None: Option[String]), 0L, 99L, 104L),
      (Some("u4"), 0L, 99L, 105L))
      .toDF("bu", "blo", "bhi", "bid")
    val pred = col("au") === col("bu") &&
      col("alo") <= col("bhi") && col("blo") <= col("ahi")
    for (w <- Seq(1L, 16L, 1024L)) {
      def strs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      val inner = strs(RangeJoin.intervalOverlap(a, b, Seq("au"), Seq("bu"),
        "alo", "ahi", "blo", "bhi", w))
      assert(inner == strs(a.join(b, pred)) && inner.nonEmpty, s"w=$w inner")
      val semi = strs(RangeJoin.intervalOverlapSemi(a, b, Seq("au"), Seq("bu"),
        "alo", "ahi", "blo", "bhi", w))
      assert(semi == strs(a.join(b, pred, "left_semi")) && semi.nonEmpty,
        s"w=$w semi")
      val anti = strs(RangeJoin.intervalOverlapAnti(a, b, Seq("au"), Seq("bu"),
        "alo", "ahi", "blo", "bhi", w))
      assert(anti == strs(a.join(b, pred, "left_anti")) && anti.nonEmpty,
        s"w=$w anti")
      val fo = strs(RangeJoin.intervalOverlapFullOuter(a, b, Seq("au"),
        Seq("bu"), "alo", "ahi", "blo", "bhi", w))
      assert(fo == strs(a.join(b, pred, "full_outer")) && fo.nonEmpty,
        s"w=$w fullOuter")
    }
    // keyed pointInInterval: each point inside its OWN key's ranges
    val pts = Seq((Some("u1"), 25L, 1L), (Some("u1"), 90L, 2L),
      (Some("u2"), 50L, 3L), ((None: Option[String]), 25L, 4L))
      .toDF("pu", "pv", "pid")
    val rngKeyed = b.select(col("bu"), col("blo"), col("bhi"), col("bid"))
    val gotP = RangeJoin.pointInInterval(pts, rngKeyed, Seq("pu"), Seq("bu"),
        "pv", "blo", "bhi", 16L)
      .collect().map(_.toString).sorted.toSeq
    val naiveP = pts.join(rngKeyed, col("pu") === col("bu") &&
        col("pv") >= col("blo") && col("pv") <= col("bhi"))
      .collect().map(_.toString).sorted.toSeq
    assert(gotP == naiveP && gotP.nonEmpty,
      s"keyed pointInInterval: extra=${gotP.diff(naiveP)} missing=${naiveP.diff(gotP)}")
    // plan gate: the keyed join partitions on (key, band) — the SMJ's equi
    // keys must include BOTH, and no nested loop anywhere
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = RangeJoin.intervalOverlap(a, b, Seq("au"), Seq("bu"),
        "alo", "ahi", "blo", "bhi", 16L).queryExecution.executedPlan
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty &&
        plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"keyed overlap fell back to a quadratic join:\n$plan")
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty && smj.forall(_.leftKeys.size >= 2),
        s"keyed overlap SMJ not keyed on (key, band):\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  // r15 (VERDICT r14 item 6): interval-overlap FULL OUTER by banded
  // composition — matched pairs + unmatched-left + unmatched-right, each
  // leg an equi-join on the band id.
  test("intervalOverlapFullOuter == naive FULL OUTER overlap join (nulls, inverted, duplicates)") {
    import spark.implicits._
    // duplicates on both sides (multiplicity through the anti lifts),
    // inverted intervals (overlap predicate can still match), null bounds
    // (match nothing -> unmatched), rows with no partner on either side
    val a = Seq((Some(-20L), Some(10L), 1L), (Some(0L), Some(30L), 2L),
      (Some(0L), Some(30L), 2L), (Some(50L), Some(45L), 6L),
      (Some(200L), Some(210L), 7L), (Some(200L), Some(210L), 7L),
      (None: Option[Long], Some(5L), 9L))
      .toDF("alo", "ahi", "aid")
    val b = Seq((Some(-30L), Some(-20L), 101L), (Some(-5L), Some(35L), 102L),
      (Some(28L), Some(60L), 104L), (Some(90L), Some(80L), 106L),
      (Some(90L), Some(80L), 106L), (Some(300L), (None: Option[Long]), 107L))
      .toDF("blo", "bhi", "bid")
    val pred = col("alo") <= col("bhi") && col("blo") <= col("ahi")
    for (w <- Seq(1L, 8L, 64L)) {
      val got = RangeJoin
        .intervalOverlapFullOuter(a, b, "alo", "ahi", "blo", "bhi", w)
        .collect().map(_.toString).sorted.toSeq
      val naive = a.join(b, pred, "full_outer")
        .collect().map(_.toString).sorted.toSeq
      assert(got == naive && got.nonEmpty,
        s"w=$w: extra=${got.diff(naive).take(5)} missing=${naive.diff(got).take(5)}")
    }
  }

  // r15 (VERDICT r14 item 1): native DATE keys on the DataFrame layer —
  // the operator bands on days internally (TimeKeys), so the caller passes
  // date columns directly instead of hand-converting through datediff.
  test("pointInInterval and bandJoin on native DATE keys == manual day conversion") {
    // the corpus stores these as timestamps — take true DATE columns (the
    // operator's family check rightly refuses DATE bounds mixed with a
    // TIMESTAMP point)
    val pts = Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 16 === 0)
      .select(to_date(col("l_shipdate")).as("ship_d"),
        col("l_orderkey"), col("l_linenumber"))
    val rng = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 64 === 0)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_start"),
        date_add(to_date(col("o_orderdate")), 13).as("o_end"))
    val gotNative = RangeJoin
      .pointInInterval(pts, rng, "ship_d", "o_start", "o_end", 16L)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"))
      .collect().map(_.toString).sorted.toSeq
    val epoch = lit("1992-01-01")
    val ptsD = pts.select(datediff(col("ship_d"), epoch).as("sd"),
      col("l_orderkey"), col("l_linenumber"))
    val rngD = rng.select(col("o_orderkey"),
      datediff(col("o_start"), epoch).as("lo"),
      datediff(col("o_end"), epoch).as("hi"))
    val gotManual = RangeJoin.pointInInterval(ptsD, rngD, "sd", "lo", "hi", 16L)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"))
      .collect().map(_.toString).sorted.toSeq
    assert(gotNative == gotManual && gotNative.nonEmpty,
      s"native-date path diverges: extra=${gotNative.diff(gotManual).take(3)} " +
        s"missing=${gotManual.diff(gotNative).take(3)}")
    // ε-band on dates: orders within 3 days of each other across two shards
    val a = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 128 === 0)
      .select(col("o_orderkey").as("a_id"), to_date(col("o_orderdate")).as("a_d"))
    val b = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 128 === 1)
      .select(col("o_orderkey").as("b_id"), to_date(col("o_orderdate")).as("b_d"))
    val gotBand = RangeJoin.bandJoin(a, b, "a_d", "b_d", 3L)
      .select(col("a_id"), col("b_id")).collect().map(_.toString).sorted.toSeq
    val naiveBand = a.crossJoin(b)
      .filter(abs(datediff(col("a_d"), col("b_d"))) <= 3)
      .select(col("a_id"), col("b_id")).collect().map(_.toString).sorted.toSeq
    assert(gotBand == naiveBand && gotBand.nonEmpty,
      s"date bandJoin diverges: extra=${gotBand.diff(naiveBand).take(3)} " +
        s"missing=${naiveBand.diff(gotBand).take(3)}")
  }

  test("banded joins plan as equi-joins: no BNLJ / cartesian, join keyed on the band (plan gate)") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q100 = SparkEntry.queries("q100")(spark, dir)
      val q101 = SparkEntry.queries("q101")(spark, dir)
      for ((name, df) <- Seq("q100" -> q100, "q101" -> q101)) {
        val plan = df.queryExecution.executedPlan
        assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty &&
          plan.collect { case c: CartesianProductExec => c }.isEmpty,
          s"$name fell back to a quadratic join:\n$plan")
        val smj = plan.collect { case j: SortMergeJoinExec => j }
        assert(smj.nonEmpty, s"$name: no sort-merge join in\n$plan")
        assert(smj.forall(_.leftKeys.nonEmpty), s"$name: SMJ without equi keys")
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
