package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BandedIntervalJoinRule

/** The optimizer-rule form of the banded range join: SQL BETWEEN joins must
  * plan as equi-joins under the rule, return exactly the rule-off results
  * (the rewrite is exact for any band width — bands route, the residual
  * decides), and leave every non-matching join shape untouched. */
class RangeJoinRuleSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withRule[T](body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(BandedIntervalJoinRule))
      spark.experimental.extraOptimizations ++= Seq(BandedIntervalJoinRule)
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == BandedIntervalJoinRule)
  }

  private val betweenSql =
    """SELECT o.o_orderkey AS promo_id, l.l_orderkey, l.l_linenumber
      |FROM lineitem l JOIN orders o
      |  ON datediff(l.l_shipdate, DATE '1992-01-01')
      |       BETWEEN datediff(o.o_orderdate, DATE '1992-01-01')
      |           AND datediff(o.o_orderdate, DATE '1992-01-01') + 13
      |WHERE o.o_orderkey % 32 = 0
      |ORDER BY promo_id, l_orderkey, l_linenumber""".stripMargin

  test("BETWEEN join rewrites to a banded equi-join: BNLJ-free plan, identical rows") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
    Tables.registerAll(spark, dir)
    val off = spark.sql(betweenSql).collect().map(_.toString).toSeq
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withRule {
      val df = spark.sql(betweenSql)
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty &&
        plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"rule did not remove the nested loop:\n$plan")
      val smj = plan.collect { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty && smj.forall(_.leftKeys.nonEmpty),
        s"no keyed sort-merge join under the rule:\n$plan")
      val on = df.collect().map(_.toString).toSeq
      assert(on.nonEmpty && on == off,
        s"rule changed results: ${on.diff(off).take(3)} / ${off.diff(on).take(3)}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("rule is exact on nulls, negatives, empty and point ranges (vs rule-off), any width") {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Long)]((-8L, 100L), (-4L, 101L), (0L, 102L),
      (3L, 103L), (16L, 104L), (21L, 105L), (null, 106L))
      .toDF("pv", "pid").createOrReplaceTempView("pts")
    Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (-9L, -4L, 0L), (-2L, 3L, 1L), (0L, 0L, 2L), (3L, 21L, 3L),
      (5L, 2L, 4L), (null, 7L, 5L), (3L, null, 6L))
      .toDF("lo", "hi", "rid").createOrReplaceTempView("rngs")
    val q = """SELECT pid, rid FROM pts JOIN rngs
              |ON pv >= lo AND pv <= hi ORDER BY pid, rid""".stripMargin
    val off = spark.sql(q).collect().map(_.toString).toSeq
    for (w <- Seq("1", "4", "1024")) {
      spark.conf.set("graft.rangeJoin.bandWidth", w)
      try withRule {
        val on = spark.sql(q).collect().map(_.toString).toSeq
        assert(on == off && on.nonEmpty, s"w=$w: $on vs $off")
      } finally spark.conf.unset("graft.rangeJoin.bandWidth")
    }
  }

  test("abs(a-b) <= eps spelling rewrites and stays exact (vs rule-off)") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    Tables.registerAll(spark, dir)
    val q = """SELECT c.c_custkey, s.s_suppkey
              |FROM customer c JOIN supplier s
              |  ON abs(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
              |       - CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)) <= 2500
              |ORDER BY c_custkey, s_suppkey""".stripMargin
    val off = spark.sql(q).collect().map(_.toString).toSeq
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withRule {
      val df = spark.sql(q)
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_pband"),
        "abs form did not rewrite")
      assert(df.queryExecution.executedPlan
        .collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
      val on = df.collect().map(_.toString).toSeq
      assert(on == off && on.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("rule leaves equi joins, hinted joins, and full-outer joins alone") {
    Tables.registerAll(spark, dir)
    withRule {
      // equi conjunct present -> hash join territory, no band columns
      val equi = spark.sql(
        """SELECT count(*) FROM lineitem l JOIN orders o
          |ON l.l_orderkey = o.o_orderkey
          | AND datediff(l.l_shipdate, DATE '1992-01-01')
          |     BETWEEN 0 AND 10000""".stripMargin)
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_pband"))
      // user hint -> untouched
      val hinted = spark.sql(
        """SELECT /*+ BROADCAST(o) */ count(*)
          |FROM lineitem l JOIN orders o
          |  ON datediff(l.l_shipdate, DATE '1992-01-01')
          |       BETWEEN datediff(o.o_orderdate, DATE '1992-01-01')
          |           AND datediff(o.o_orderdate, DATE '1992-01-01') + 13""".stripMargin)
      assert(!hinted.queryExecution.optimizedPlan.toString.contains("__graft_pband"))
      // FULL OUTER -> untouched (exploding either side would duplicate its
      // preserved unmatched rows)
      val full = spark.sql(
        """SELECT count(*) FROM lineitem l FULL OUTER JOIN orders o
          |  ON datediff(l.l_shipdate, DATE '1992-01-01')
          |       BETWEEN datediff(o.o_orderdate, DATE '1992-01-01')
          |           AND datediff(o.o_orderdate, DATE '1992-01-01') + 13""".stripMargin)
      assert(!full.queryExecution.optimizedPlan.toString.contains("__graft_pband"))
      // and the positive control: the plain inner BETWEEN join DOES rewrite
      val inner = spark.sql(betweenSql)
      assert(inner.queryExecution.optimizedPlan.toString.contains("__graft_pband"))
    }
  }

  // r15 (ADVICE r14 low): a one-sided literal equality (`l.flag = 'Y'`
  // under LEFT OUTER, where the conjunct cannot push below the join) is
  // NOT an equi conjunct — Spark cannot hash-join on it, so declining left
  // the nested loop in place. The rule now requires both equality sides to
  // carry references before counting them as an equi key.
  test("one-sided literal equality no longer masks the rewrite (LEFT OUTER, vs rule-off)") {
    Tables.registerAll(spark, dir)
    val q =
      """SELECT coalesce(o.o_orderkey, -1) AS pid, count(*) AS n
        |FROM lineitem l LEFT JOIN orders o
        |  ON l.l_returnflag = 'N'
        |     AND l.l_shipdate BETWEEN o.o_orderdate
        |                          AND o.o_orderdate + INTERVAL '13' DAY
        |     AND o.o_orderkey % 256 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin
    val off = spark.sql(q).collect().map(_.toString).toSeq
    withRule {
      val df = spark.sql(q)
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_pband"),
        s"literal-equality LEFT OUTER did not rewrite:\n${df.queryExecution.optimizedPlan}")
      val on = df.collect().map(_.toString).toSeq
      assert(on.nonEmpty && on == off,
        s"changed results: extra=${on.diff(off).take(3)} missing=${off.diff(on).take(3)}")
      // the control: a genuinely two-sided equality still declines
      val equi = spark.sql(
        """SELECT count(*) FROM lineitem l JOIN orders o
          |ON l.l_orderkey = o.o_orderkey
          | AND l.l_shipdate BETWEEN o.o_orderdate
          |                      AND o.o_orderdate + INTERVAL '13' DAY""".stripMargin)
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_pband"))
    }
  }

  // r14: the join-type extension — semi / anti / left-outer / right-outer /
  // existence containment joins rewrite (only the ranges side explodes;
  // semi/anti/existence are blind to right multiplicity, outer preserves the
  // unexploded side), each proven equal to its rule-off nested loop.
  test("semi / anti / outer / existence BETWEEN joins rewrite and stay exact (vs rule-off)") {
    Tables.registerAll(spark, dir)
    val shapes = Seq(
      "semi" ->
        """SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
          |LEFT SEMI JOIN orders o
          |  ON l.l_shipdate BETWEEN o.o_orderdate
          |                      AND o.o_orderdate + INTERVAL '13' DAY
          |     AND o.o_orderkey % 64 = 0
          |ORDER BY 1, 2""".stripMargin,
      "anti" ->
        """SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
          |LEFT ANTI JOIN orders o
          |  ON l.l_shipdate BETWEEN o.o_orderdate
          |                      AND o.o_orderdate + INTERVAL '13' DAY
          |     AND o.o_orderkey % 64 = 0
          |ORDER BY 1, 2""".stripMargin,
      "left_outer" ->
        """SELECT coalesce(o.o_orderkey, -1) AS pid, count(*) AS n
          |FROM lineitem l LEFT JOIN orders o
          |  ON l.l_shipdate BETWEEN o.o_orderdate
          |                      AND o.o_orderdate + INTERVAL '13' DAY
          |     AND o.o_orderkey % 256 = 0
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "right_outer" ->
        """SELECT coalesce(o.o_orderkey, -1) AS pid, count(*) AS n
          |FROM orders o RIGHT JOIN lineitem l
          |  ON l.l_shipdate BETWEEN o.o_orderdate
          |                      AND o.o_orderdate + INTERVAL '13' DAY
          |     AND o.o_orderkey % 256 = 0
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "existence" ->
        """SELECT l.l_orderkey, l.l_linenumber,
          |  EXISTS(SELECT 1 FROM orders o WHERE o.o_orderkey % 64 = 0
          |    AND l.l_shipdate BETWEEN o.o_orderdate
          |                         AND o.o_orderdate + INTERVAL '13' DAY) AS hit
          |FROM lineitem l
          |WHERE l.l_orderkey % 8 = 0 OR EXISTS(
          |  SELECT 1 FROM orders o WHERE o.o_orderkey % 64 = 0
          |    AND l.l_shipdate BETWEEN o.o_orderdate
          |                         AND o.o_orderdate + INTERVAL '13' DAY)
          |ORDER BY 1, 2""".stripMargin)
    for ((name, q) <- shapes) {
      val off = spark.sql(q).collect().map(_.toString).toSeq
      withRule {
        val df = spark.sql(q)
        assert(df.queryExecution.optimizedPlan.toString.contains("__graft_pband"),
          s"$name did not rewrite:\n${df.queryExecution.optimizedPlan}")
        val on = df.collect().map(_.toString).toSeq
        assert(on.nonEmpty && on == off,
          s"$name changed results: extra=${on.diff(off).take(3)} missing=${off.diff(on).take(3)}")
      }
    }
  }

  // r14: native DATE and TIMESTAMP/NTZ keys band directly (UnixDate /
  // TimestampMicros) and the `hi = lo + foldable` BETWEEN shape derives its
  // width at plan time — no datediff pre-conversion, no bandWidth conf.
  test("native date/timestamp BETWEEN keys rewrite with derived width, no conf (vs rule-off)") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    Tables.registerAll(spark, dir)
    assert(spark.conf.getOption("graft.rangeJoin.bandWidth").isEmpty)
    val shapes = Seq(
      // testdata dates are TIMESTAMP_NTZ; ANSI day interval on the bound
      "ntz_interval" ->
        """SELECT o.o_orderkey AS pid, count(*) AS n
          |FROM lineitem l JOIN orders o
          |  ON l.l_shipdate BETWEEN o.o_orderdate
          |                      AND o.o_orderdate + INTERVAL '13' DAY
          |WHERE o.o_orderkey % 64 = 0
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      // true DATE keys via cast, date_add spelling
      "date_date_add" ->
        """SELECT o.o_orderkey AS pid, count(*) AS n
          |FROM (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS sd FROM lineitem) l
          |JOIN (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders) o
          |  ON l.sd BETWEEN o.od AND date_add(o.od, 13)
          |WHERE o.o_orderkey % 64 = 0
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      // hour-scale timestamp window on events
      "ts_hours" ->
        """SELECT a.event_id AS aid, b.event_id AS bid
          |FROM events a JOIN events b
          |  ON a.ts BETWEEN b.ts AND b.ts + INTERVAL '2' HOUR
          |WHERE a.user_id % 16 = 0 AND b.user_id % 16 = 1
          |ORDER BY 1, 2""".stripMargin)
    for ((name, q) <- shapes) {
      val off = spark.sql(q).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try withRule {
        val df = spark.sql(q)
        val opt = df.queryExecution.optimizedPlan.toString
        assert(opt.contains("__graft_pband"), s"$name did not rewrite:\n$opt")
        // width DERIVED from the foldable offset, not the 1024 fallback
        assert(!opt.contains("div 1024"), s"$name fell back to the default width:\n$opt")
        assert(df.queryExecution.executedPlan
          .collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
        val on = df.collect().map(_.toString).toSeq
        assert(on.nonEmpty && on == off,
          s"$name changed results: extra=${on.diff(off).take(3)} missing=${off.diff(on).take(3)}")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
  }

  // r14: the interval-OVERLAP fallback — both sides explode, each pair
  // emitted only at its canonical band, so SQL overlap joins (the
  // temporal shape) plan as shuffle equi-joins and match the nested loop
  // pair-for-pair.
  test("SQL interval-overlap join rewrites (both sides banded) and stays exact (vs rule-off)") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    Tables.registerAll(spark, dir)
    val shapes = Seq(
      // timestamp intervals with foldable lengths (width derives from the
      // shorter, 13 d)
      "orders_windows" ->
        """SELECT a.o_orderkey AS a_id, b.o_orderkey AS b_id
          |FROM orders a JOIN orders b
          |  ON a.o_orderdate <= b.o_orderdate + INTERVAL '20' DAY
          | AND b.o_orderdate <= a.o_orderdate + INTERVAL '13' DAY
          |WHERE a.o_orderkey % 32 = 0 AND b.o_orderkey % 32 = 7
          |ORDER BY 1, 2""".stripMargin,
      // integral epoch-day intervals via datediff, column bounds: width
      // falls back to the integral default (1024) — exactness must hold
      // at ANY width, including a bad one
      "epoch_days" ->
        """WITH wa AS (SELECT o_orderkey AS a_id,
          |    datediff(o_orderdate, DATE '1992-01-01') AS a_lo,
          |    datediff(o_orderdate, DATE '1992-01-01') + 13 AS a_hi
          |  FROM orders WHERE o_orderkey % 32 = 0),
          |wb AS (SELECT o_orderkey AS b_id,
          |    datediff(o_orderdate, DATE '1992-01-01') AS b_lo,
          |    datediff(o_orderdate, DATE '1992-01-01') + 20 AS b_hi
          |  FROM orders WHERE o_orderkey % 32 = 7)
          |SELECT a_id, b_id FROM wa JOIN wb
          |  ON a_lo <= b_hi AND b_lo <= a_hi
          |ORDER BY 1, 2""".stripMargin)
    for ((name, q) <- shapes) {
      val off = spark.sql(q).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try withRule {
        val df = spark.sql(q)
        val opt = df.queryExecution.optimizedPlan.toString
        assert(opt.contains("__graft_lband") && opt.contains("__graft_rband"),
          s"$name did not rewrite as overlap:\n$opt")
        assert(df.queryExecution.executedPlan
          .collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
        val on = df.collect().map(_.toString).toSeq
        assert(on.nonEmpty && on == off,
          s"$name: extra=${on.diff(off).take(3)} missing=${off.diff(on).take(3)}")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    // a LEFT OUTER overlap must NOT rewrite (both sides would explode the
    // preserved side's multiplicity)
    withRule {
      val outer = spark.sql(
        """SELECT count(*) FROM orders a LEFT JOIN orders b
          |  ON a.o_orderdate <= b.o_orderdate + INTERVAL '20' DAY
          | AND b.o_orderdate <= a.o_orderdate + INTERVAL '13' DAY
          |    AND b.o_orderkey % 128 = 7""".stripMargin)
      assert(!outer.queryExecution.optimizedPlan.toString.contains("__graft_lband"))
    }
  }

  // r14: EXISTS / NOT EXISTS overlap — the semi/anti decontamination
  // spelling. The rewrite lifts preserved-side multiplicity to distinct
  // tuples (group-with-count -> band-exploded ExistenceJoin -> re-expand),
  // so duplicate left rows must keep their multiplicity and the plan must
  // be BNLJ-free.
  test("SQL EXISTS / NOT EXISTS overlap joins rewrite (existence lift) and stay exact") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    Tables.registerAll(spark, dir)
    // sess deliberately NON-distinct: o_orderkey % 16 collapses to
    // duplicate (lo, hi) tuples whose multiplicity the lift must restore
    val shapes = Seq(
      "exists" ->
        """WITH sess AS (SELECT o_orderkey % 16 AS sid,
          |    datediff(o_orderdate, DATE '1992-01-01') AS s_lo,
          |    datediff(o_orderdate, DATE '1992-01-01') + 13 AS s_hi
          |  FROM orders WHERE o_orderkey % 64 = 0),
          |blk AS (SELECT datediff(o_orderdate, DATE '1992-01-01') AS b_lo,
          |    datediff(o_orderdate, DATE '1992-01-01') + 20 AS b_hi
          |  FROM orders WHERE o_orderkey % 128 = 7)
          |SELECT sid, s_lo FROM sess s
          |WHERE EXISTS (SELECT 1 FROM blk b
          |              WHERE s.s_lo <= b.b_hi AND b.b_lo <= s.s_hi)
          |ORDER BY sid, s_lo""".stripMargin,
      "not_exists" ->
        """WITH sess AS (SELECT o_orderkey % 16 AS sid,
          |    datediff(o_orderdate, DATE '1992-01-01') AS s_lo,
          |    datediff(o_orderdate, DATE '1992-01-01') + 13 AS s_hi
          |  FROM orders WHERE o_orderkey % 64 = 0),
          |blk AS (SELECT datediff(o_orderdate, DATE '1992-01-01') AS b_lo,
          |    datediff(o_orderdate, DATE '1992-01-01') + 20 AS b_hi
          |  FROM orders WHERE o_orderkey % 128 = 7)
          |SELECT sid, s_lo FROM sess s
          |WHERE NOT EXISTS (SELECT 1 FROM blk b
          |                  WHERE s.s_lo <= b.b_hi AND b.b_lo <= s.s_hi)
          |ORDER BY sid, s_lo""".stripMargin)
    for ((name, q) <- shapes) {
      val off = spark.sql(q).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try withRule {
        val df = spark.sql(q)
        val opt = df.queryExecution.optimizedPlan.toString
        assert(opt.contains("__graft_exists"),
          s"$name did not take the existence lift:\n$opt")
        assert(df.queryExecution.executedPlan
          .collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
          s"$name still BNLJ")
        val on = df.collect().map(_.toString).toSeq
        assert(on.nonEmpty && on == off,
          s"$name: extra=${on.diff(off).take(3)} missing=${off.diff(on).take(3)}")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
  }

  test("EXISTS under OR (ExistenceJoin) takes the lift: exists bit exact, plan BNLJ-free") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    Tables.registerAll(spark, dir)
    // EXISTS inside a disjunction cannot become a semi join — Catalyst
    // plans an ExistenceJoin whose boolean feeds the OR; the lift must
    // carry that bit per tuple (no filter) and re-expand duplicates
    val q =
      """WITH sess AS (SELECT o_orderkey % 16 AS sid,
        |    datediff(o_orderdate, DATE '1992-01-01') AS s_lo,
        |    datediff(o_orderdate, DATE '1992-01-01') + 13 AS s_hi
        |  FROM orders WHERE o_orderkey % 64 = 0),
        |blk AS (SELECT datediff(o_orderdate, DATE '1992-01-01') AS b_lo,
        |    datediff(o_orderdate, DATE '1992-01-01') + 20 AS b_hi
        |  FROM orders WHERE o_orderkey % 128 = 7)
        |SELECT sid, s_lo FROM sess s
        |WHERE sid = 3 OR EXISTS (SELECT 1 FROM blk b
        |    WHERE s.s_lo <= b.b_hi AND b.b_lo <= s.s_hi)
        |ORDER BY sid, s_lo""".stripMargin
    val off = spark.sql(q).collect().map(_.toString).toSeq
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withRule {
      val df = spark.sql(q)
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_exists"),
        s"existence shape did not lift:\n${df.queryExecution.optimizedPlan}")
      assert(df.queryExecution.executedPlan
        .collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
      val on = df.collect().map(_.toString).toSeq
      assert(on.nonEmpty && on == off,
        s"extra=${on.diff(off).take(3)} missing=${off.diff(on).take(3)}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("existence lift keeps null-bounded tuples under ANTI (outer band explode)") {
    import spark.implicits._
    // the r14 gate-caught regression: an inner (outer=false) left band
    // explode silently DROPPED a null-bounded tuple — correct for semi
    // (null predicate matches nothing), WRONG for anti (the nested loop
    // keeps that row) and for the existence bit. Duplicate null tuples
    // check the multiplicity path too.
    Seq[(java.lang.Long, java.lang.Long, Long)]((1L, 10L, 1L), (50L, 60L, 2L),
      (null, 5L, 9L), (null, 5L, 9L), (7L, null, 10L))
      .toDF("s_lo", "s_hi", "sid").createOrReplaceTempView("sess_n")
    Seq((8L, 12L), (55L, 58L)).toDF("b_lo", "b_hi")
      .createOrReplaceTempView("blk_n")
    val shapes = Seq(
      "anti" ->
        """SELECT sid FROM sess_n s
          |WHERE NOT EXISTS (SELECT 1 FROM blk_n b
          |    WHERE s.s_lo <= b.b_hi AND b.b_lo <= s.s_hi)
          |ORDER BY sid""".stripMargin,
      "exist_or" ->
        """SELECT sid FROM sess_n s
          |WHERE sid = 9 OR EXISTS (SELECT 1 FROM blk_n b
          |    WHERE s.s_lo <= b.b_hi AND b.b_lo <= s.s_hi)
          |ORDER BY sid""".stripMargin)
    for ((name, q) <- shapes) {
      val off = spark.sql(q).collect().map(_.toString).toSeq
      withRule {
        val df = spark.sql(q)
        assert(df.queryExecution.optimizedPlan.toString.contains("__graft_exists"),
          s"$name did not lift")
        val on = df.collect().map(_.toString).toSeq
        assert(on == off && on.nonEmpty,
          s"$name: extra=${on.diff(off)} missing=${off.diff(on)}")
      }
    }
  }

  test("existence lift declines when the preserved side carries a non-groupable (map) column") {
    import spark.implicits._
    withRule {
      Seq((1L, 10L, Map("k" -> 1)), (5L, 20L, Map("k" -> 2)))
        .toDF("s_lo", "s_hi", "props").createOrReplaceTempView("sess_m")
      Seq((8L, 12L)).toDF("b_lo", "b_hi").createOrReplaceTempView("blk_m")
      val df = spark.sql(
        """SELECT s_lo, s_hi, props FROM sess_m s
          |WHERE EXISTS (SELECT 1 FROM blk_m b
          |              WHERE s.s_lo <= b.b_hi AND b.b_lo <= s.s_hi)""".stripMargin)
      // must NOT rewrite (grouping a map column is an analysis error the
      // nested loop never had) — and must still answer correctly
      assert(!df.queryExecution.optimizedPlan.toString.contains("__graft_exists"))
      assert(df.collect().length == 2)
    }
  }

  // r14 (VERDICT "What's wrong" #1): the contract queries must leave NO
  // session state behind — q102's r13 spelling pinned bandWidth=16 globally,
  // which silently overrode the 2ε+1 derivation of every later ε-band join.
  test("contract queries leave no width conf behind; later eps joins derive 2ε+1") {
    Tables.registerAll(spark, dir)
    for (q <- Seq("q102", "q103", "q104", "q105"))
      SparkEntry.queries(q)(spark, dir).collect()
    assert(spark.conf.getOption("graft.rangeJoin.bandWidth").isEmpty,
      "a contract query leaked graft.rangeJoin.bandWidth into the session")
    // the contract queries attach the rule (install-on-demand parity with
    // GraftSession) — an ε-band join planned NOW must derive width 2ε+1
    val eps = spark.sql(
      """SELECT c.c_custkey, s.s_suppkey
        |FROM customer c JOIN supplier s
        |  ON abs(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
        |       - CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)) <= 2500
        |ORDER BY 1, 2""".stripMargin)
    val opt = eps.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_pband") && opt.contains("div 5001") &&
      !opt.contains("div 16"), s"eps join did not derive 2ε+1:\n$opt")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == BandedIntervalJoinRule)
  }

  // r14 (ADVICE medium): ε-band bounds are built in Long with plan-time
  // clamps — narrow-typed Int operands near the type extremes must not wrap
  // (the synthesized b ± ε would misroute rows the nested loop matched).
  test("eps form is exact on Int keys at the type extremes (widened, clamped bounds)") {
    import spark.implicits._
    // near-extreme SAME-SIDE clusters: the ADVICE r13 case — genuinely-
    // within-ε pairs whose synthesized narrow b ± ε used to wrap and drop.
    // (Pairs at OPPOSITE extremes that stock non-ANSI Spark matches only
    // via two's-complement wraparound of the Int subtract are the
    // documented out-of-scope corner — see the rule's scaladoc — so each
    // run stays on one side.)
    // companions stay on the same sign so the rule-off BASELINE's Int
    // subtract can't overflow under ANSI (which would make the naive side
    // throw rather than answer)
    val sides = Seq(
      "max" -> Seq(Int.MaxValue, Int.MaxValue - 1, Int.MaxValue - 99,
        Int.MaxValue - 150, 500, 1000, 1050),
      "min" -> Seq(Int.MinValue, Int.MinValue + 1, Int.MinValue + 99,
        Int.MinValue + 150, -500, -1000, -1050))
    for ((side, ints) <- sides) {
      ints.zipWithIndex.toDF("av", "aid").createOrReplaceTempView("ea")
      ints.zipWithIndex.map { case (v, i) => (v, i + 100) }
        .toDF("bv", "bid").createOrReplaceTempView("eb")
      val q = """SELECT aid, bid FROM ea JOIN eb ON abs(ea.av - eb.bv) <= 100
                |ORDER BY aid, bid""".stripMargin
      val off = spark.sql(q).collect().map(_.toString).toSeq
      withRule {
        val df = spark.sql(q)
        assert(df.queryExecution.optimizedPlan.toString.contains("__graft_pband"))
        val on = df.collect().map(_.toString).toSeq
        // equality implies the extreme-cluster pairs survived: Max/Max−1
        // etc. are within ε=100 in `off`, and they were exactly the rows
        // the unwidened r13 bounds dropped
        assert(on.nonEmpty && on == off,
          s"$side diverged: extra=${on.diff(off).take(5)} missing=${off.diff(on).take(5)}")
      }
    }
  }
}
