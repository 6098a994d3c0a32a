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

  test("rule leaves equi joins, hinted joins, and outer joins alone") {
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
      // outer join -> untouched (rule is inner-only)
      val outer = spark.sql(
        """SELECT count(*) FROM lineitem l LEFT JOIN orders o
          |  ON datediff(l.l_shipdate, DATE '1992-01-01')
          |       BETWEEN datediff(o.o_orderdate, DATE '1992-01-01')
          |           AND datediff(o.o_orderdate, DATE '1992-01-01') + 13""".stripMargin)
      assert(!outer.queryExecution.optimizedPlan.toString.contains("__graft_pband"))
      // and the positive control: the plain inner BETWEEN join DOES rewrite
      val inner = spark.sql(betweenSql)
      assert(inner.queryExecution.optimizedPlan.toString.contains("__graft_pband"))
    }
  }
}
