package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsofJoin vs brute force: for each direction the matched quote must be
  * the one the naive per-probe argmin picks (backward: max qt <= pt;
  * forward: min qt >= pt; nearest: min |qt − pt|, tie to backward), with
  * LEFT semantics (every probe survives), tolerance nulling, and null
  * times matching nothing. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // probes: equal-instant probe (t=20 with a quote at 20 — inclusive both
  // directions), before-all (t=-50), after-all (t=99), exact mid-tie
  // (t=25 between quotes 20 and 30 — nearest must take backward), null t
  private val probes = Seq(
    (1L, Some(-50L), 100L), (1L, Some(5L), 101L),
    (1L, Some(20L), 102L), (1L, Some(25L), 103L),
    (1L, Some(99L), 104L), (1L, (None: Option[Long]), 105L),
    (2L, Some(7L), 200L))
    .toDF("k", "pt", "pid")
  private val quotes = Seq(
    (1L, 0L, 10.0), (1L, 20L, 20.0), (1L, 30L, 30.0), (2L, 50L, 50.0))
    .toDF("k", "qt", "px")

  private def naive(direction: String, tol: Option[Long]): Seq[String] = {
    val cand = probes.join(quotes, Seq("k"), "left")
    val dirOk = direction match {
      case "backward" => col("qt") <= col("pt")
      case "forward" => col("qt") >= col("pt")
      case "nearest" => lit(true)
    }
    val tolOk = tol.map(t => abs(col("qt") - col("pt")) <= t).getOrElse(lit(true))
    val ranked = cand
      .withColumn("__ok", col("pt").isNotNull && col("qt").isNotNull && dirOk && tolOk)
      .withColumn("__d", when(col("__ok"),
        struct(abs(col("qt") - col("pt")).as("a"), col("qt").as("q"))))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("__d").asc_nulls_last, col("qt").asc_nulls_last)))
      .filter(col("__rn") === 1)
    ranked.select(col("k"), col("pt"), col("pid"),
        when(col("__ok"), col("qt")).as("qt"),
        when(col("__ok"), col("px")).as("px"))
      .collect().map(_.toString).sorted.toSeq
  }

  for (dir <- Seq("backward", "forward", "nearest");
       tol <- Seq(None, Some(6L)))
    test(s"asof $dir tolerance=$tol == naive argmin") {
      val got = AsofJoin.asof(probes, quotes, Seq("k"), "pt", "qt", dir, tol)
        .select(col("k"), col("pt"), col("pid"), col("qt"), col("px"))
        .collect().map(_.toString).sorted.toSeq
      val want = naive(dir, tol)
      assert(got == want && got.nonEmpty,
        s"extra=${got.diff(want)} missing=${want.diff(got)}")
    }

  test("asof is one shuffle for backward/forward (window exchange only)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (dir <- Seq("backward", "forward")) {
        val ex = AsofJoin.asof(probes, quotes, Seq("k"), "pt", "qt", dir, None)
          .queryExecution.executedPlan
          .collect { case e: ShuffleExchangeExec => e }
        assert(ex.size == 1, s"$dir: expected 1 exchange, got ${ex.size}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
