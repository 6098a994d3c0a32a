package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized as-of join — every probe row matched to at most ONE quote
  * row of the same key: the latest at-or-before (`backward`), earliest
  * at-or-after (`forward`), or closest-in-time (`nearest`, ties to the
  * backward side) quote, optionally within a `tolerance`. The surface
  * pandas calls `merge_asof` and DuckDB spells `ASOF JOIN`
  * (backward-only); the reference could only nested-loop such theta
  * shapes (reference defaultJoin NLJ, `DirectPlanConverter.scala:150-178`),
  * and stock Spark has no as-of join at all.
  *
  * NOT a pair join: both inputs union into one stream partitioned by key
  * and sorted by time, and a windowed running last/first carries the
  * nearest quote to each probe — one shuffle on the key, per-partition
  * external sort, O(n log n) at any scale (the same plan class as q54's
  * hand-built backward as-of; this operator generalizes it to both
  * directions, nearest, and tolerances). Time keys may be integral, DATE
  * or TIMESTAMP/NTZ (one scale family per call — TimeKeys maps each to a
  * monotonic exact Long image: native units / days / epoch µs);
  * `tolerance` is in the family's units. Quotes with null time never
  * match and probes with null time match nothing.
  *
  * Determinism: among quotes sharing an exact (key, time) the survivor is
  * by default arbitrary (the window's tie order); pass `tieBreak` (a
  * quote payload column) and the survivor is the quote with the GREATEST
  * tie-break value in both directions — reproducible across
  * repartitionings whenever the tie-break is unique per (key, time).
  * LEFT-join semantics: every probe row survives, unmatched probes carry
  * nulls in the quote columns. Column sets must be disjoint; output is
  * probes' columns then quotes' non-key columns (incl. the quote time,
  * for the matched distance).
  *
  * SCALE (r17, VERDICT r16 item 1): the keyed window sorts each key's
  * whole stream on ~|keys| cores — a hot or low-cardinality as-of key
  * (q113's `user_id`; any market-data symbol at 100 TB) serializes onto
  * one task. Above `graft.asof.rangeMaxBytes` of plan-estimated stream
  * (64 MB default; `graft.asof.mode=range|window` forces either form) the
  * tieBreak-free directions route to [[matchScalable]] — the
  * mergeIntervals carry-fix-up machinery lifted to the as-of stream:
  * range-partition on (key, time) so ONE key spans many partitions,
  * window per (partition, key), and repair partition boundaries with
  * per-(partition, key) quote extremes (a stats frame of ~|keys|+|parts|
  * rows — the broadcastability precondition; a billion-distinct-key
  * stream has no per-key skew to fix and should stay `window`). A
  * tieBreak keeps the keyed window form: the max-tie-break survivor needs
  * the reversed forward tie order, which the min_by carry cannot spell
  * generically. Row-identical to the window form by AsofJoinSpec's forced
  * `range` battery + the hot-key property test. */
object AsofJoin {

  def asof(probes: DataFrame, quotes: DataFrame, keyCols: Seq[String],
      pTime: String, qTime: String, direction: String = "backward",
      tolerance: Option[Long] = None,
      tieBreak: Option[String] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    require(probes.columns.toSet.intersect(quotes.columns.toSet) == keyCols.toSet &&
      keyCols.forall(k => probes.columns.contains(k) && quotes.columns.contains(k)),
      "asof inputs must share exactly the key columns; payloads must be disjoint")
    require(TimeKeys.familyOf(probes.schema(pTime).dataType) ==
      TimeKeys.familyOf(quotes.schema(qTime).dataType),
      "asof time keys mix scale families (integral vs DATE vs TIMESTAMP)")
    tieBreak.foreach(tb => require(
      quotes.columns.contains(tb) && !keyCols.contains(tb),
      s"tieBreak '$tb' must be a quote payload column"))
    val qPayload = quotes.columns.filterNot(keyCols.contains).toSeq
    val pPayload = probes.columns.filterNot(keyCols.contains).toSeq
    val keys = keyCols.map(col)
    // the quote struct carries a hidden __qt Long image of the quote time,
    // so nearest-distance and tolerance math is exact for every key family
    // (a TIMESTAMP→Long cast would truncate to SECONDS; __qt is epoch µs)
    val qStructType = quotes
      .select(qPayload.map(col) :+
        TimeKeys.toLong(quotes, qTime).as("__qt"): _*).schema
    val pStream = probes.select(
      keys ++ pPayload.map(col) :+
        TimeKeys.toLong(probes, pTime).as("__t") :+ lit(0).as("__isq") :+
        lit(null).cast(qStructType).as("__q"): _*)
    val qStream = quotes.filter(col(qTime).isNotNull).select(
      keys ++ pPayload.map(c => lit(null).cast(
        probes.schema(c).dataType).as(c)) :+
        TimeKeys.toLong(quotes, qTime).as("__t") :+ lit(1).as("__isq") :+
        struct(qPayload.map(col) :+
          TimeKeys.toLong(quotes, qTime).as("__qt"): _*).as("__q"): _*)
    val all = pStream.unionByName(qStream)
    // backward: at an equal instant the quote sorts BEFORE the probe, so
    // the unbounded-preceding..current frame's running last includes it
    // (at-or-before, inclusive); forward mirrors with the probe first and
    // a current..unbounded-following running first. With a tieBreak, the
    // survivor among same-(key, time) quotes is the MAX tie-break value:
    // backward's running last takes the ascending order's last, forward's
    // running first takes the descending order's first — nulls ordered so
    // a non-null tie-break always wins. The extra sort key never reorders
    // probe-vs-quote rows (they differ on __isq, a higher-priority key).
    val wBack = Window.partitionBy(keys: _*)
      .orderBy(Seq(col("__t").asc_nulls_first, col("__isq").desc) ++
        tieBreak.map(tb => col("__q")(tb).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys: _*)
      .orderBy(Seq(col("__t").asc_nulls_last, col("__isq").asc) ++
        tieBreak.map(tb => col("__q")(tb).desc_nulls_last): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withMatch = if (tieBreak.isEmpty && shouldScale(probes.sparkSession, all))
      matchScalable(all, keyCols, direction)
    else direction match {
      case "backward" =>
        all.withColumn("__m", last(col("__q"), ignoreNulls = true).over(wBack))
      case "forward" =>
        all.withColumn("__m", first(col("__q"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        val b = last(col("__q"), ignoreNulls = true).over(wBack)
        // Without a tieBreak, the forward running-first can share wBack's
        // ORDERING (only the frame differs): the two windows then collapse
        // into ONE WindowExec over ONE sort (Spark groups window functions
        // by (partition, order), frames evaluate in the same pass) — r16,
        // guide §2.4: the nearest as-of drops a full per-partition re-sort
        // + second window pass. Semantics are unchanged: the only rows the
        // two orderings place differently are (a) same-instant quotes,
        // which leave the probe's current..following frame — but backward's
        // frame still holds them at distance 0, and the `bd <= fd` rule
        // picks backward on any tie, so the match is identical; (b) null-
        // time probes (nulls first vs last) — their match is nulled by the
        // `__t` isNotNull guard below either way. With a tieBreak the
        // forward survivor among same-(key, time) quotes must be the MAX
        // tie-break, which needs the reversed tie order — keep the
        // two-sort form exactly there.
        val f =
          if (tieBreak.isEmpty)
            first(col("__q"), ignoreNulls = true).over(
              wBack.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          else first(col("__q"), ignoreNulls = true).over(wFwd)
        val bd = col("__t") - col("__b")("__qt")
        val fd = col("__f")("__qt") - col("__t")
        all.withColumn("__b", b).withColumn("__f", f)
          .withColumn("__m",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              // tie -> backward (<=): the standard nearest rule
              .when(bd <= fd, col("__b")).otherwise(col("__f")))
          .drop("__b", "__f")
    }
    val tolOk = tolerance.map(t =>
      abs(col("__t") - col("__m")("__qt")) <= lit(t)).getOrElse(lit(true))
    // probes only; null probe time matches nothing; tolerance nulls the
    // match rather than dropping the probe (LEFT semantics)
    val matched = withMatch.filter(col("__isq") === 0)
      .withColumn("__mOk",
        when(col("__t").isNotNull && col("__m").isNotNull && tolOk, col("__m")))
    matched.select(
      keys ++ pPayload.map(col) ++
        qPayload.map(c => col("__mOk")(c).as(c)): _*)
  }

  /** Route to the range-partitioned form? `graft.asof.mode` forces either;
    * `auto` scales past `graft.asof.rangeMaxBytes` of Catalyst-estimated
    * union-stream bytes (the mergeIntervals routing discipline — the
    * scalable form is also correct for small inputs, only latency
    * differs). */
  private def shouldScale(s: org.apache.spark.sql.SparkSession,
      all: DataFrame): Boolean =
    s.conf.getOption("graft.asof.mode").getOrElse("auto") match {
      case "range"  => true
      case "window" => false
      case _ =>
        val limit = s.conf
          .get("graft.asof.rangeMaxBytes", (64L << 20).toString).toLong
        all.queryExecution.optimizedPlan.stats.sizeInBytes
          .min(BigInt(Long.MaxValue)).toLong > limit
    }

  /** The hot-key-safe match pass: one range exchange on (key, time) — a
    * single key's stream spreads over MANY partitions — then the running
    * last/first per (partition, key) with two scalar boundary fix-ups,
    * exactly mergeGlobalScalable's recipe:
    *
    *  1. per-(partition, key) quote extremes (`max_by`/`min_by` over the
    *     quote rows only — probe rows enter with a null ordering key and
    *     are ignored);
    *  2. carry-in/carry-out: per key, the last earlier-partition quote
    *     (backward) / first later-partition quote (forward) via N-row
    *     prefix/suffix windows over the stats frame (|keys|+|parts| rows,
    *     never data-sized), broadcast-joined back on (partition, key).
    *
    * Equal (key, time) rows land in ONE range partition (the partitioner
    * buckets by value), so the same-instant quote-before-probe order is
    * decided locally and carries never split a tie group. The barrier
    * freezes the sampled range bounds + pid once (the mergeGlobalScalable
    * non-deterministic-upstream discipline) so all three consumers read
    * the same partitioning. Null-time probes sort at their key's range
    * head; whatever the carry hands them is nulled by the caller's
    * `__t isNotNull` guard — same as the window form. Tie-break-free only
    * (see the object scaladoc); `nearest` reuses the backward ordering for
    * both frames under the same distance-0 argument as the window form. */
  private def matchScalable(all: DataFrame, keyCols: Seq[String],
      direction: String): DataFrame = {
    val s = all.sparkSession
    val keys = keyCols.map(col)
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val base = graft.queries.QueryUtil.barrier(s,
      all.repartitionByRange(n,
          keys.map(_.asc) :+ col("__t").asc_nulls_first: _*)
        .withColumn("__pid", spark_partition_id()))
    // quote extremes per (pid, key): max_by/min_by ignore null ordering
    // keys, so probe rows (ordering key nulled) can never be a carry
    val qOrd = when(col("__isq") === 1, col("__t"))
    val stats = base.groupBy(col("__pid") +: keys: _*)
      .agg(max_by(col("__q"), qOrd).as("__lastq"),
        min_by(col("__q"), qOrd).as("__firstq"))
    val byKey = Window.partitionBy(keys: _*).orderBy(col("__pid"))
    val carried = stats
      .withColumn("__cb", last(col("__lastq"), ignoreNulls = true)
        .over(byKey.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__cf", first(col("__firstq"), ignoreNulls = true)
        .over(byKey.rowsBetween(1, Window.unboundedFollowing)))
      .select(col("__pid") +: keys :+ col("__cb") :+ col("__cf"): _*)
    val joined = base.join(broadcast(carried), "__pid" +: keyCols)
    // same orderings as the window form, scoped to (pid, key); nearest
    // rides the backward ordering for both frames (distance-0 ties stay
    // in the backward frame and the bd <= fd rule prefers backward)
    val ordBack = Window.partitionBy(col("__pid") +: keys: _*)
      .orderBy(col("__t").asc_nulls_first, col("__isq").desc)
    val ordFwd = Window.partitionBy(col("__pid") +: keys: _*)
      .orderBy(col("__t").asc_nulls_last, col("__isq").asc)
    def bCol = coalesce(last(col("__q"), ignoreNulls = true)
      .over(ordBack.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      col("__cb"))
    def fCol(w: org.apache.spark.sql.expressions.WindowSpec) =
      coalesce(first(col("__q"), ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)),
        col("__cf"))
    val matched = direction match {
      case "backward" => joined.withColumn("__m", bCol)
      case "forward"  => joined.withColumn("__m", fCol(ordFwd))
      case "nearest" =>
        val bd = col("__t") - col("__b")("__qt")
        val fd = col("__f")("__qt") - col("__t")
        joined.withColumn("__b", bCol).withColumn("__f", fCol(ordBack))
          .withColumn("__m",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(bd <= fd, col("__b")).otherwise(col("__f")))
          .drop("__b", "__f")
    }
    matched.drop("__pid", "__cb", "__cf")
  }
}
