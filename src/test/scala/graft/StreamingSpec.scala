package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Stream/batch equivalence: the streaming plans must converge to the batch
  * answers on a full replay of the events table. */
class StreamingSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed counts converge to batch q44 counts") {
    val q = StreamingOps.runToMemorySink(
      StreamingOps.windowedCounts(StreamingOps.eventsStream(spark, dir)),
      "win_counts", OutputMode.Complete)
    try {
      val streamed = spark.table("win_counts")
        .select(col("ws").cast("string"), col("event_type"), col("n"))
        .collect().map(_.toString).sorted
      val batch = SparkEntry.queries("q44")(spark, dir)
        .select(col("ws"), col("event_type"), col("n"))
        .collect().map(_.toString).sorted
      assert(streamed.length == batch.length && streamed.sameElements(batch),
        s"stream ${streamed.length} rows vs batch ${batch.length}")
    } finally q.stop()
  }

  test("streaming sliding-window counts converge to batch q99 counts") {
    val q = StreamingOps.runToMemorySink(
      StreamingOps.slidingCounts(StreamingOps.eventsStream(spark, dir)),
      "slide_counts", OutputMode.Complete)
    try {
      val streamed = spark.table("slide_counts")
        .select(col("ws").cast("string"), col("event_type"), col("n"))
        .collect().map(_.toString).sorted
      val batch = SparkEntry.queries("q99")(spark, dir)
        .select(col("ws"), col("event_type"), col("n"))
        .collect().map(_.toString).sorted
      assert(streamed.length == batch.length && streamed.sameElements(batch),
        s"stream ${streamed.length} rows vs batch ${batch.length}")
    } finally q.stop()
  }

  test("stateful streaming sessionization converges to batch q45") {
    val q = StreamingOps.runToMemorySink(
      StreamingOps.sessionize(spark, StreamingOps.eventsStream(spark, dir)),
      "sessions", OutputMode.Update)
    try {
      // memory sink in update mode keeps the latest row per key emission;
      // take the last emission per user.
      val streamed = spark.table("sessions")
        .groupBy(col("user_id"))
        .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val batch = SparkEntry.queries("q45")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(streamed.sameElements(batch),
        s"stream ${streamed.take(3).toSeq} vs batch ${batch.take(3).toSeq}")
    } finally q.stop()
  }

  test("EventTimeTimeout sessionization: emitted sessions == batch session_window up to the watermark") {
    val q = StreamingOps.runToMemorySink(
      StreamingOps.sessionizeWithTimeout(spark, StreamingOps.eventsStream(spark, dir)),
      "sessions_to", OutputMode.Append)
    try {
      val emitted = spark.table("sessions_to")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // Append-mode contract: a closed session is emitted exactly once
      assert(emitted.length == emitted.distinct.length, "a session was emitted twice")
      // batch mirror: per-session (user, first-event, last-event, count)
      // with the same 30-minute gap
      val batch = Tables.load(spark, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), graft.queries.QueryUtil.sessionGapStr))
        .agg(min(unix_micros(col("ts"))).as("smin"),
          max(unix_micros(col("ts"))).as("smax"), count(lit(1)).as("n"))
        .select(col("user_id"), col("smin"), col("smax"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // Sessions close only when the watermark passes their gap-close
      // point (final watermark = max ts - 10 min delay, ms precision). The
      // operator's close test is `close <= wm` but the closing invocation
      // itself fires on Spark's strict `timeout < wm`, so boundary-equal
      // sessions may legitimately land on either side: assert the strict
      // core is emitted and everything emitted is a real batch session
      // the watermark has (non-strictly) passed.
      val maxTsMs = Tables.load(spark, dir, "events")
        .agg(max(unix_micros(col("ts")))).collect().head.getLong(0) / 1000
      val watermarkMs = maxTsMs - 10 * 60 * 1000
      val gapMs = graft.queries.QueryUtil.sessionGapMicros / 1000
      val mustEmit = batch.filter(s => s._3 / 1000 + gapMs < watermarkMs).toSet
      val mayEmit = batch.filter(s => s._3 / 1000 + gapMs <= watermarkMs).toSet
      assert(mustEmit.subsetOf(emitted.toSet),
        s"missing ${mustEmit.diff(emitted.toSet).take(3)}")
      assert(emitted.toSet.subsetOf(mayEmit),
        s"emitted a session the watermark hasn't closed: ${emitted.toSet.diff(mayEmit).take(3)}")
      // the replay must actually exercise the timeout path, not only
      // in-batch closes: at least one user's FINAL session must be present
      val finals = batch.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
      assert(emitted.toSet.intersect(finals).nonEmpty,
        "no watermark-closed session — the timeout path never fired")
    } finally q.stop()
  }

  test("event-time TIMER sessions (transformWithState handleExpiredTimer) == batch session_window up to the watermark") {
    val ck = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(ck)
    spark.conf.set(ck,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingOps.runToMemorySink(
        StreamingOps.timerSessions(spark, StreamingOps.eventsStream(spark, dir)),
        "timer_sessions", OutputMode.Append)
      try {
        val emitted = spark.table("timer_sessions")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        assert(emitted.length == emitted.distinct.length, "a session was emitted twice")
        val batch = Tables.load(spark, dir, "events")
          .groupBy(col("user_id"),
            session_window(col("ts"), graft.queries.QueryUtil.sessionGapStr))
          .agg(min(unix_micros(col("ts"))).as("smin"),
            max(unix_micros(col("ts"))).as("smax"), count(lit(1)).as("n"))
          .select(col("user_id"), col("smin"), col("smax"), col("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        // same watermark-boundary slack as the EventTimeTimeout spec: the
        // strict core must emit; nothing beyond the non-strict closure may
        val maxTsMs = Tables.load(spark, dir, "events")
          .agg(max(unix_micros(col("ts")))).collect().head.getLong(0) / 1000
        val watermarkMs = maxTsMs - 10 * 60 * 1000
        val gapMs = graft.queries.QueryUtil.sessionGapMicros / 1000
        val mustEmit = batch.filter(s => s._3 / 1000 + gapMs < watermarkMs).toSet
        val mayEmit = batch.filter(s => s._3 / 1000 + gapMs <= watermarkMs).toSet
        assert(mustEmit.subsetOf(emitted.toSet),
          s"missing ${mustEmit.diff(emitted.toSet).take(3)}")
        assert(emitted.toSet.subsetOf(mayEmit),
          s"emitted a session the watermark hasn't closed: ${emitted.toSet.diff(mayEmit).take(3)}")
        // the TIMER path must actually fire: a user's FINAL session can
        // only close via handleExpiredTimer (no later event exists)
        val finals = batch.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
        assert(emitted.toSet.intersect(finals).nonEmpty,
          "no timer-closed session — handleExpiredTimer never fired")
      } finally q.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(ck, v); case None => spark.conf.unset(ck) }
    }
  }

  test("timer sessions under cross-batch disorder: adjacent stragglers lower smin; older-than-gap stragglers emit closed") {
    // r9 advisor: the single-interval timer state never lowered the session
    // start, so a within-watermark out-of-order event extended n_events but
    // left smin at the first-seen ts. Both disorder regimes are pinned here:
    // (a) a straggler INSIDE the gap of the open interval merges and lowers
    // smin; (b) a straggler older than the open interval by MORE than the
    // gap emits as its own closed session (the documented single-interval
    // delta vs sessionizeWithTimeout's interval list).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(ck)
    spark.conf.set(ck,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ts(min: Int) = new java.sql.Timestamp(360000000L + min * 60000L)
    def tus(min: Int) = ts(min).getTime * 1000
    try {
      // (a) default 10-min delay: T-4 arrives after [T+0, T+5] is open
      val memA = MemoryStream[(Long, java.sql.Timestamp)]
      val qa = StreamingOps.timerSessions(spark, memA.toDS().toDF("user_id", "ts"))
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("timer_ooo_a").start()
      try {
        memA.addData((1L, ts(0)), (1L, ts(5)))
        qa.processAllAvailable() // watermark now T-5
        memA.addData((1L, ts(-4))) // above watermark, inside the 30-min gap
        qa.processAllAvailable()
        memA.addData((2L, ts(120)))
        qa.processAllAvailable()
        memA.addData((2L, ts(200))) // watermark passes T+5 + gap: timer fires
        qa.processAllAvailable()
        val a = spark.table("timer_ooo_a").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        assert(a.contains((1L, tus(-4), tus(5), 3L)),
          s"straggler did not lower smin: ${a.toSeq}")
      } finally qa.stop()
      // (b) 2-hour delay so a 60-min-older straggler is still above the
      // watermark: it precedes the open interval by more than the gap
      val memB = MemoryStream[(Long, java.sql.Timestamp)]
      val qb = StreamingOps.timerSessions(spark,
          memB.toDS().toDF("user_id", "ts"), delay = "2 hours")
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("timer_ooo_b").start()
      try {
        memB.addData((3L, ts(0)))
        qb.processAllAvailable() // watermark T-120
        memB.addData((3L, ts(-60))) // disjoint straggler session
        qb.processAllAvailable()
        memB.addData((4L, ts(400)))
        qb.processAllAvailable()
        memB.addData((4L, ts(600))) // watermark passes T+0 + gap
        qb.processAllAvailable()
        val b = spark.table("timer_ooo_b").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        assert(b.contains((3L, tus(-60), tus(-60), 1L)),
          s"older-than-gap straggler not emitted closed: ${b.toSeq}")
        assert(b.contains((3L, tus(0), tus(0), 1L)),
          s"open interval corrupted by the straggler: ${b.toSeq}")
      } finally qb.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(ck, v); case None => spark.conf.unset(ck) }
    }
  }

  test("EventTimeTimeout sessionization merges cross-batch out-of-order events (no inverted/split sessions)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingOps.sessionizeWithTimeout(spark,
        mem.toDS().toDF("user_id", "ts"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ooo_sessions").start()
    def ts(min: Int) = new java.sql.Timestamp(360000000L + min * 60000L)
    try {
      mem.addData((1L, ts(0))) // batch 1: event at T+0
      q.processAllAvailable()
      // batch 2: 5 min LATE but inside the 10-min watermark delay — must
      // extend the open session backwards (single-last-timestamp state
      // would set last=T-5 and later emit end < start)
      mem.addData((1L, ts(-5)))
      q.processAllAvailable()
      mem.addData((1L, ts(26))) // batch 3: 26 < 30-min gap from T+0 — same session
      q.processAllAvailable()
      // batch 4: far future events advance the watermark past T+26 + gap
      mem.addData((1L, ts(120)), (1L, ts(200)))
      q.processAllAvailable()
      val rows = spark.table("ooo_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.forall(r => r._2 <= r._3), s"inverted session bounds: ${rows.toSeq}")
      val first = rows.minBy(_._2)
      assert(first == ((1L, ts(-5).getTime * 1000, ts(26).getTime * 1000, 3L)),
        s"late event did not merge into the open session: ${rows.toSeq}")
    } finally q.stop()
  }

  test("EventTimeTimeout clamp boundary: watermark stopping exactly at the clamped timeout stalls; +1 ms releases") {
    // Pins the documented residual corner (StreamingOps.scala, timeout
    // registration): when an open interval's close point X is exactly 1 ms
    // above the current watermark, nextCloseMs = X-1 is clamped up to
    // wmMs + 1 == X, and Spark's strict `timeout < watermark` firing means
    // a final watermark stopping EXACTLY at X leaves the closable session
    // unemitted — inherent to the engine's strict comparison, released by
    // any further watermark advance. The spec proves both halves so the
    // corner is regression-tested behavior, not an assumed comment.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingOps.sessionizeWithTimeout(spark,
        mem.toDS().toDF("user_id", "ts"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("clamp_sessions").start()
    val gapMs = graft.queries.QueryUtil.sessionGapMicros / 1000 // 1_800_000
    val delayMs = 600000L // the 10-minute default watermark delay
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val t0 = 10000000L
    val closeX = t0 + gapMs // user 1's session close point, ms
    def emittedStarts() = spark.table("clamp_sessions").collect()
      .map(_.getLong(1)).toSet
    try {
      mem.addData((1L, ts(t0))) // batch 1: the session under test
      q.processAllAvailable()
      // batch 2: driver-user event placing the watermark at exactly X-1
      mem.addData((99L, ts(closeX - 1 + delayMs)))
      q.processAllAvailable()
      // batch 3: fresh user-1 event (above the watermark, > gap away, so a
      // SECOND open interval) forces a state invocation at wm == X-1: the
      // old interval stays open (X > wm) and min nextCloseMs = X-1 is
      // clamped to wm+1 == X — the corner's precondition.
      mem.addData((1L, ts(closeX + 200001L)))
      q.processAllAvailable()
      // batch 4: watermark advances to EXACTLY X. Close test passes
      // (X <= wm) but strict firing (X < X) does not: the documented stall.
      mem.addData((99L, ts(closeX + delayMs)))
      q.processAllAvailable()
      assert(!emittedStarts().contains(t0 * 1000),
        "session emitted at the exact clamp boundary — the documented strict-< stall no longer holds")
      // batch 5: one more millisecond of watermark releases it.
      mem.addData((99L, ts(closeX + delayMs + 1)))
      q.processAllAvailable()
      assert(emittedStarts().contains(t0 * 1000),
        s"clamped session never released: ${spark.table("clamp_sessions").collect().toSeq}")
    } finally q.stop()
  }

  test("transformWithState anomaly flags converge to the batch prior-window computation") {
    // transformWithState requires the RocksDB state store; scope the
    // provider change to this query and restore after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingOps.runToMemorySink(
        StreamingOps.anomalyFlags(spark, StreamingOps.eventsStream(spark, dir)),
        "anomalies", OutputMode.Append)
      try {
        val streamed = spark.table("anomalies")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .sortBy(t => (t._1, t._2))
        // batch mirror: per user ordered by (ts, event_id), stats over the
        // STRICTLY-PRIOR frame; same formula, same z/minSamples
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val batch = Tables.load(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"),
            count(col("value")).over(w).as("n"),
            sum(col("value")).over(w).as("s"),
            sum(col("value") * col("value")).over(w).as("s2"))
          .select(col("user_id"), col("event_id"), col("n"),
            (col("n") >= 5 &&
              sqrt(greatest(col("s2") / col("n") - (col("s") / col("n")) * (col("s") / col("n")), lit(0.0))) > 0.0 &&
              abs(col("value") - col("s") / col("n")) >
                lit(3.0) * sqrt(greatest(col("s2") / col("n") - (col("s") / col("n")) * (col("s") / col("n")), lit(0.0))))
              .as("an"))
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) 0L else r.getLong(2), r.getBoolean(3)))
          .sortBy(t => (t._1, t._2))
        assert(streamed.length == batch.length)
        val bad = streamed.zip(batch).filter { case (a, b) => a != b }
        assert(bad.isEmpty, s"first diffs: ${bad.take(3).mkString(", ")}")
        assert(streamed.count(_._4) > 0, "scenario degenerate: no anomalies flagged")
      } finally q.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("mid-stream kill + restart from checkpoint: sessionization is exactly-once and session state survives the failure") {
    // failure-recovery, not just state-sharing: run 1 commits batch 0
    // (first half of events), then an injected exception kills the query
    // INSIDE batch 1 before its commit. The restart replays batch 1 from
    // the checkpointed offsets against the recovered state. Asserted:
    // (a) exactly-once — no session is emitted in two batches, and batch 0
    //     is NOT re-emitted on restart;
    // (b) output equivalence — the combined emission passes the same
    //     watermark-bounded equivalence to the batch session_window mirror
    //     as an uninterrupted run;
    // (c) state recovery — the stream is split at the midpoint of the
    //     longest batch session, so ONE session has events on both sides
    //     of the kill; its correct (smin, smax, n) can only be emitted if
    //     batch 0's open-session state survived into the restarted run.
    val streamDir = java.nio.file.Files.createTempDirectory("graft-kill-")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kill-ckpt-")
    val ev = Tables.load(spark, dir, "events").select(col("user_id"), col("ts"))
    val batch = ev
      .groupBy(col("user_id"),
        session_window(col("ts"), graft.queries.QueryUtil.sessionGapStr))
      .agg(min(unix_micros(col("ts"))).as("smin"),
        max(unix_micros(col("ts"))).as("smax"), count(lit(1)).as("n"))
      .select(col("user_id"), col("smin"), col("smax"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val longest = batch.maxBy(s => (s._3 - s._2, s._1))
    val split = (longest._2 + longest._3) / 2
    val base = System.currentTimeMillis() - 600000
    writeOneFile(ev.filter(unix_micros(col("ts")) <= split),
      streamDir.resolve("h1.parquet"), base)
    writeOneFile(ev.filter(unix_micros(col("ts")) > split),
      streamDir.resolve("h2.parquet"), base + 60000)
    val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val got = scala.collection.concurrent.TrieMap.empty[Long, Array[(Long, Long, Long, Long)]]
    def runOnce(): Unit = {
      val stream = spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      val q = StreamingOps.sessionizeWithTimeout(spark, stream)
        .writeStream.outputMode(OutputMode.Append)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: java.lang.Long) =>
          val rows = df.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          if (id == 1L && !killed.getAndSet(true))
            throw new RuntimeException("injected mid-stream kill")
          got(id.toLong) = rows
          ()
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](runOnce())
    assert(killed.get && ex.toString.contains("injected mid-stream kill"),
      s"run 1 did not die on the injected failure: $ex")
    assert(got.contains(0L) && !got.contains(1L),
      "batch 0 must have committed before the kill, batch 1 must not have")
    runOnce() // restart from the checkpoint; batch 1 replays, then closes
    // (a) exactly-once across the failure boundary
    val perBatch = got.toSeq.flatMap { case (id, rows) => rows.map(_ -> id) }
    val dupes = perBatch.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
    assert(dupes.isEmpty, s"sessions emitted in two batches: ${dupes.keys.take(3)}")
    val emitted = perBatch.map(_._1).toSet
    assert(perBatch.size == emitted.size, "a session was emitted twice")
    // (b) same watermark-bounded equivalence as the uninterrupted run
    val maxTsMs = ev.agg(max(unix_micros(col("ts")))).collect().head.getLong(0) / 1000
    val watermarkMs = maxTsMs - 10 * 60 * 1000
    val gapMs = graft.queries.QueryUtil.sessionGapMicros / 1000
    val mustEmit = batch.filter(s => s._3 / 1000 + gapMs < watermarkMs).toSet
    val mayEmit = batch.filter(s => s._3 / 1000 + gapMs <= watermarkMs).toSet
    assert(mustEmit.subsetOf(emitted), s"missing ${mustEmit.diff(emitted).take(3)}")
    assert(emitted.subsetOf(mayEmit),
      s"emitted a session the watermark hasn't closed: ${emitted.diff(mayEmit).take(3)}")
    // (c) the split-spanning session came out whole — state crossed the kill
    assert(emitted.contains(longest),
      s"the session spanning the kill point was not emitted intact: $longest")
  }

  test("mid-stream kill + restart: SCD2 fold is exactly-once and the open version survives the failure") {
    // the dimension-table production claim: a version OPENED before the
    // failure and CLOSED after it must come out with the pre-kill
    // valid_from — only possible if the ValueState open-version survived
    // the restart. Same harness as the sessionization kill test: batch 0
    // (first half by time) commits, an injected exception kills batch 1
    // before its commit, the restart replays batch 1 from the checkpoint.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val streamDir = java.nio.file.Files.createTempDirectory("graft-scd2kill-")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2kill-ckpt-")
    try {
      val ev = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      val closed = SparkEntry.queries("d94")(spark, dir)
        .filter(!col("is_current"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
      // split at the median event time: versions opened in h1 and closed in
      // h2 exist (asserted below), so state MUST cross the kill boundary
      val times = ev.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
      val split = times(times.length / 2)
      val spanning = closed.filter(v => v._4 <= split && v._5 > split).toSet
      assert(spanning.nonEmpty, "scenario degenerate: no version spans the split")
      val base = System.currentTimeMillis() - 600000
      writeOneFile(ev.filter(unix_micros(col("ts")) <= split),
        streamDir.resolve("h1.parquet"), base)
      writeOneFile(ev.filter(unix_micros(col("ts")) > split),
        streamDir.resolve("h2.parquet"), base + 60000)
      val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val got = scala.collection.concurrent.TrieMap
        .empty[Long, Array[(Long, Int, String, Long, Long)]]
      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema("user_id long, event_id long, ts timestamp, event_type string")
          .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
        val q = StreamingOps.scd2Stream(spark, stream)
          .writeStream.outputMode(OutputMode.Append)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: java.lang.Long) =>
            val rows = df.collect().map(r => (r.getLong(0), r.getInt(1),
              r.getString(2), r.getLong(3), r.getLong(4)))
            if (id == 1L && !killed.getAndSet(true))
              throw new RuntimeException("injected mid-stream kill")
            got(id.toLong) = rows
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination(120000) finally q.stop()
      }
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](runOnce())
      assert(killed.get && ex.toString.contains("injected mid-stream kill"),
        s"run 1 did not die on the injected failure: $ex")
      assert(got.contains(0L) && !got.contains(1L),
        "batch 0 must have committed before the kill, batch 1 must not have")
      runOnce() // restart: batch 1 replays against the recovered state
      // (a) exactly-once: no version lands in two batches, none twice
      val perBatch = got.toSeq.flatMap { case (id, rows) => rows.map(_ -> id) }
      assert(perBatch.size == perBatch.map(_._1).distinct.size,
        "a version was emitted twice across the failure boundary")
      // (b) the combined emission is EXACTLY the batch fold's closed set
      // (every closing event arrived by end-of-stream)
      val emitted = perBatch.map(_._1).toSet
      assert(emitted == closed.toSet,
        s"missing: ${closed.toSet.diff(emitted).take(3)}; " +
          s"extra: ${emitted.diff(closed.toSet).take(3)}")
      // (c) the split-spanning versions came out with their PRE-KILL
      // valid_from — the open-version state crossed the restart
      assert(spanning.subsetOf(emitted),
        s"state lost at the kill: ${spanning.diff(emitted).take(3)}")
      assert(spanning.forall(v => got(1L).map(t => (t._1, t._2, t._3, t._4, t._5)).contains(v)),
        "a spanning version was not emitted by the replayed batch 1")
    } finally {
      prevProv match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
      ()
    }
  }

  /** Write `df` as ONE parquet file at `dest` with an explicit modification
    * time — the file source orders batches by (modTime, path), so ascending
    * stamps give deterministic multi-batch arrival order. */
  private def writeOneFile(df: org.apache.spark.sql.DataFrame,
      dest: java.nio.file.Path, lastMod: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-onefile-")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp)
      .filter(p => p.toString.endsWith(".parquet")).findFirst.get
    java.nio.file.Files.move(part, dest)
    assert(dest.toFile.setLastModified(lastMod))
    dest.toFile.deleteOnExit(); tmp.toFile.deleteOnExit()
  }

  /** The batch prior-window mirror of anomalyFlags (same formula, z=3,
    * minSamples=5) over a (user_id, event_id, ts, value) frame. */
  private def anomalyMirror(events: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Boolean)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sd = sqrt(greatest(col("s2") / col("n") -
      (col("s") / col("n")) * (col("s") / col("n")), lit(0.0)))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        count(col("value")).over(w).as("n"),
        sum(col("value")).over(w).as("s"),
        sum(col("value") * col("value")).over(w).as("s2"))
      .select(col("user_id"), col("event_id"), col("n"),
        (col("n") >= 5 && sd > 0.0 &&
          abs(col("value") - col("s") / col("n")) > lit(3.0) * sd).as("an"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("anomaly flags across MULTIPLE micro-batches (event-time-ordered arrival) converge to the batch mirror") {
    // the single-batch convergence test can't exercise cross-batch state
    // carry-over; here the corpus is split into 3 event-time ranges fed as
    // 3 separate micro-batches (maxFilesPerTrigger=1, ascending mod times)
    // — the documented ordered-arrival regime of the API contract
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ev = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      // cut on ts: the contract needs event-time-ordered batch arrival
      val Array(t1, t2) = ev.selectExpr("cast(ts as double) d")
        .stat.approxQuantile("d", Array(0.33, 0.66), 0.0)
      val streamDir = java.nio.file.Files.createTempDirectory("graft-mb-")
      val base = System.currentTimeMillis() - 600000
      writeOneFile(ev.filter(col("ts").cast("double") <= t1),
        streamDir.resolve("b1.parquet"), base)
      writeOneFile(ev.filter(col("ts").cast("double") > t1 && col("ts").cast("double") <= t2),
        streamDir.resolve("b2.parquet"), base + 60000)
      writeOneFile(ev.filter(col("ts").cast("double") > t2),
        streamDir.resolve("b3.parquet"), base + 120000)
      val stream = spark.readStream
        .schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val q = StreamingOps.runToMemorySink(
        StreamingOps.anomalyFlags(spark, stream), "anomalies_mb", OutputMode.Append)
      try {
        val streamed = spark.table("anomalies_mb")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .sortBy(t => (t._1, t._2))
        assert(q.lastProgress != null && q.recentProgress.count(_.numInputRows > 0) >= 3,
          "expected at least 3 non-empty micro-batches")
        val batch = anomalyMirror(ev)
        assert(streamed.length == batch.length)
        val bad = streamed.zip(batch).filter { case (a, b) => a != b }
        assert(bad.isEmpty, s"first diffs: ${bad.take(3).mkString(", ")}")
      } finally q.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("streaming SCD2 fold emits exactly the batch d94 CLOSED versions; open tails stay in state") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingOps.runToMemorySink(
        StreamingOps.scd2Stream(spark, StreamingOps.eventsStream(spark, dir)),
        "scd2", OutputMode.Append)
      try {
        val streamed = spark.table("scd2")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
            r.getLong(3), r.getLong(4)))
          .sortBy(t => (t._1, t._2))
        // batch mirror: d94's closed versions (append mode cannot retract
        // the open tail, so the stream emits exactly the is_current=false
        // rows — valid_to_us is non-null on every one of them)
        val batch = SparkEntry.queries("d94")(spark, dir)
          .filter(!col("is_current"))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
            r.getLong(3), r.getLong(4)))
          .sortBy(t => (t._1, t._2))
        assert(streamed.length == batch.length,
          s"closed-version counts differ: ${streamed.length} vs ${batch.length}")
        val bad = streamed.zip(batch).filter { case (a, b) => a != b }
        assert(bad.isEmpty, s"first diffs: ${bad.take(3).mkString(", ")}")
        assert(streamed.nonEmpty, "scenario degenerate: no versions closed")
        // the open tails are exactly the batch is_current rows: one per user
        val openUsers = SparkEntry.queries("d94")(spark, dir)
          .filter(col("is_current")).select(col("user_id")).collect().map(_.getLong(0))
        assert(openUsers.distinct.length == openUsers.length)
        assert(streamed.map(_._1).toSet.subsetOf(openUsers.toSet),
          "a user with closed versions lacks an open tail")
      } finally q.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("ListState rising-streak flags converge to the batch lag-window computation") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingOps.runToMemorySink(
        StreamingOps.risingStreak(spark, StreamingOps.eventsStream(spark, dir)),
        "streaks", OutputMode.Append)
      try {
        val streamed = spark.table("streaks")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          .sortBy(t => (t._1, t._2))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val batch = Tables.load(spark, dir, "events")
          .select(col("user_id"), col("event_id"),
            (lag(col("value"), 2).over(w) < lag(col("value"), 1).over(w) &&
              lag(col("value"), 1).over(w) < col("value")).as("rising"))
          .collect().map(r => (r.getLong(0), r.getLong(1),
            !r.isNullAt(2) && r.getBoolean(2)))
          .sortBy(t => (t._1, t._2))
        assert(streamed.length == batch.length)
        val bad = streamed.zip(batch).filter { case (a, b) => a != b }
        assert(bad.isEmpty, s"first diffs: ${bad.take(3).mkString(", ")}")
        assert(streamed.count(_._3) > 0, "scenario degenerate: no rising streaks")
      } finally q.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("MapState per-type running counts converge to the batch per-(user,type) prior-count window") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingOps.runToMemorySink(
        StreamingOps.typeCounts(spark, StreamingOps.eventsStream(spark, dir)),
        "type_counts", OutputMode.Append)
      try {
        val streamed = spark.table("type_counts")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
          .sortBy(t => (t._1, t._2))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val batch = Tables.load(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            count(lit(1)).over(w).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
          .sortBy(t => (t._1, t._2))
        assert(streamed.length == batch.length)
        val bad = streamed.zip(batch).filter { case (a, b) => a != b }
        assert(bad.isEmpty, s"first diffs: ${bad.take(3).mkString(", ")}")
        assert(streamed.count(_._4 > 0) > 0, "scenario degenerate: no repeated types")
      } finally q.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("anomaly state ages out under TTL: idle user's stats restart cold and the state store stays bounded") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      def mkBatch(uid: Long, eids: Range, tsBase: Long): org.apache.spark.sql.DataFrame =
        eids.map(e => (uid, e.toLong,
          new java.sql.Timestamp(tsBase + e * 1000L), 10.0 + (e % 3)))
          .toDF("user_id", "event_id", "ts", "value")
      // TimeMode.ProcessingTime (which TTL requires) makes the engine run
      // batches CONTINUOUSLY to fire expiry work, so processAllAvailable
      // never settles — each phase instead runs Trigger.AvailableNow to
      // completion, sharing one checkpoint so state survives between runs
      // (also the realistic incremental-job shape for TTL'd pipelines)
      val streamDir = java.nio.file.Files.createTempDirectory("graft-ttl-")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ttl-ckpt-")
      val base = System.currentTimeMillis() - 600000
      val collected = scala.collection.mutable.Map.empty[Long, Long] // event_id -> n_prior
      def runOnce(): org.apache.spark.sql.streaming.StreamingQueryProgress = {
        val stream = spark.readStream
          .schema("user_id long, event_id long, ts timestamp, value double")
          .parquet(streamDir.toString)
        val q = StreamingOps.anomalyFlags(spark, stream,
            ttl = Some(java.time.Duration.ofMillis(500)))
          .writeStream.outputMode(OutputMode.Append)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = df.collect().map(r => (r.getLong(1), r.getLong(2)))
            collected.synchronized { collected ++= rows }: Unit
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination(120000) finally q.stop()
        q.lastProgress
      }
      writeOneFile(mkBatch(1L, 0 until 8, 1000000L), streamDir.resolve("b1.parquet"), base)
      runOnce()
      assert(collected.get(7L).contains(7L), "batch 1 should accumulate prior counts 0..7")
      Thread.sleep(1500) // comfortably past the 500 ms TTL
      // the SAME user returns after idling past the TTL: state must have
      // expired, so prior counts restart from 0 instead of continuing at 8
      writeOneFile(mkBatch(1L, 100 until 103, 2000000L),
        streamDir.resolve("b2.parquet"), base + 60000)
      val prog2 = runOnce()
      val b2 = collected.toMap
      assert(b2.get(100L).contains(0L) && b2.get(101L).contains(1L) && b2.get(102L).contains(2L),
        s"expired state must restart cold, got ${b2.view.filterKeys(_ >= 100).toMap}")
      // state-store boundedness: one live key's value row (plus at most its
      // TTL-index bookkeeping) — churned keys don't accumulate
      val st = Option(prog2).toSeq.flatMap(_.stateOperators)
      assert(st.nonEmpty && st.head.numRowsTotal <= 2,
        s"state rows not bounded by live keys: ${st.map(_.numRowsTotal).mkString(",")}")
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("bounded-state streaming dedup (dropDuplicatesWithinWatermark) converges to batch distinct") {
    val q = StreamingOps.runToMemorySink(
      StreamingOps.dedupBounded(StreamingOps.eventsStream(spark, dir)),
      "dedup_bounded", OutputMode.Append)
    try {
      // on a full replay every duplicate arrives within the horizon, so the
      // bounded-state variant must agree exactly with batch DISTINCT
      val streamed = spark.table("dedup_bounded").select(col("event_id"))
      val batch = Tables.load(spark, dir, "events").select(col("event_id")).distinct()
      assert(streamed.count() == batch.count())
      assert(streamed.distinct().count() == streamed.count(), "emitted a duplicate id")
    } finally q.stop()
  }

  test("streaming trending terms (explode before stateful agg) converge to batch; top-3 matches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // spread docs over ~3 ten-minute windows by id
    def ts(id: Long) = new java.sql.Timestamp(500000000L + id * 150000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.trendingTerms(mem.toDS().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("trend_terms").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { b =>
        mem.addData(b.map { case (id, t) => (id, t, ts(id)) }.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // push the watermark far past the last window so every window closes
      mem.addData((999999L, "flush", new java.sql.Timestamp(900000000L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trend_terms")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .filter(_._2 != "flush").toSet
    val batch = docs.toSeq.toDF("doc_id", "text")
      .select(lit(new java.sql.Timestamp(0)).as("z"), col("doc_id"), col("text"))
      .select(explode(split(trim(col("text")), "\\s+")).as("term"), col("doc_id"))
      .withColumn("ts", expr("timestamp_millis(500000000 + doc_id * 150000)"))
      .groupBy(window(col("ts"), "10 minutes"), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("term"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == batch,
      s"stream windows diverge from batch: ${got.diff(batch).take(3)} / ${batch.diff(got).take(3)}")
    // derived trending report: top-3 per window, count desc then term
    val top = got.groupBy(_._1).view.mapValues(
      _.toSeq.sortBy(t => (-t._3, t._2)).take(3).map(t => (t._2, t._3))).toMap
    val topBatch = batch.groupBy(_._1).view.mapValues(
      _.toSeq.sortBy(t => (-t._3, t._2)).take(3).map(t => (t._2, t._3))).toMap
    assert(top == topBatch && top.nonEmpty)
  }

  test("streaming HLL register partials equal batch registers after every batch (incremental distinct)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the d88 stored-partials pattern on an unbounded stream: register
    // state is per-(source, idx) MAX — order-blind and duplicate-blind, so
    // the stream must equal the batch registersDf over the rows seen so
    // far at EVERY batch boundary, and the estimate read off the streamed
    // registers must equal approx_count_distinct over the same keys
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val mem = MemoryStream[(String, String)]
    val q = StreamingOps.runToMemorySink(
      StreamingOps.hllRegisterStream(mem.toDS().toDF("source", "text")),
      "hll_regs", OutputMode.Complete)
    try {
      val seen = scala.collection.mutable.ArrayBuffer[(String, String)]()
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { b =>
        mem.addData(b.toIndexedSeq: _*)
        seen ++= b
        q.processAllAvailable()
        val streamed = spark.table("hll_regs")
          .collect().map(_.toString).sorted.toSeq
        val batch = graft.queries.HllMirror.registersDf(
          seen.toSeq.toDF("source", "text")
            .select(col("source").as("g"),
              expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)")
                .as("v")),
          Seq("g"), 9)
          .collect().map(_.toString).sorted.toSeq
        assert(streamed == batch,
          s"streamed registers diverge at ${seen.size} rows: " +
            s"${streamed.diff(batch).take(3)} / ${batch.diff(streamed).take(3)}")
      }
      // estimate off the final streamed registers == approx_count_distinct
      val est = graft.queries.HllMirror.estimateDf(
        spark.table("hll_regs")
          .groupBy(col("idx")).agg(max(col("mr")).as("mr"))
          .select(lit("all").as("g"), col("idx"), col("mr")), 9)
        .collect().head.getLong(1)
      val exact = seen.toSeq.toDF("source", "text")
        .agg(approx_count_distinct(
          expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)")))
        .collect().head.getLong(0)
      assert(est == exact,
        s"estimate from streamed registers $est != approx_count_distinct $exact")
    } finally q.stop()
  }

  test("stream-static banded interval join == batch pointInInterval (stateless band routing)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the band column and the interval explode are stateless projections,
    // so RangeJoin.pointInInterval composes with Structured Streaming as a
    // plain stream-static inner join — a streaming points feed probes a
    // static ranges table with NO state store and NO watermark, and a full
    // replay must equal the batch operator row for row
    val ranges = Seq((-9L, -4L, 10L), (-2L, 3L, 11L), (3L, 21L, 12L),
      (13L, 16L, 13L), (30L, 40L, 14L))
      .toDF("lo", "hi", "rid")
    val pts = Seq(-8L, -4L, 0L, 3L, 7L, 13L, 16L, 21L, 35L, 50L)
    val mem = MemoryStream[Long]
    val joined = graft.operators.RangeJoin.pointInInterval(
      mem.toDS().toDF("pv").withColumn("pid", col("pv") + 100),
      ranges, "pv", "lo", "hi", 16L)
      .select(col("pid"), col("rid"))
    val q = StreamingOps.runToMemorySink(joined, "rj_stream", OutputMode.Append)
    try {
      pts.grouped(4).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("rj_stream")
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.RangeJoin.pointInInterval(
        pts.toDF("pv").withColumn("pid", col("pv") + 100),
        ranges, "pv", "lo", "hi", 16L)
        .select(col("pid"), col("rid"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"stream ${streamed.take(5)} vs batch ${batch.take(5)}")
    } finally q.stop()
  }

  test("stream-static interval-OVERLAP join == batch intervalOverlap (stateless canonical-band routing)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // BOTH sides explode, but band expansion and the canonical-band
    // predicate are stateless projections — so a streaming intervals feed
    // overlap-joins a static windows table as a plain stream-static inner
    // equi-join: no state store, no watermark, and a full replay must
    // equal the batch operator pair for pair (incl. the inverted-interval
    // and many-shared-bands edges)
    val wins = Seq((-30L, -20L, 101L), (-5L, 35L, 102L), (6L, 6L, 103L),
      (28L, 60L, 104L), (41L, 44L, 105L), (90L, 80L, 106L))
      .toDF("blo", "bhi", "bid")
    val ivs = Seq((-20L, 10L, 1L), (0L, 30L, 2L), (5L, 6L, 3L),
      (10L, 40L, 4L), (25L, 25L, 5L), (50L, 45L, 6L), (-7L, -3L, 7L))
    val mem = MemoryStream[(Long, Long, Long)]
    val joined = graft.operators.RangeJoin.intervalOverlap(
      mem.toDS().toDF("alo", "ahi", "aid"), wins,
      "alo", "ahi", "blo", "bhi", 8L)
      .select(col("aid"), col("bid"))
    val q = StreamingOps.runToMemorySink(joined, "ov_stream", OutputMode.Append)
    try {
      ivs.grouped(3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("ov_stream")
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.RangeJoin.intervalOverlap(
        ivs.toDF("alo", "ahi", "aid"), wins, "alo", "ahi", "blo", "bhi", 8L)
        .select(col("aid"), col("bid"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"stream ${streamed.take(5)} vs batch ${batch.take(5)}")
    } finally q.stop()
  }

  test("streaming exact-content dedup (md5 key) converges to batch distinct-by-content") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real corpus + injected byte-identical duplicates under NEW ids in a
    // LATER batch (the cross-batch case a per-batch distinct would miss)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // 1 ms per id: the whole corpus spans well under the 10-minute
    // watermark delay, so no dedup key is evicted before the duplicate
    // batch arrives even if the fixture grows by orders of magnitude
    def ts(id: Long) = new java.sql.Timestamp(500000000L + id)
    val dups = docs.take(20).map { case (id, text) => (id + 1000000L, text) }
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.dedupContentExact(
        mem.toDS().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("content_dedup").start()
    try {
      mem.addData(docs.map { case (id, t) => (id, t, ts(id)) }.toSeq: _*)
      q.processAllAvailable()
      mem.addData(dups.map { case (id, t) => (id, t, ts(id)) }.toSeq: _*)
      q.processAllAvailable()
      val out = spark.table("content_dedup").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // batch mirror over everything fed: one survivor per distinct text
      val batchDistinct = docs.map(_._2).distinct.length
      assert(out.length == batchDistinct,
        s"stream kept ${out.length} docs vs batch ${batchDistinct} distinct texts")
      assert(out.map(_._2).distinct.length == out.length, "emitted a duplicate content key")
      // every injected cross-batch duplicate was dropped
      assert(!out.exists(_._1 >= 1000000L), "a cross-batch byte-duplicate survived")
    } finally q.stop()
  }

  test("streaming near-dup dedup (MinHash band key) converges to batch distinct-by-band") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // 1 ms per id: the whole corpus spans well under the 10-minute
    // watermark delay, so no dedup key is evicted before the duplicate
    // batch arrives even if the fixture grows by orders of magnitude
    def ts(id: Long) = new java.sql.Timestamp(500000000L + id)
    // byte-identical dups (J=1: band-key equality deterministic) in a later batch
    val dups = docs.take(20).map { case (id, text) => (id + 1000000L, text) }
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.dedupContentNear(spark,
        mem.toDS().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("neardup_stream").start()
    try {
      mem.addData(docs.map { case (id, t) => (id, t, ts(id)) }.toSeq: _*)
      q.processAllAvailable()
      mem.addData(dups.map { case (id, t) => (id, t, ts(id)) }.toSeq: _*)
      q.processAllAvailable()
      val out = spark.table("neardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // batch mirror: distinct count of the SAME band-key expression over
      // everything fed — full-replay convergence of the streaming form
      graft.functions.GraftFunctions.register(spark)
      val fed = (docs ++ dups).toSeq.toDF("doc_id", "text")
      val batchKeys = fed.select(
          graft.queries.DedupOps.minhashBandKey(col("text"), 4).as("bkey"))
        .distinct().count()
      assert(out.length == batchKeys,
        s"stream kept ${out.length} docs vs batch ${batchKeys} distinct band keys")
      assert(out.map(_._2).distinct.length == out.length, "emitted a duplicate band key")
      assert(!out.exists(_._1 >= 1000000L), "a byte-identical near-dup (J=1) survived")
      // the band key genuinely coarsens: it must not exceed (and for a real
      // corpus should undercut) the exact-content key count — near-dups merge
      val exactKeys = fed.select(md5(col("text")).as("k")).distinct().count()
      assert(batchKeys <= exactKeys, "band key finer than exact content key")
    } finally q.stop()
  }

  test("stream-stream interval join converges to the batch theta join") {
    val q = StreamingOps.runToMemorySink(
      StreamingOps.clickPurchaseJoin(StreamingOps.eventsStream(spark, dir)),
      "attribution", OutputMode.Append)
    try {
      val streamed = spark.table("attribution")
        .select(col("user_id"), col("click_ts").cast("string"),
          col("p_ts").cast("string"))
        .collect().map(_.toString).sorted
      val ev = Tables.load(spark, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val batch = clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("p_ts") >= col("click_ts") &&
            col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("click_ts").cast("string"),
          col("p_ts").cast("string"))
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty, "no attributed pairs — join never fired")
      assert(streamed.length == batch.length && streamed.sameElements(batch),
        s"stream ${streamed.length} rows vs batch ${batch.length}")
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join exactly (no state, no watermark)") {
    val q = StreamingOps.runToMemorySink(
      StreamingOps.segmentRollup(spark, StreamingOps.eventsStream(spark, dir), dir),
      "segment_rollup", OutputMode.Complete)
    try {
      val streamed = spark.table("segment_rollup").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val batch = StreamingOps.segmentRollup(spark,
          Tables.load(spark, dir, "events"), dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(streamed.nonEmpty, "no enriched rows — the dim join never matched")
      // DECIMAL-exact sums: the streaming and batch rollups must agree
      // bit-for-bit, not approximately
      assert(streamed.sameElements(batch),
        s"stream ${streamed.toSeq} vs batch ${batch.toSeq}")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: matches equal batch inner; nulls are exactly the closed unmatched clicks") {
    val q = StreamingOps.runToMemorySink(
      StreamingOps.clickPurchaseLeftOuter(StreamingOps.eventsStream(spark, dir)),
      "attribution_outer", OutputMode.Append)
    try {
      val out = spark.table("attribution_outer")
        .select(col("user_id"), col("click_ts").cast("string"),
          col("p_ts").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      val matched = out.filter(_._3.isDefined).map(r => (r._1, r._2, r._3.get)).sorted
      val nulls = out.filter(_._3.isEmpty).map(r => (r._1, r._2)).toSet
      val ev = Tables.load(spark, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val joinCond = col("user_id") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES")
      val batchInner = clicks.join(purchases, joinCond)
        .select(col("user_id"), col("click_ts").cast("string"),
          col("p_ts").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      // matched rows are watermark-independent: they emit as they arrive
      assert(matched.nonEmpty && matched.sameElements(batchInner),
        s"outer join matched side diverged: stream ${matched.length} vs batch ${batchInner.length}")
      // the null side: exactly the batch-unmatched clicks, gated by the
      // final watermark passing the click's join-window end (+1h delay)
      val unmatched = clicks.join(purchases, joinCond, "left_anti")
        .select(col("user_id"), unix_micros(col("click_ts")).as("cm"),
          col("click_ts").cast("string"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val unmatchedSet = unmatched.map(r => (r._1, r._3)).toSet
      assert(nulls.subsetOf(unmatchedSet),
        s"false null emitted: ${nulls.diff(unmatchedSet).take(3)}")
      // the query's GLOBAL watermark is the min across its two watermark
      // nodes (click stream and purchase stream), each maxTs - 1h — the
      // click side finishes hours before the purchase side in this corpus
      val wmMicros = ev.filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type")).agg(max(unix_micros(col("ts"))).as("m"))
        .agg(min(col("m"))).collect().head.getLong(0) -
        3600L * 1000000 // 1-hour watermark delay
      val mustNull = unmatched
        .filter(r => r._2 + 30L * 60 * 1000000 < wmMicros)
        .map(r => (r._1, r._3)).toSet
      assert(mustNull.subsetOf(nulls),
        s"closed unmatched click never emitted: ${mustNull.diff(nulls).take(3)}")
      assert(nulls.nonEmpty, "no null-side rows — the outer path never fired")
    } finally q.stop()
  }

  test("streaming accept+append loop: the index grows with accepted docs and " +
      "matches a greedy batch replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.queries.DedupOps
    DedupOps.writeIngestIndex(spark, dir,
      "acc_ing_buckets", "acc_ing_shingles", numBuckets = 4)
    try {
      val incoming = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % DedupOps.IngestMod === DedupOps.IngestResidue)
        .select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(incoming.length >= 3)
      // 3 batches; batch 3 additionally re-sends two batch-1 texts under
      // fresh ids — they can only be flagged if the loop actually grew the
      // index with batch 1's accepted docs (the cross-batch proof)
      val g = incoming.grouped(math.max(1, incoming.length / 3 + 1)).toSeq
      val resent = g.head.take(2).map { case (id, tx) => (id + 1000000L, tx) }
      val batches = g.init :+ (g.last ++ resent)
      val mem = MemoryStream[(Long, String)]
      val gotFlagged = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      val gotAccepted = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
      val q = StreamingOps.ingestAcceptStream(spark, "acc_ing_buckets",
        "acc_ing_shingles", mem.toDS().toDF("doc_id", "text"), 0.8) {
        (flagged, accepted, _) =>
          gotFlagged.synchronized {
            gotFlagged += flagged.collect().map(_.toString).sorted.toSeq
            gotAccepted += accepted.collect().map(_.getLong(0)).sorted.toSeq
          }
      }
      try {
        batches.foreach { b => mem.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
      } finally q.stop()
      // the resent batch-1 texts were flagged => the index really grew
      assert(gotFlagged.last.exists(_.contains("1000")),
        s"resent batch-1 docs not flagged — index did not grow: ${gotFlagged.last}")
      // greedy batch replay over PURE FRAMES (probeIngestFrames — no stored
      // tables, no appends): same per-batch flagged rows and accepted ids
      var cur = DedupOps.hashedDocs(spark, dir)
        .filter(col("doc_id") % DedupOps.IngestMod =!= DedupOps.IngestResidue)
        .select(col("doc_id"), col("hs")).persist()
      for ((b, i) <- batches.zipWithIndex) {
        val hashed = DedupOps.hashedFrame(b.toSeq.toDF("doc_id", "text")).persist()
        val flagged = DedupOps.probeIngestFrames(spark, cur, hashed, 0.8)
        val flaggedRows = flagged.collect().map(_.toString).sorted.toSeq
        val accepted = hashed.join(flagged.select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        assert(gotFlagged(i) == flaggedRows,
          s"batch $i flagged diverged:\nstream=${gotFlagged(i)}\nreplay=$flaggedRows")
        assert(gotAccepted(i) ==
          accepted.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq,
          s"batch $i accepted diverged")
        cur = cur.unionByName(accepted.select(col("doc_id"), col("hs"))).persist()
        hashed.unpersist(): Unit
      }
      // and the grown stored index answers a fresh probe exactly like the
      // replayed corpus state: probe-after-N-batches == batch rebuild
      val probeSet = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % DedupOps.IngestMod === (DedupOps.IngestResidue + 1))
        .select(col("doc_id"), col("text"))
      val viaIndex = DedupOps.probeIngestIndex(spark, "acc_ing_buckets",
        "acc_ing_shingles", DedupOps.hashedFrame(probeSet), 0.8)
        .collect().map(_.toString).sorted.toSeq
      val viaReplay = DedupOps.probeIngestFrames(spark, cur,
        DedupOps.hashedFrame(probeSet), 0.8)
        .collect().map(_.toString).sorted.toSeq
      assert(viaIndex == viaReplay,
        s"grown index probe != rebuilt-state probe (${viaIndex.size}/${viaReplay.size})")
      cur.unpersist(): Unit
    } finally {
      spark.sql("DROP TABLE IF EXISTS acc_ing_buckets")
      spark.sql("DROP TABLE IF EXISTS acc_ing_shingles")
    }
  }

  test("streaming vector ingest: near-dup probe + quantized append per batch == " +
      "rebuilt-layout greedy replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.queries.SimilarityOps
    val c = SimilarityOps.IvfCells
    val nprobe = SimilarityOps.IvfNprobe
    val tau = 0.99
    graft.functions.GraftFunctions.register(spark)
    // quantizer + grid frozen over the full corpus (production shape)
    val centroids = SimilarityOps.trainCentroids(spark, dir, c, 3)
    val stats = SimilarityOps.q8Stats(spark, dir)
    val all = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") >= 10 && col("embedding").isNotNull)
      .select(col("vec_id").as("nid"), col("embedding").as("v"))
    val corpus = all.filter(col("nid") % 5 =!= 3)
    val held = all.filter(col("nid") % 5 === 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(held.length >= 6)
    val path = java.nio.file.Files.createTempDirectory("graft-vecstream-").toString
    SimilarityOps.writeIvfCorpusQuantizedFrom(spark, corpus, path, centroids, stats)
    // 3 batches; batch 3 re-sends a batch-1 vector under a fresh id — it can
    // only be flagged if the loop actually grew the layout with batch 1
    val g = held.grouped(math.max(1, held.length / 3 + 1)).toSeq
    val resent = g.head.take(1).map { case (id, v) => (id + 1000000L, v) }
    val batches = g.init :+ (g.last ++ resent)
    val mem = MemoryStream[(Long, Array[Float])]
    val gotFlagged = scala.collection.mutable.ArrayBuffer[Seq[(Long, Long)]]()
    val gotAccepted = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q = StreamingOps.vectorIngestStream(spark, path,
      mem.toDS().toDF("nid", "v"), nprobe, tau) { (flagged, accepted, _) =>
      gotFlagged.synchronized {
        gotFlagged += flagged.select(col("nid"), col("dup_of"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        gotAccepted += accepted.collect().map(_.getLong(0)).sorted.toSeq
      }
    }
    try {
      batches.foreach { b => mem.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    // growth proof: the resent vector is a dup of its batch-1 original
    assert(gotFlagged.last.contains((resent.head._1, g.head.head._1)),
      s"resent vector not flagged against the grown layout: ${gotFlagged.last}")
    // greedy replay, REBUILDING the layout one-shot from (corpus + accepted
    // so far) before each batch — probe-per-batch over the appended layout
    // must equal the probe over a from-scratch build of the same state
    var acceptedSoFar = corpus.limit(0)
    for ((b, i) <- batches.zipWithIndex) {
      val p2 = java.nio.file.Files.createTempDirectory(s"graft-vecreplay-$i-").toString
      SimilarityOps.writeIvfCorpusQuantizedFrom(spark,
        corpus.unionByName(acceptedSoFar), p2, centroids, stats)
      val bdf = b.toSeq.toDF("nid", "v")
      val flagged = SimilarityOps.probeVectorDups(spark, p2, bdf, nprobe, tau)
      val fl = flagged.select(col("nid"), col("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(gotFlagged(i) == fl,
        s"batch $i flagged diverged:\nstream=${gotFlagged(i)}\nreplay=$fl")
      val accepted = bdf.join(flagged.select(col("nid")), Seq("nid"), "left_anti")
      assert(gotAccepted(i) == accepted.collect().map(_.getLong(0)).sorted.toSeq,
        s"batch $i accepted diverged")
      acceptedSoFar = acceptedSoFar.unionByName(accepted).localCheckpoint(true)
    }
  }

  test("streaming decontamination gate converges to the one-shot batch gate (exact, batching-invariant)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.queries.DedupOps
    // eval benchmark = the %97 residue class (d60's convention); incoming
    // stream = the train side
    val evalShingles = DedupOps.evalShingles(spark, dir, 97, 0)
    val incoming = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val gotBad = scala.collection.mutable.ArrayBuffer[Long]()
    val gotClean = scala.collection.mutable.ArrayBuffer[Long]()
    val q = StreamingOps.decontamGateStream(spark, evalShingles,
      mem.toDS().toDF("doc_id", "text")) { (bad, clean, _) =>
      gotBad.synchronized { gotBad ++= bad.collect().map(_.getLong(0)) }
      gotClean.synchronized { gotClean ++= clean.collect().map(_.getLong(0)) }
    }
    try {
      incoming.grouped(math.max(1, incoming.length / 3 + 1)).foreach { b =>
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // batch truth: d60's flagged doc set (same eval class, width 3)
    val expectedBad = DedupOps.decontaminate(spark, dir, 3)
      .collect().map(_.getLong(0)).toSet
    assert(gotBad.nonEmpty && gotClean.nonEmpty, "gate scenario degenerate")
    assert(gotBad.toSet == expectedBad,
      s"gate flags != batch d60: missed ${expectedBad.diff(gotBad.toSet).size}, " +
        s"extra ${gotBad.toSet.diff(expectedBad).size}")
    // exactness both ways: clean ∪ flagged = incoming, disjoint
    assert(gotBad.toSet.intersect(gotClean.toSet).isEmpty)
    assert(gotBad.toSet.union(gotClean.toSet) == incoming.map(_._1).toSet)
  }

  test("streaming ingestion dedup over a stored corpus index converges to the one-shot batch probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.queries.DedupOps
    DedupOps.writeIngestIndex(spark, dir,
      "stream_ing_buckets", "stream_ing_shingles", numBuckets = 4)
    try {
      val incoming = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % DedupOps.IngestMod === DedupOps.IngestResidue)
        .select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(incoming.nonEmpty)
      val mem = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ArrayBuffer[String]()
      val q = StreamingOps.ingestDedupStream(spark, "stream_ing_buckets",
        "stream_ing_shingles", mem.toDS().toDF("doc_id", "text"), 0.8) {
        (res, _) => got.synchronized { got ++= res.collect().map(_.toString) }
      }
      // 3 micro-batches: per-doc results depend only on the static corpus,
      // so the union must equal the one-shot probe of all incoming docs
      try {
        incoming.grouped(math.max(1, incoming.length / 3 + 1)).foreach { b =>
          mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val expected = DedupOps.probeIngestIndex(spark, "stream_ing_buckets",
        "stream_ing_shingles",
        DedupOps.hashedFrame(incoming.toSeq.toDF("doc_id", "text")), 0.8)
        .collect().map(_.toString)
      assert(got.nonEmpty, "stream probe flagged nothing — scenario degenerate")
      assert(got.sorted.toSeq == expected.sorted.toSeq,
        s"stream union (${got.size}) != one-shot probe (${expected.length})")
    } finally {
      spark.sql("DROP TABLE IF EXISTS stream_ing_buckets")
      spark.sql("DROP TABLE IF EXISTS stream_ing_shingles")
    }
  }
}
