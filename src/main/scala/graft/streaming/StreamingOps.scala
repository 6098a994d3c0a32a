package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events table — capability the
  * reference lacks entirely (SURVEY §2.9: absent). Batch and stream share the
  * same declarative plans (`window()` aggregation), so the streaming results
  * converge to the batch answers — asserted in StreamingSpec.
  *
  * Scale notes: windowed counts are partial-aggregated per micro-batch and
  * merged in the state store (no per-event shuffle amplification); the
  * sessionization state is per-user (NoTimeout here for finite replay; production
  * streams add EventTimeTimeout so the watermark evicts idle keys).
  */
/** Per-user sessionization state (top-level so the Catalyst encoder can
  * construct it in generated code). */
case class SessState(lastTsMicros: Long, nSessions: Long, nEvents: Long)

object StreamingOps {

  /** Schema of the events parquet with ts as long nanos (the file's physical
    * type) — converted to timestamp after read, same as Tables.load. */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over the events parquet file. The file-stream source
    * only accepts directories, so the (read-only) single file is exposed via
    * a symlinked staging directory — memoized per source dir (repeated calls
    * would otherwise litter /tmp) and removed on JVM exit. Note the
    * nanosAsLong conf is session-wide, same as Tables.load. */
  private val stagingDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staging = stagingDirs.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-events-")
      java.nio.file.Files.createSymbolicLink(
        p.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      p.resolve("events.parquet").toFile.deleteOnExit()
      p.toFile.deleteOnExit()
      p
    })
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(staging.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Tumbling-window counts per event type, 10-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Stateful sessionization via mapGroupsWithState: per-user session count
    * with a 30-minute gap, equivalent to the batch session_window query
    * (q45_sessionize). Events inside one micro-batch are sorted per group;
    * across batches the state carries (lastTs, counts). State here is
    * per-user and never times out (NoTimeout) — right for the finite-replay
    * use; an unbounded-key production stream would use EventTimeTimeout so
    * the watermark can evict idle keys. */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val gapMicros = 30L * 60 * 1000 * 1000
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessState, (Long, Long, Long)](GroupStateTimeout.NoTimeout) {
        case (userId, it, state: GroupState[SessState]) =>
          val sorted = it.map(_._2).toArray.sorted
          var s = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { t =>
            val newSession = s.lastTsMicros == Long.MinValue || t - s.lastTsMicros >= gapMicros
            s = SessState(t, s.nSessions + (if (newSession) 1 else 0), s.nEvents + 1)
          }
          state.update(s)
          (userId, s.nSessions, s.nEvents)
      }
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** Stream-stream INNER JOIN with event-time range bounds: click→purchase
    * attribution per user within 30 minutes. Both sides carry watermarks and
    * the join condition bounds event time in both directions, so the state
    * store provably evicts rows once the watermark passes — the only
    * stream-stream join shape that is safe on an unbounded stream. Append
    * mode; identical semantics to the batch theta-join (StreamingSpec
    * asserts convergence). */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_ts"), col("p_ts"))
  }

  /** Run a streaming aggregation to completion against the (finite) file
    * source via a named memory sink; returns the sink table name. */
  def runToMemorySink(df: DataFrame, name: String, mode: OutputMode): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
