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
}
