package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r16: isolate where q01-style exec time goes — which piece of the agg. */
object ExecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // count tasks + task time via listener
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val nJobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskTime.addAndGet(e.taskInfo.duration); nTasks.incrementAndGet(): Unit
      }
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        nJobs.incrementAndGet(): Unit
      }
    })

    def ms(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e6
    }
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    def dsum(c: org.apache.spark.sql.Column, scale: Int) =
      sum(c.cast(DecimalType(18, scale))).cast(DoubleType)
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val filt = li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
    val gb = filt.groupBy(col("l_returnflag"), col("l_linestatus"))

    val cases = Seq[(String, org.apache.spark.sql.DataFrame)](
      "count_only" -> gb.agg(count(lit(1)).as("n")),
      "sum_double" -> gb.agg(sum(col("l_quantity")).as("s")),
      "one_dsum" -> gb.agg(dsum(col("l_extendedprice"), 2).as("s")),
      "three_dsum" -> gb.agg(
        dsum(col("l_extendedprice"), 2).as("a"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("b"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("c")),
      "full_noorder" -> gb.agg(sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("a"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("b"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("c"),
        count(lit(1)).as("n")),
      "full_order" -> gb.agg(sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("a"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("b"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("c"),
        count(lit(1)).as("n")).orderBy(col("l_returnflag"), col("l_linestatus"))
    )
    cases.foreach { case (label, df) =>
      (1 to 2).foreach(_ => noop(df)) // warm
      taskTime.set(0); nTasks.set(0); nJobs.set(0)
      val w = (1 to 3).map(_ => ms(noop(df))).min
      println(f"[exec] $label%-14s wall=${w}%7.1f ms  (3 runs: jobs=${nJobs.get}, tasks=${nTasks.get}, taskTime=${taskTime.get} ms)")
    }
    spark.stop()
  }
}
