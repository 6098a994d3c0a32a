package graft.tools

import org.apache.spark.sql.SparkSession

/** r16: pure per-job / per-action overhead in local mode. */
object ExecProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e6
    }
    def bench(label: String, reps: Int)(fn: => Unit): Unit = {
      (1 to 3).foreach(_ => fn)
      val xs = (1 to reps).map(_ => ms(fn))
      println(f"[exec2] $label%-34s min=${xs.min}%7.1f  med=${xs.sorted.apply(reps / 2)}%7.1f ms")
    }
    val sc = spark.sparkContext
    bench("rdd 1-task count", 10)(sc.parallelize(1 to 10, 1).count(): Unit)
    bench("rdd 32-task count", 10)(sc.parallelize(1 to 320, 32).count(): Unit)
    bench("df range(100).count", 10)(spark.range(100).count(): Unit)
    val r = spark.range(100)
    bench("noop write range(100) (reused df)", 10)(r.write.format("noop").mode("overwrite").save())
    bench("noop write range(100) (fresh df)", 10)(spark.range(100).write.format("noop").mode("overwrite").save())
    val shuffled = spark.range(10000).groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k")).count()
    bench("noop shuffle agg (AQE, reused)", 10)(shuffled.write.format("noop").mode("overwrite").save())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    bench("noop shuffle agg (noAQE, reused)", 10)(shuffled.write.format("noop").mode("overwrite").save())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val li = graft.Tables.load(spark, args.headOption.getOrElse("/root/testdata/sf0.1"), "lineitem")
    bench("noop lineitem full scan", 10)(li.write.format("noop").mode("overwrite").save())
    bench("noop lineitem 1col scan", 10)(li.select("l_quantity").write.format("noop").mode("overwrite").save())
    bench("lineitem.count", 10)(li.count(): Unit)
    spark.stop()
  }
}
