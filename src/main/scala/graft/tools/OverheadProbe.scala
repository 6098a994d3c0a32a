package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-16 measurement aid (guide §1): break a warm query sample into its
  * driver-side phases — table-load (parquet footer/schema), planning
  * (analysis+optimization+physical), and execution — to size the fixed
  * per-invocation overhead every bench sample pays before any task runs.
  *
  *   sbt "runMain graft.tools.OverheadProbe q01 [sfDir] [reps]"
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def ms(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e6
    }
    val fn = graft.SparkEntry.queries(name)

    // warm everything once
    (1 to 2).foreach(_ => fn(spark, sfDir).write.format("noop").mode("overwrite").save())

    (1 to reps).foreach { i =>
      var df: DataFrame = null
      val tBuild = ms { df = fn(spark, sfDir) }            // includes Tables.load footer reads
      val tPlan = ms { df.queryExecution.executedPlan }    // analysis + optimization + physical
      val tExec = ms { df.write.format("noop").mode("overwrite").save() } // incl. AQE replans + jobs
      println(f"[probe] $name rep$i build=${tBuild}%8.1f ms  plan=${tPlan}%8.1f ms  exec=${tExec}%8.1f ms")
    }

    // same, but with the table DataFrames pre-built once (simulating a
    // memoized Tables.load): how much of "build" is footer re-reads?
    val t0 = System.nanoTime()
    val pre = graft.Tables.names.map(n => n -> graft.Tables.load(spark, sfDir, n)).toMap
    println(f"[probe] one-time load of all 10 tables: ${(System.nanoTime()-t0)/1e6}%.1f ms")
    val t1 = System.nanoTime()
    val pre2 = graft.Tables.names.map(n => n -> graft.Tables.load(spark, sfDir, n)).toMap
    println(f"[probe] second load of all 10 tables: ${(System.nanoTime()-t1)/1e6}%.1f ms (${pre2.size})")
    val _ = pre
    spark.stop()
  }
}
