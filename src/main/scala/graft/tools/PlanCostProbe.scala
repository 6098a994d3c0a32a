package graft.tools

import org.apache.spark.sql.SparkSession

/** r16 disposable probe: per-query planning cost (DataFrame build +
  * analysis + optimization + physical planning, no execution) vs full
  * noop-sink execution, on warm paths. */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
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
    var totPlan = 0.0; var totExec = 0.0
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      try {
        // warm both paths once
        fn(spark, sfDir).queryExecution.executedPlan
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val p = (1 to 3).map(_ =>
          ms(fn(spark, sfDir).queryExecution.executedPlan: Unit)).min
        val e = (1 to 3).map(_ =>
          ms(fn(spark, sfDir).write.format("noop").mode("overwrite").save())).min
        totPlan += p; totExec += e
        println(f"[plancost] $n%-8s plan=$p%7.1f exec=$e%8.1f frac=${p / e}%5.2f")
      } catch { case ex: Throwable =>
        println(s"[plancost] $n FAILED: ${ex.getMessage}") }
    }
    println(f"[plancost] TOTAL plan=$totPlan%9.1f exec=$totExec%9.1f")
    spark.stop()
  }
}
