package graft

import org.apache.spark.sql.SparkSession

/** Disposable timing probe (see verify skill: package-boundary drives). */
object DriveTmp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("d82", "d83", "s61", "t58", "q56", "s58", "q69", "t57",
        "q83", "q84", "q85", "q86", "q87", "d86", "t70"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // cold
      val best = (1 to 3).map(_ => once()).min
      println(f"[time] $n%-6s $best%.3f s")
    }
    spark.stop()
  }
}
