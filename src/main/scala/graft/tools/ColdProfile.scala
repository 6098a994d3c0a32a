package graft.tools

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession

/** Where does the COLD suite's time go? One fresh-JVM pass over the full
  * contract inventory, splitting each query into Catalyst phases
  * (parse+analyze / optimize / physical planning) and execution, plus the
  * process-wide Janino compilation counters (count + accumulated ms from
  * `CodegenMetrics`, which Spark increments only on codegen-cache MISSES —
  * repeated operator shapes that hit the 100-entry generated-class cache
  * don't re-compile and don't advance the counter).
  *
  * Usage: `sbt "runMain graft.tools.ColdProfile [sfDir]"`. Results table
  * lives in BASELINE.md (cold-path section).
  */
object ColdProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def codegenSnap(): (Long, Long) = (
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      // Histogram keeps a decaying reservoir; only the COUNT is exact. The
      // "est total" printed at the end multiplies that exact count by the
      // reservoir mean — an estimate, labeled as such in the output.
      CodegenMetrics.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount)

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    var tConstruct = 0.0; var tOptimize = 0.0; var tPlan = 0.0; var tExec = 0.0
    val perQuery = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Double, Double)]()
    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    names.foreach { n =>
      try {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.analyzed
        val c = sec(t0)
        val t1 = System.nanoTime()
        df.queryExecution.optimizedPlan
        val o = sec(t1)
        val t2 = System.nanoTime()
        df.queryExecution.executedPlan
        val p = sec(t2)
        val t3 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val e = sec(t3)
        tConstruct += c; tOptimize += o; tPlan += p; tExec += e
        perQuery += ((n, c, o, p, e))
      } catch {
        case ex: Throwable => System.err.println(s"[coldprof] $n FAILED: ${ex.getMessage}")
      }
    }
    val (nCompile, nClasses) = codegenSnap()
    val compileMsTotal = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot
    println(f"[coldprof] queries=${perQuery.size} construct+analyze=$tConstruct%.1f s " +
      f"optimize=$tOptimize%.1f s plan=$tPlan%.1f s exec=$tExec%.1f s")
    println(f"[coldprof] janino: $nCompile compilations (cache misses), " +
      f"$nClasses classes, snapshot mean ${compileMsTotal.getMean}%.1f ms " +
      f"=> est total ${nCompile * compileMsTotal.getMean / 1000}%.1f s (reservoir estimate)")
    perQuery.sortBy(-_._5).take(10).foreach { case (n, c, o, p, e) =>
      println(f"[coldprof] slow-exec $n%s c=$c%.2f o=$o%.2f p=$p%.2f e=$e%.2f")
    }
    perQuery.sortBy(q => -(q._2 + q._3 + q._4)).take(10).foreach { case (n, c, o, p, e) =>
      println(f"[coldprof] slow-plan $n%s c=$c%.2f o=$o%.2f p=$p%.2f e=$e%.2f")
    }
    spark.stop()
  }
}
