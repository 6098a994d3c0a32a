package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.SimilarityOps

/** Diagnostic: measured recall@5 of the approximate ANN paths (s57
  * hyperplane LSH, s60 IVF) against the exact brute-force s56 top-5, over a
  * parameter grid. This is how the shipped operating points
  * (`SimilarityOps.LshTables/LshBits`, `IvfCells/IvfNprobe`) were chosen
  * and how the spec floors in `PipelineOpsSpec` were set — measured, not
  * guessed. Results are recorded in SCALE.md.
  *
  * Usage: `sbt "runMain graft.tools.RecallProbe [sfDir]"`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(graft.SparkEntry.queries("s56")(spark, dir))
    println(s"[probe] dir=$dir exact-top5 pairs=${exact.size}")

    def recall(approx: Set[(Long, Long)]): Double =
      exact.intersect(approx).size.toDouble / exact.size

    for (tables <- Seq(4, 8, 12, 16, 24); bits <- Seq(3, 4, 5)) {
      val r = recall(pairs(SimilarityOps.annLsh(spark, dir, tables, bits)))
      println(f"[probe] lsh tables=$tables%2d bits=$bits  recall@5=$r%.3f")
    }
    for (c <- Seq(8, 16); np <- Seq(2, 4, 6, 8)) {
      val r = recall(pairs(SimilarityOps.annIvf(spark, dir, c, np, iters = 3)))
      println(f"[probe] ivf c=$c%2d nprobe=$np  recall@5=$r%.3f")
    }
    // int8-quantized rerank vs the float path at the same operating points:
    // the delta isolates the quantization loss (same cells, same probes)
    for (c <- Seq(8, 16); np <- Seq(4, 6, 8)) {
      val r = recall(pairs(SimilarityOps.annIvfQ8(spark, dir, c, np, iters = 3)))
      println(f"[probe] ivf-q8 c=$c%2d nprobe=$np  recall@5=$r%.3f")
    }
    spark.stop()
  }
}
