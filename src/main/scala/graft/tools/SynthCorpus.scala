package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Writes a PLAIN ×K replication of the documents table (every doc appears
  * K times under a distinct doc_id) — the corpus for the ×10 correctness
  * spot-gate (tools/x10_gate.sh): frequency-dependent operators (df
  * thresholds, vocab min-counts, repeated-window counts, heavy-hitter
  * survival) see all their counts grow ×K while the DuckDB oracle recomputes
  * over the very same rows, so a fixed-threshold or overflow bug that sf0.1
  * can't expose (the d81 df≥5 class — it stripped 99.8% at 5000 docs)
  * breaks the hash-match instead of shipping. Plain replication is the
  * harsh mode on purpose: shared vocabulary means corpus-level counts
  * really scale (ScaleProbe's suffixed mode isolates per-replica structure
  * for PERF rows — different tool, different question).
  *
  * Usage: `sbt "runMain graft.tools.SynthCorpus <k> <baseSfDir> <outDir>"`.
  */
object SynthCorpus {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val baseDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "/tmp/graft_x10"
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-synth")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$baseDir/documents.parquet")
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * 100000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(cpus)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"[synth] wrote plain x$k documents to $outDir/documents.parquet")
    spark.stop()
  }
}
