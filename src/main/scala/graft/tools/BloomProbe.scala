package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.DedupOps

/** Measure d72's scale claim: the Bloom prefilter's selectivity on the
  * train shingle stream (rows that would have entered the d60 join vs rows
  * that survive to d72's verify join) and warm wall time of both paths.
  *
  * Usage: `sbt "runMain graft.tools.BloomProbe [sfDir]"`. Results table in
  * SCALE.md.
  */
object BloomProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mBits = 1L << 18
    val k = 5
    val sh = DedupOps.hashedDocs(spark, dir, 3)
      .select(col("doc_id"), explode(col("hs")).as("sh"))
    val ev = sh.filter(col("doc_id") % 97 === 0).select(col("sh"))
    val evDistinct = ev.distinct().count()
    val words = DedupOps.bloomBuild(ev, mBits, k)
    val tr = sh.filter(col("doc_id") % 97 =!= 0)
    val total = tr.count()
    val pass = tr.filter(DedupOps.bloomProbe(words, mBits, k)).count()
    val truly = tr.join(ev.distinct(), "sh").count()
    println(f"[bloom] eval distinct shingles n=$evDistinct%d  m=$mBits%d bits " +
      f"(${mBits / 8192}%d KiB)  k=$k%d")
    println(f"[bloom] train shingles total=$total%d  bloom-pass=$pass%d " +
      f"(${100.0 * pass / total}%.2f%%)  true-match rows=$truly%d")
    println(f"[bloom] join-input reduction: ${total.toDouble / pass}%.1fx " +
      f"(fp overhead ${(pass - truly).toDouble / math.max(total - truly, 1)}%.5f)")

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then min of 3 interleaved
    DedupOps.decontaminate(spark, dir, 3).collect()
    DedupOps.decontaminateBloom(spark, dir, 3, mBits, k).collect()
    val (tJoin, tBloom) = (1 to 3).map { _ =>
      (time(DedupOps.decontaminate(spark, dir, 3).collect()),
        time(DedupOps.decontaminateBloom(spark, dir, 3, mBits, k).collect()))
    }.reduce((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2)))
    println(f"[bloom] warm min-of-3: d60 join=$tJoin%.2f s  d72 bloom=$tBloom%.2f s")
    spark.stop()
  }
}
