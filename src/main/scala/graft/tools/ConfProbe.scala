package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 disposable A/B: per-shuffle-round overhead under runtime-settable
  * conf combos, on real sf0.1 shapes (1-shuffle agg, 2-shuffle join+agg,
  * window). Local iteration aid only. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val ord = graft.Tables.load(spark, sfDir, "orders")
    def battery(): Seq[(String, () => Unit)] = Seq(
      "agg1" -> (() => li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)), sum(col("l_quantity").cast("long")))
        .write.format("noop").mode("overwrite").save()),
      "join2" -> (() => ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()),
      "window" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
        li.select(col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).as("rn"))
          .write.format("noop").mode("overwrite").save()
      }),
      "agg_high_card" -> (() => li.groupBy(col("l_partkey"))
        .agg(count(lit(1)), max(col("l_shipdate")))
        .write.format("noop").mode("overwrite").save()))
    def run(label: String, confs: Map[String, String]): Unit = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val b = battery()
      b.foreach { case (_, f) => f(); f() } // warm
      val res = b.map { case (n, f) =>
        val xs = (1 to 5).map(_ => ms(f()))
        n -> xs.min
      }
      println(f"[conf] $label%-40s " +
        res.map { case (n, t) => f"$n=$t%6.0f" }.mkString(" "))
      saved.foreach { case (k, vo) =>
        vo.fold(spark.conf.unset(k))(v => spark.conf.set(k, v)) }
    }
    run("baseline(aqe,32p)", Map())
    run("parallelismFirst=false", Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false"))
    run("parallelismFirst=false,adv=64m", Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"))
    run("aqe off", Map("spark.sql.adaptive.enabled" -> "false"))
    run("shufflehash pref", Map(
      "spark.sql.join.preferSortMergeJoin" -> "false"))
    run("localReaderOff", Map(
      "spark.sql.adaptive.localShuffleReader.enabled" -> "false"))
    run("combo pf=false,adv64,shufflehash", Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
      "spark.sql.join.preferSortMergeJoin" -> "false"))
    run("baseline again", Map())
    spark.stop()
  }
}
