package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side surface. The reference has no sinks at all (SURVEY §2.1: the
  * only "sink" is collecting to the driver or re-registering a view); at
  * 100 TB the sink IS the product, so this module pins the idioms:
  * hive-style partitioned parquet for pruning on read, and an explicit
  * repartition-by-partition-columns before the write so each task writes one
  * file per partition value instead of `tasks × partitions` small files.
  */
object Sinks {

  /** Partitioned parquet write (dynamic partition columns). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Plain parquet with an explicit target file count (compaction). */
  def writeCompacted(df: DataFrame, path: String, numFiles: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(numFiles).write.mode(mode).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed managed table: pre-shuffles once at write so joins/aggs on the
    * bucket key need NO exchange at read — the canonical way to co-locate a
    * 100 TB fact table with its dimensions for repeated joins.
    * Requires a managed table (bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
}
