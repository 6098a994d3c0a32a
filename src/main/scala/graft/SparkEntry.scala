package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupOps, MultimodalOps, Relational, SimilarityOps, TextOps, UdfOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories (each module = one SURVEY §2
  * operator family) into the single map the driver's Verify/Bench harness
  * consumes.
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (TextOps.queries, TextOps.oracles),
      (DedupOps.queries, DedupOps.oracles),
      (SimilarityOps.queries ++ SimilarityOps.queries2, SimilarityOps.oracles),
      (MultimodalOps.queries, MultimodalOps.oracles),
      (UdfOps.queries, UdfOps.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
