package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.GraftFunctions

/** Text-analysis operators for LLM-data pipelines: quality stats, token
  * counting, language ID, content fingerprinting. All are per-row scalar
  * pipelines — no shuffle, fully codegen-able, embarrassingly parallel at
  * 100 TB (the scan is the only cost; stats push down to the parquet reader's
  * column pruning: only `doc_id`/`text` are read).
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Quality scoring: length / token / character-class ratios.
    "t46_text_stats" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        length(col("text")).as("n_char"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        length(regexp_replace(col("text"), "[^aeiou]", "")).as("n_vowels"),
        (length(regexp_replace(col("text"), "[^ ]", "")).cast(DoubleType) /
          nullif(length(col("text")), lit(0))).as("space_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace tokens + BPE-ish word/punct regex + the
    // chars/4 heuristic LLM-token estimate.
    "t47_token_count" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_ws"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0))).as("n_bpeish"),
        ceil(length(col("text")) / 4.0).as("n_est"))
        .orderBy(col("doc_id"))
    }),

    // Language ID via stopword-profile heuristic (custom Catalyst
    // expression graft_lang_id; engine-specific => rows-only check).
    "t48_lang_id" -> ((s, dir) => {
      GraftFunctions.register(s)
      docs(s, dir)
        .select(col("doc_id"), expr("graft_lang_id(text)").as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // Rolling-hash (Rabin-Karp) fingerprint per document + agreement count
    // across the corpus (identical fingerprints = near-identical content).
    "t49_fingerprint" -> ((s, dir) => {
      GraftFunctions.register(s)
      val fp = docs(s, dir)
        .select(col("doc_id"), expr("graft_fingerprint(text, 16)").as("fp"))
      fp.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("first_doc"))
    })
  )

  val oracles: Map[String, String] = Map(
    "t46_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_char,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        | CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS INTEGER) AS n_vowels,
        | CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / nullif(length(text), 0) AS space_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t47_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_ws,
        | CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER) AS n_bpeish,
        | CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_est
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
