package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.GraftFunctions

/** Deduplication operators for LLM-data pipelines: exact (hash group-by),
  * exact-Jaccard similarity join (inverted shingle index), MinHash+LSH
  * (signature → banded bucket join → exact verify), SimHash (banded hamming
  * buckets). All pair generation goes through shuffle-on-key joins — never a
  * driver-side collect — so each scales by adding executors. The quadratic
  * all-pairs fallbacks are deliberately absent; candidate pairs only ever come
  * from co-occurrence in an (inverted-index or LSH) bucket.
  */
object DedupOps {

  /** doc_id + distinct word-3-gram shingles (as strings), empty when < 3
    * tokens — mirrored exactly by the DuckDB oracle's list comprehension. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), array_distinct(
        when(size(col("toks")) >= 3,
          expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
          .otherwise(expr("array()").cast(ArrayType(StringType)))).as("shingles"))

  /** Exact-Jaccard pairs via inverted index: explode shingles, self-join on
    * the (hashed) shingle, count co-occurrences, filter by threshold. Exact —
    * any pair with a common shingle co-occurs in >= 1 bucket (no false
    * negatives), so it can be oracle-checked. At petabyte scale you'd add
    * prefix filtering to cut the index; the join shape is already right. */
  private def jaccardPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    val sh = shingled(s, dir)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("ida"), col("n").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("n").as("nb")), "idb")
      .select(col("ida"), col("idb"),
        (col("c").cast(DoubleType) / (col("na") + col("nb") - col("c"))).as("jac"))
      .filter(col("jac") >= threshold)
      .orderBy(col("ida"), col("idb"))
  }

  private def oracleJaccard(threshold: Double): String =
    s"""WITH sh AS (
       | SELECT doc_id, unnest(list_distinct(
       |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
       | FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS s FROM documents)
       |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |common AS (
       | SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c
       | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       | GROUP BY 1, 2)
       |SELECT ida, idb, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
       |FROM common
       | JOIN sizes sa ON sa.doc_id = ida
       | JOIN sizes sb ON sb.doc_id = idb
       |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $threshold
       |ORDER BY ida, idb""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: one-row corpus summary (total vs content-distinct rows).
    "d50_dedup_exact" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(md5(col("text"))).as("n_unique"))
    }),

    // Exact near-dup pairs (inverted-index similarity join), J >= 0.4.
    "d52_jaccard_pairs" -> ((s, dir) => jaccardPairs(s, dir, 0.4)),

    // MinHash + LSH: 128-hash signature (custom expression), 32 bands x 4
    // rows -> candidates from band-bucket co-occurrence, then exact-Jaccard
    // verify at J >= 0.8. P(miss) = (1-J^4)^32 <= 6e-8 at the threshold, so
    // the exact oracle still applies; at scale only the candidates (not all
    // pairs) are verified.
    "d53_minhash_lsh" -> ((s, dir) => {
      GraftFunctions.register(s)
      val numHashes = 128; val bands = 32; val r = 4
      val sig = shingled(s, dir)
        .select(col("doc_id"),
          expr("transform(shingles, x -> xxhash64(x))").as("hs"))
        .select(col("doc_id"), expr(s"graft_minhash(hs, $numHashes, 42)").as("sig"),
          col("hs"))
      // band hash: one row per (band, bucket)
      val buckets = sig.select(col("doc_id"), col("hs"),
          posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
            s"xxhash64(b, slice(sig, b * $r + 1, $r)))")).as(Seq("band", "bucket")))
      val cand = buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
          col("a.hs").as("hsa"), col("b.hs").as("hsb"))
        .distinct()
      cand.select(col("ida"), col("idb"),
          (size(array_intersect(col("hsa"), col("hsb"))).cast(DoubleType) /
            size(array_union(col("hsa"), col("hsb")))).as("jac"))
        .filter(col("jac") >= 0.8)
        .orderBy(col("ida"), col("idb"))
    }),

    // SimHash near-dup: 64-bit signature over tokens, 8 bands x 8 bits
    // (pigeonhole-complete for hamming <= 7), verified hamming <= 6.
    // Signature is engine-specific => rows-only driver check; the ScalaTest
    // spec brute-force-verifies completeness on sf0.001.
    "d54_simhash" -> ((s, dir) => {
      GraftFunctions.register(s)
      val sh = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("graft_simhash(split(trim(text), '\\\\s+'))").as("sh"))
      // band value must be a pure bit extract (shiftrightunsigned + mask):
      // div/% on the signed long borrows from lower bits and misses pairs.
      val buckets = sh.select(col("doc_id"), col("sh"),
        posexplode(expr("transform(sequence(0, 7), b -> " +
          "shiftrightunsigned(sh, b * 8) & 255L)"))
          .as(Seq("band", "bucket")))
      buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
          expr("bit_count(a.sh ^ b.sh)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
        .orderBy(col("ida"), col("idb"))
    })
  )

  val oracles: Map[String, String] = Map(
    "d50_dedup_exact" ->
      "SELECT count(*) AS n_rows, count(DISTINCT md5(text)) AS n_unique FROM documents",
    "d52_jaccard_pairs" -> oracleJaccard(0.4),
    "d53_minhash_lsh" -> oracleJaccard(0.8)
  )
}
