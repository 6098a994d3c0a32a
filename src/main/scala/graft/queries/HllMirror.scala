package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper

/** Exact DuckDB mirror of Spark's HLL++ (`approx_count_distinct`) for LONG
  * inputs — the r11 algorithm-mirror technique (murmur3/fmix64,
  * `SimilarityOps.scala`) applied to the one aggregate family that was still
  * `no_oracle` (q13 / d88).
  *
  * Spark's sketch (re-derived from the public Catalyst source,
  * `o.a.s.sql.catalyst.util.HyperLogLogPlusPlusHelper`; the reference exposes
  * the same aggregate through `approx_count_distinct`,
  * DirectExecSuite.scala:72-82) is fully deterministic and order-independent:
  *
  *   h   = xxHash64(value, seed = 42)
  *   idx = h >>> (64 - p)                      (first p bits)
  *   M[idx] = max(M[idx], nlz((h << p) | 2^(p-1)) + 1)
  *   E   = alphaM2 / (sum_j 2^-M[j])
  *   if V > 0 and (H <= THRESHOLDS(p-4) or E <= 2.5m): result = H
  *   else: result = if E < 5m then E - bias(E) else E    (p < 19)
  *   answer = Math.round(result)
  *
  * where V = #zero registers, H = m*ln(m/V), and bias(E) averages the K=6
  * nearest entries of the published empirical bias tables (binary-search
  * insertion point, then slide right while the leading edge is strictly
  * closer — the slide predicate is monotone because the table is sorted, so
  * it has the closed form "first L where dist(L+K) >= dist(L)").
  *
  * The bias tables are read at generation time from Spark's own class, so
  * the oracle can never drift from the engine. xxHash64-for-long is emitted
  * as DuckDB UBIGINT arithmetic (UHUGEINT products mod 2^64, validated
  * bit-equal against `xxhash64()` on the full sf0.01/sf0.1 partkey sets and
  * a 26-point cardinality sweep 5..500k covering every estimator branch).
  */
object HllMirror {

  private val M64 = "18446744073709551616" // 2^64

  // XXH64 primes (unsigned decimal).
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = BigInt("2870177450012600261")

  private def mul(a: String, b: String) =
    s"CAST((CAST($a AS UHUGEINT)*CAST($b AS UHUGEINT)) % $M64 AS UBIGINT)"
  private def rotl(x: String, r: Int) =
    s"(CAST((CAST($x AS UHUGEINT)*${BigInt(1) << r}) % $M64 AS UBIGINT) | ($x >> ${64 - r}))"
  private def add(a: String, b: String) =
    s"CAST((CAST($a AS UHUGEINT)+CAST($b AS UHUGEINT)) % $M64 AS UBIGINT)"

  /** Exact alphaM2 as computed by Spark (same double-op order). */
  def alphaM2(p: Int): Double = {
    val m = 1 << p
    p match {
      case 4 => 0.673d * m * m
      case 5 => 0.697d * m * m
      case 6 => 0.709d * m * m
      case _ => (0.7213d / (1.0d + 1.079d / m)) * m * m
    }
  }

  /** Spark-side HLL++ register derivation for LONG inputs: one row per
    * NON-ZERO register of the p-precision sketch over column `v` of `keyed`
    * (plus the group columns) — idx = xxhash64(v) >>> (64−p), mr = max rho.
    * `xxhash64(bigint)` is the exact hash `approx_count_distinct` applies
    * internally (XxHash64, seed 42), so these rows ARE the sketch state,
    * just transparent: mergeable by `max(mr)` per idx (associative,
    * duplicate- and order-blind) and engine-portable (no binary blob). The
    * d88 stored-partials pattern rides this: store per-batch register rows,
    * roll up any slice later by max-merge + [[estimateDf]], no rescans. */
  def registersDf(keyed: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(p >= 4 && p < 19, s"p out of the mirrored regime: $p")
    keyed
      // nulls are skipped, matching approx_count_distinct (and estimateSql's
      // contract) — xxhash64(NULL) returns the seed (42), so an unfiltered
      // null v would mint a phantom (idx, mr) register
      .filter(col("v").isNotNull)
      .select(groupCols.map(col) :+ expr("xxhash64(v)").as("h"): _*)
      .select(groupCols.map(col) ++ Seq(
        expr(s"shiftrightunsigned(h, ${64 - p})").as("idx"),
        // rho = nlz((h << p) | 2^(p-1)) + 1 = 65 - bitlen; Spark's bin()
        // renders negative longs as 64 two's-complement chars, so length
        // is exactly the unsigned bit length (the DuckDB mirror's idiom)
        expr(s"65 - length(bin(shiftleft(h, $p) | ${1L << (p - 1)}))").as("mr")): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("mr")).as("mr"))
  }

  /** Spark-side estimate from (g, idx, mr) register rows — the same
    * estimator branches as [[estimateSql]] (and as Spark's own
    * `HyperLogLogPlusPlusHelper.query`), expressed as DataFrame ops so a
    * stored-partials rollup can estimate WITHOUT an aggregate rescan:
    * harmonic mean over registers (absent registers contribute 2^0),
    * linear counting under the threshold, bias-corrected raw estimate via
    * the published K=6 nearest-neighbor bias tables (broadcast literal
    * frames — constant-bounded, ~200 rows). Group count is report-sized
    * (sources, batches), never corpus-sized. */
  def estimateDf(regs: DataFrame, p: Int): DataFrame = {
    require(p >= 4 && p < 19, s"p out of the mirrored regime: $p")
    val s = regs.sparkSession
    import s.implicits._
    val m = 1 << p
    val raw = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val bias = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    val thr = HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)
    val n = raw.length
    val k = HyperLogLogPlusPlusHelper.K // 6
    // bcast audit: BOUNDED — the published bias table, ~200 fixed rows
    val tbl = broadcast(raw.indices.map(i => (i, raw(i), bias(i)))
      .toDF("i", "raw", "bias"))
    // (lx, rl, rh): each table row with the entry K slots to its right —
    // the closed form of the "slide while the leading edge is closer" scan
    val cand = broadcast(raw.indices.map(lx =>
        (lx, raw(lx), if (lx + k < n) Some(raw(lx + k)) else None))
      .toDF("lx", "rl", "rh"))
    val hest = regs.groupBy(col("g"))
      .agg((sum(pow(lit(2.0), -col("mr"))) + (lit(m) - count(lit(1))))
        .as("zinv"), (lit(m) - count(lit(1))).as("zv"))
      .select(col("g"), col("zv"), (lit(alphaM2(p)) / col("zinv")).as("e"),
        when(col("zv") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zv"))).as("hlin"))
    val withNearest = hest.crossJoin(tbl)
      .groupBy(col("g"), col("zv"), col("e"), col("hlin"))
      .agg(sum(when(col("raw") < col("e"), 1).otherwise(0)).as("nearest"))
    val hlf = withNearest.crossJoin(cand)
      .filter(col("lx") >= greatest(col("nearest") - (k - 1), lit(0)) &&
        (col("lx") >= n - k ||
          (col("rh") - col("e")) * (col("rh") - col("e")) >=
            (col("rl") - col("e")) * (col("rl") - col("e"))))
      .groupBy(col("g"), col("zv"), col("e"), col("hlin"))
      .agg(min(col("lx")).as("lf"))
    hlf.crossJoin(tbl)
      .filter(col("i") >= col("lf") && col("i") < least(col("lf") + k, lit(n)))
      .groupBy(col("g"), col("zv"), col("e"), col("hlin"))
      .agg(avg(col("bias")).as("b"))
      .select(col("g"), floor(
        when(col("zv") > 0 && (col("hlin") <= thr || col("e") <= 2.5 * m),
          col("hlin"))
          .otherwise(when(col("e") < 5.0 * m, col("e") - col("b"))
            .otherwise(col("e"))) + 0.5).cast(LongType).as("est"))
  }

  /** DuckDB SQL yielding (g, est) = (group, Spark approx_count_distinct
    * estimate) for precision `p`. `srcSql` must yield columns (g, v) with v
    * BIGINT; nulls are skipped and duplicates collapsed (as the sketch
    * does). The seed is HLL++'s fixed 42.
    */
  def estimateSql(srcSql: String, p: Int): String = {
    require(p >= 4 && p < 19, s"mirror covers the p<19 bias-table regime, got $p")
    val m = 1 << p
    val raw = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val bias = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    val thr = HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)
    val n = raw.length
    val k = HyperLogLogPlusPlusHelper.K // 6
    val vals = raw.indices.map(i => s"(${i},${raw(i)},${bias(i)})").mkString(",")
    val init = (P5 + 42 + 8).toString // hash = seed + PRIME64_5 + 8 (one long)
    s"""WITH hsrc AS (SELECT DISTINCT g,
       |    CAST(((CAST(v AS HUGEINT) + $M64) % $M64) AS UBIGINT) AS v
       |  FROM ($srcSql) WHERE v IS NOT NULL),
       |hs1 AS (SELECT g, v, ${mul("v", P2)} AS k1 FROM hsrc),
       |hs2 AS (SELECT g, xor(CAST($init AS UBIGINT), ${mul(rotl("k1", 31), P1)}) AS acc FROM hs1),
       |hs3 AS (SELECT g, ${add(mul(rotl("acc", 27), P1), P4)} AS acc FROM hs2),
       |hf1 AS (SELECT g, xor(acc, acc>>33) AS a FROM hs3),
       |hf2 AS (SELECT g, ${mul("a", P2)} AS b FROM hf1),
       |hf3 AS (SELECT g, xor(b, b>>29) AS c FROM hf2),
       |hf4 AS (SELECT g, ${mul("c", P3)} AS d FROM hf3),
       |hfin AS (SELECT g, xor(d, d>>32) AS h FROM hf4),
       |hregs AS (SELECT g, h >> ${64 - p} AS idx,
       |    MAX(65 - length(bin(CAST((CAST(h AS UHUGEINT)*$m) % $M64 AS UBIGINT) | ${1L << (p - 1)}))) AS mr
       |  FROM hfin GROUP BY g, idx),
       |hagg AS (SELECT g, SUM(POWER(2.0, -mr)) + ($m - COUNT(*)) AS zinv,
       |    $m - COUNT(*) AS zv FROM hregs GROUP BY g),
       |hest AS (SELECT g, zv, ${alphaM2(p)} / zinv AS e,
       |    CASE WHEN zv > 0 THEN $m.0 * ln($m.0 / zv) ELSE NULL END AS hlin FROM hagg),
       |htbl AS (SELECT * FROM (VALUES $vals) AS t(i, raw, bias)),
       |hip AS (SELECT hest.g, hest.e, COUNT(*) FILTER (htbl.raw < hest.e) AS nearest
       |  FROM hest, htbl GROUP BY hest.g, hest.e),
       |hlow AS (SELECT g, e, GREATEST(nearest - ${k - 1}, 0) AS low0 FROM hip),
       |hlf AS (SELECT l.g, MIN(cand.lx) AS lf FROM hlow l,
       |    (SELECT t1.i AS lx, t1.raw AS rl, t2.raw AS rh
       |       FROM htbl t1 LEFT JOIN htbl t2 ON t2.i = t1.i + $k) cand
       |  WHERE cand.lx >= l.low0 AND (cand.lx >= ${n - k}
       |    OR (cand.rh - l.e)*(cand.rh - l.e) >= (cand.rl - l.e)*(cand.rl - l.e))
       |  GROUP BY l.g),
       |hbias AS (SELECT hlf.g, AVG(htbl.bias) AS b FROM hlf, htbl
       |  WHERE htbl.i >= hlf.lf AND htbl.i < LEAST(hlf.lf + $k, $n) GROUP BY hlf.g),
       |hfinal AS (SELECT hest.g, hest.zv, hest.e, hest.hlin,
       |    CASE WHEN hest.e < ${5.0 * m} THEN hest.e - hbias.b ELSE hest.e END AS ebc
       |  FROM hest JOIN hbias ON hest.g = hbias.g)
       |SELECT g, CAST(floor(
       |    CASE WHEN zv > 0 AND (hlin <= $thr OR e <= ${2.5 * m}) THEN hlin ELSE ebc END
       |    + 0.5) AS BIGINT) AS est
       |FROM hfinal""".stripMargin
  }
}
