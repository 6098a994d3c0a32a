package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.GraftFunctions

/** UDF/UDAF/UDTF surface (SURVEY §2.10). The reference exposes Hive
  * simple/generic UDFs, UDAFs and UDTFs through its catalog (reference
  * `DirectSessionCatalog.makeFunctionExpression:62-112`); the idiomatic
  * Spark-4 equivalents are `spark.udf.register` scalars,
  * `Aggregator[IN,BUF,OUT]` aggregates (registered via `udaf`), and
  * generator-backed table functions (`explode` over an array-producing
  * expression = LATERAL VIEW).
  *
  * Note the scalar UDF is deliberately trivial arithmetic: UDFs are opaque to
  * Catalyst (no pushdown through them), so the engine's guidance is builtin
  * functions first, custom Expressions second, UDFs last — this module exists
  * to prove the surface works, not to encourage it.
  */
object UdfOps {

  /** Exact integer sum-of-squares over an integer-valued double column —
    * chosen so partial-aggregation merge order cannot perturb the result
    * (Long arithmetic), keeping it oracle-checkable. */
  private object SumSq extends Aggregator[Double, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Double): Long = b + a.toLong * a.toLong
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  private def registerUdfs(s: SparkSession): Unit = {
    s.udf.register("udf_discounted", (price: Double, disc: Double) => price * (1.0 - disc))
    s.udf.register("udaf_sumsq", udaf(SumSq))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scalar Scala UDF through both DataFrame and SQL registration.
    "u62_scalar_udf" -> ((s, dir) => {
      registerUdfs(s)
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderkey, udf_discounted(o_totalprice, 0.1) AS discounted
              |FROM orders ORDER BY o_orderkey""".stripMargin)
    }),

    // Typed Aggregator UDAF (exact integer arithmetic => oracle-checkable).
    "u63_udaf" -> ((s, dir) => {
      registerUdfs(s)
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_returnflag, udaf_sumsq(l_quantity) AS sumsq
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // TypedImperativeAggregate sketch: Misra-Gries candidates, exact recount
    // over candidates only, exact top-100. The reported set is every token
    // with freq >= max(5, floor(n/257)+1): the second bound IS the MG-256
    // survival guarantee (any token with freq > n/(capacity+1) cannot be
    // fully decremented out of the sketch), so the result is provably exact
    // at EVERY corpus size — the threshold scales with n instead of silently
    // outgrowing the sketch's guarantee. At 100 TB the first pass ships a
    // 256-counter sketch per partition instead of a full frequency map.
    "u65_sketch_topk" -> ((s, dir) => {
      GraftFunctions.register(s)
      val toks = Tables.load(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      val cand = toks.agg(expr("graft_mg_topk(token, 256)").as("cands"),
          count(lit(1)).as("n"))
        .select(explode(col("cands")).as("token"), col("n"))
      toks.join(cand, "token") // one-row-aggregate side: AQE broadcasts it
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"), first(col("n")).as("n"))
        .filter(col("freq") >= greatest(lit(5L), floor(col("n") / 257L) + 1L))
        .select(col("token"), col("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(100)
    }),

    // SQL-defined functions (Spark 4): a scalar SQL UDF whose BODY is an
    // expression the analyzer INLINES into the calling plan (stays inside
    // whole-stage codegen — the opposite of u62's opaque Scala closure,
    // which black-boxes the optimizer), and a SQL table function consumed
    // as a relation. The oracle states the same queries with the bodies
    // inlined by hand, proving the definition/invocation machinery is
    // semantics-preserving.
    "u66_sql_udf" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("DROP TEMPORARY FUNCTION IF EXISTS graft_disc_price")
      s.sql("DROP TEMPORARY FUNCTION IF EXISTS graft_big_nations")
      s.sql("""CREATE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE)
              |RETURNS DOUBLE RETURN p * (1 - d)""".stripMargin)
      s.sql("""CREATE TEMPORARY FUNCTION graft_big_nations(lim INT)
              |RETURNS TABLE(nk BIGINT)
              |RETURN SELECT n_nationkey FROM nation WHERE n_nationkey < lim""".stripMargin)
      s.sql("""SELECT l_returnflag,
              | CAST(sum(CAST(graft_disc_price(l_extendedprice, l_discount)
              |   AS DECIMAL(18,4))) AS DOUBLE) AS rev,
              | count(*) AS n
              |FROM lineitem
              | JOIN supplier ON s_suppkey = l_suppkey
              | JOIN graft_big_nations(10) ON s_nationkey = nk
              |GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // PARAMETERIZED SQL (Spark 3.4+/4 sql(text, args)): named :placeholders
    // bound server-side as typed literals — the injection-safe templating
    // surface an application layer calls instead of string interpolation.
    // Binding happens at parse time, so the date lands in the parquet
    // scan's pushed filters exactly like an inline literal (no dynamic
    // filter penalty). Oracle = the same SQL with the literals spelled out.
    "u67_parameterized_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag,
          | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          |   AS sum_price,
          | count(*) AS n
          |FROM lineitem
          |WHERE l_shipdate >= :cutoff AND l_quantity < :maxq
          |GROUP BY 1 ORDER BY 1""".stripMargin,
        Map("cutoff" -> java.sql.Timestamp.valueOf("1996-06-01 00:00:00"),
          "maxq" -> Int.box(25)))
    }),

    // Table function: LATERAL VIEW explode over a generator expression
    // (bigram extraction) with aggregation on the generated rows.
    "u64_table_function" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
        .select(col("doc_id"),
          explode(QueryUtil.wordNgrams(col("toks"), 2)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram"))
        .limit(50)
    }),

    // SQL scripting (Spark 4 SQL/PSM: BEGIN/DECLARE/WHILE/SET): an
    // iterative doubling search for the smallest power-of-2 price cutoff
    // that leaves at most 100 orders above it — procedural control flow
    // the reference facade has no analogue for. Each iteration is one
    // distributed pushdown-count; the LOOP is driver-side and runs
    // log2(price domain) ≈ 20 times regardless of corpus size (the t58
    // BPE pattern: driver control flow around distributed statements,
    // never driver DATA). Powers of two are exact doubles, so the
    // count compare and the final row are bit-deterministic; the oracle
    // spells the search closed-form over the k = 10..40 cutoff grid
    // (exact 1<<k integers, no libm pow). The search starts at 2^10 —
    // cutoffs below the corpus's price floor are degenerate — so the loop
    // pays ~10 of Spark's local job floors rather than 20; that floor is
    // the whole cost here (DuckDB runs the same loop closed-form in
    // ~0.1 s) and vanishes at real scale where the per-iteration count
    // scan dominates.
    "u68_sql_scripting" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.conf.set("spark.sql.scripting.enabled", "true")
      s.sql(
        """BEGIN
          |  DECLARE cut DOUBLE DEFAULT 1024.0;
          |  DECLARE n BIGINT DEFAULT -1;
          |  SET n = (SELECT count(*) FROM orders WHERE o_totalprice > cut);
          |  WHILE n > 100 DO
          |    SET cut = cut * 2.0;
          |    SET n = (SELECT count(*) FROM orders WHERE o_totalprice > cut);
          |  END WHILE;
          |  SELECT cut, n AS n_above;
          |END""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "u62_scalar_udf" ->
      """SELECT o_orderkey, o_totalprice * (1.0 - 0.1) AS discounted
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "u63_udaf" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "u65_sketch_topk" ->
      """WITH t AS (
        | SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tot AS (SELECT count(*) AS n FROM t)
        |SELECT token, count(*) AS freq FROM t, tot
        |GROUP BY token, tot.n
        |HAVING count(*) >= greatest(5, CAST(floor(tot.n / 257.0) AS BIGINT) + 1)
        |ORDER BY freq DESC, token LIMIT 100""".stripMargin,

    "u66_sql_udf" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))) AS DOUBLE) AS rev,
        | count(*) AS n
        |FROM lineitem
        | JOIN supplier ON s_suppkey = l_suppkey
        | JOIN (SELECT n_nationkey AS nk FROM nation WHERE n_nationkey < 10) b
        |   ON s_nationkey = nk
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "u67_parameterized_sql" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS sum_price,
        | count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-06-01' AND l_quantity < 25
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "u64_table_function" ->
      """SELECT bigram, count(*) AS freq FROM (
        | SELECT unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))]) AS bigram
        | FROM (SELECT string_split_regex(trim(text), '\s+') AS s FROM documents))
        |GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 50""".stripMargin,

    // closed-form spelling of the doubling search: smallest 2^k (k from 0,
    // count monotone nonincreasing in the cutoff) with <= 100 above it
    "u68_sql_scripting" ->
      """WITH c AS (
        | SELECT CAST(CAST(1 AS BIGINT) << k AS DOUBLE) AS cut
        | FROM range(10, 41) t(k)),
        |n AS (SELECT cut,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > cut) AS n_above
        | FROM c)
        |SELECT cut, n_above FROM n WHERE n_above <= 100
        |ORDER BY cut LIMIT 1""".stripMargin
  )
}
