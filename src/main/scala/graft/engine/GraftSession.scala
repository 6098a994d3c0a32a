package graft.engine

import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** The engine facade: the reference's session API (`sqlDirectly`,
  * `registerTempView`, `tempView`, `executeAndRegisterTempView`,
  * `db.table`-qualified names — reference `DirectSparkSession.scala:88-219`)
  * rebuilt on a stock SparkSession.
  *
  * Design deltas vs the reference, deliberate (SURVEY §7.4):
  *  - The plan cache stores analyzed `DataFrame`s keyed by
  *    (catalog-version, sqlText). Re-registering a table bumps the version,
  *    so stale plans fall out of the key space instead of needing the
  *    reference's lazy `NamedLocalRelation` rebinding machinery. Within one
  *    version, repeated SQL skips parse/analyze/optimize/plan entirely.
  *  - Time correctness under the cache comes from the `Exec*` clock
  *    expressions (see ExecTime.scala) — frozen per execution via local
  *    properties, so concurrent callers on different threads each see their
  *    own clock, mirroring the reference's thread-local
  *    `DirectExecutionContext` but cluster-safe.
  *  - Executions are plain Spark jobs: thread-safe, spill-aware, distributed.
  *    No unbounded build-side memory (the reference's `Long.MaxValue`
  *    `StaticMemoryManager` hash joins are the documented anti-pattern).
  */
class GraftSession private (val spark: SparkSession) {

  private val catalogVersion = new AtomicLong(0L)
  private val maxCacheSize = 1000

  private val planCache =
    new java.util.LinkedHashMap[String, DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean =
        size() > maxCacheSize
    }

  /** `db.table` temp-view names, like the reference's directTempViews
    * namespace (reference `DirectSessionCatalog.scala:130-171`), via
    * deterministic name mangling inside the facade. */
  private def mangle(name: String): String = name.replace(".", "__g__")

  private def isCommand(df: DataFrame): Boolean = {
    // the parsed plan of e.g. INSERT is an InsertIntoStatement (not yet a
    // Command) — only the ANALYZED plan reliably reveals command-ness
    import org.apache.spark.sql.catalyst.plans.logical.{Command, CommandResult}
    df.queryExecution.logical.isInstanceOf[CommandResult] ||
      df.queryExecution.analyzed.isInstanceOf[Command] ||
      df.queryExecution.analyzed.isInstanceOf[CommandResult]
  }

  private def cachedPlan(sqlText: String): DataFrame = {
    val key = s"${catalogVersion.get()}\n$sqlText"
    val hit = planCache.synchronized(planCache.get(key))
    if (hit != null) hit
    else {
      // compile outside the lock so unrelated statements analyze in
      // parallel; a racing duplicate compile is harmless (last put wins)
      val df = spark.sql(sqlText)
      if (isCommand(df)) {
        // commands (INSERT/DDL) execute eagerly at construction: caching one
        // would turn a re-issued statement into a silent no-op replay, and a
        // catalog mutation invalidates every cached SELECT — bump + bypass.
        bumpVersion()
      } else {
        planCache.synchronized(planCache.put(key, df))
      }
      df
    }
  }

  private def bumpVersion(): Unit = {
    catalogVersion.incrementAndGet()
    // entries under old versions are unreachable by any future key; drop
    // them now instead of pinning up to 1000 stale materialized plans
    planCache.synchronized(planCache.clear())
  }

  /** Parse/analyze/optimize once per (catalog version, SQL text); execute
    * with a frozen per-execution clock; collect to a DataTable. */
  def sql(sqlText: String): DataTable = {
    val df = cachedPlan(sqlText)
    GraftExecutionContext.begin(spark)
    try DataTable(df.schema, df.collect().toSeq)
    finally GraftExecutionContext.end(spark)
  }

  /** Lazy variant for composition — same cache, no collect. */
  def sqlDF(sqlText: String): DataFrame = cachedPlan(sqlText)

  def registerTable(name: String, table: DataTable): Unit = {
    spark.createDataFrame(table.rows.asJava, table.schema)
      .createOrReplaceTempView(mangle(name))
    bumpVersion()
  }

  def registerTable(name: String, df: DataFrame): Unit = {
    df.createOrReplaceTempView(mangle(name))
    bumpVersion()
  }

  def table(name: String): DataTable = {
    val df = spark.table(mangle(name))
    DataTable(df.schema, df.collect().toSeq)
  }

  /** Isolated child session: shares SparkContext + catalog-level state,
    * isolates temp views, conf and plan cache (reference `newSession`,
    * `DirectSparkSession.scala:81-86`). Extensions (exec-time clock rule)
    * carry over to the child. */
  def newSession(): GraftSession = GraftSession(spark.newSession())

  /** Execute and register the result as a temp view; returns row count
    * (reference `executeAndRegisterTempView`, `DirectSparkSession.scala:
    * 181-219`). Materialized eagerly so downstream queries read a stable
    * snapshot — but DISTRIBUTED: `localCheckpoint` pins the computed
    * partitions in executor storage (the reference collects to the driver
    * heap because it is single-node; at 100 TB that is the one thing this
    * method must never do). Checkpointing also severs plan lineage, so the
    * snapshot cannot be re-matched by the CacheManager against later
    * executions of the same SQL — which keeps exec-time clock expressions
    * in *future* `sql()` calls live rather than frozen to this snapshot. */
  def executeAndRegister(sqlText: String, name: String): Long = {
    val df = cachedPlan(sqlText)
    GraftExecutionContext.begin(spark)
    val snap =
      try df.localCheckpoint(true)
      finally GraftExecutionContext.end(spark)
    registerTable(name, snap)
    // counts over the checkpointed partitions — no recompute, no driver rows
    snap.count()
  }
}

object GraftSession {

  /** One facade per SparkSession: two facades over one session would each
    * hold an independent catalog-version/plan-cache, so an invalidation in
    * one would not reach the other's cached plans. */
  private val facades = new java.util.WeakHashMap[SparkSession, GraftSession]()

  private def facadeFor(spark: SparkSession): GraftSession = facades.synchronized {
    var f = facades.get(spark)
    if (f == null) { f = new GraftSession(spark); facades.put(spark, f) }
    f
  }

  private val convertToLocalRelation =
    "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"

  /** Ensure ConvertToLocalRelation is excluded on a session we did not
    * build — it would pre-evaluate Exec* clock expressions at optimization
    * time for local-relation plans, freezing them into cached plans. */
  private def ensureClockSafety(spark: SparkSession): Unit = {
    val key = "spark.sql.optimizer.excludedRules"
    val cur = spark.conf.getOption(key).getOrElse("")
    if (!cur.contains(convertToLocalRelation)) {
      spark.conf.set(key,
        if (cur.isEmpty) convertToLocalRelation else s"$cur,$convertToLocalRelation")
    }
  }

  def builder(): Builder = new Builder

  class Builder {
    private var master: String = "local[*]"
    private var appName: String = "graft"
    private var hive: Boolean = false
    private val extraConf = scala.collection.mutable.Map[String, String]()

    def master(m: String): Builder = { master = m; this }
    def appName(n: String): Builder = { appName = n; this }
    def config(k: String, v: String): Builder = { extraConf += k -> v; this }

    /** Enable the Hive session catalog so `CREATE [TEMPORARY] FUNCTION name
      * AS 'class'` accepts Hive UDF/GenericUDF/UDAF/UDTF classes — the
      * reference's function surface (reference
      * `DirectSessionCatalog.makeFunctionExpression:62-112`). Catalog
      * implementation is a SharedState-static conf: this must be the first
      * session created in the JVM to take effect. */
    def withHiveSupport(): Builder = { hive = true; this }

    def getOrCreate(): GraftSession = {
      // SparkSession.builder().getOrCreate() returns any existing default
      // session and silently ignores withExtensions — which would drop the
      // exec-time clock rule. Reuse only a session we created; otherwise
      // clear the default so a fresh session (sharing the SparkContext) is
      // built with our extensions.
      SparkSession.getDefaultSession match {
        case Some(s) if !s.sparkContext.isStopped &&
            s.conf.getOption("graft.session").contains("true") =>
          if (hive || extraConf.nonEmpty) {
            System.err.println("[graft] reusing existing graft session: " +
              "withHiveSupport/config settings on this builder are ignored")
          }
          return facadeFor(s)
        case Some(_) =>
          SparkSession.clearDefaultSession()
          SparkSession.clearActiveSession()
        case None =>
      }
      var b = SparkSession.builder()
        .config("graft.session", "true")
        .master(master)
        .appName(appName)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        // the reference inherits Spark 2.4 lenient semantics (bad casts ->
        // null, no overflow errors); Spark 4 defaults ANSI on — pin it off
        // in the facade for behavioral parity (SURVEY §7.4)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        // ConvertToLocalRelation evaluates deterministic projections over
        // local relations driver-side at *optimization* time — which would
        // freeze Exec* clock expressions into the cached plan. Excluding it
        // costs nothing at scale (file relations are unaffected).
        .config("spark.sql.optimizer.excludedRules",
          "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
        .withExtensions(new GraftExtensions)
      if (hive) b = b.enableHiveSupport()
      extraConf.foreach { case (k, v) => b = b.config(k, v) }
      facadeFor(b.getOrCreate())
    }
  }

  /** Wrap an existing session (extensions must already include
    * GraftExtensions for exec-time clock semantics). */
  def apply(spark: SparkSession): GraftSession = {
    ensureClockSafety(spark)
    facadeFor(spark)
  }
}
