package graft.engine

import java.time.ZoneId

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{CurrentDate, CurrentTimestamp, Expression, LeafExpression, LocalTimestamp, Now, TimeZoneAwareExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

/** Execution-time clock semantics for cached plans.
  *
  * Stock Spark folds `current_timestamp()`/`current_date()` into literals at
  * optimization time (`ComputeCurrentTime`), which is correct per query but
  * stale for a plan cached across queries — the problem the reference solved
  * with its `Direct*` expression family (reference
  * `DirectSessionStateBuilder.scala:134-155`, `DirectCurrentTimestamp.scala:
  * 25-39`). We solve it Spark-natively: an analyzer rule swaps the stock
  * expressions for `Exec*` variants that read a per-execution frozen clock at
  * eval time. The frozen instant travels from the calling driver thread to
  * executor tasks via Spark local properties (thread-scoped on the driver,
  * propagated into every task of jobs submitted from that thread) — unlike
  * the reference's caller-thread ThreadLocal, this survives real distributed
  * execution, so the same cached plan stays both time-correct and
  * concurrency-safe on a cluster.
  */
object GraftExecutionContext {
  val TimeKey = "graft.exec.time.micros"

  /** Driver-side fallback for eval paths with no TaskContext. */
  private[engine] val driverMicros = new ThreadLocal[java.lang.Long]

  /** Freeze the clock for jobs submitted from this thread. */
  def begin(spark: org.apache.spark.sql.SparkSession): Unit = {
    val nowMicros = DateTimeUtils.instantToMicros(java.time.Instant.now())
    spark.sparkContext.setLocalProperty(TimeKey, nowMicros.toString)
    driverMicros.set(nowMicros)
  }

  def end(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.setLocalProperty(TimeKey, null)
    driverMicros.remove()
  }

  /** The frozen execution clock, or the live clock when executing outside a
    * GraftSession entry point. */
  def currentMicros(): Long = {
    val tc = TaskContext.get()
    if (tc != null) {
      val p = tc.getLocalProperty(TimeKey)
      if (p != null) return p.toLong
    }
    val d = driverMicros.get()
    if (d != null) d.longValue() else DateTimeUtils.instantToMicros(java.time.Instant.now())
  }
}

/** current_timestamp that reads the frozen execution clock at eval time.
  * Deterministic on purpose (like the reference's `DirectCurrentTimestamp`):
  * it is constant within one execution, so predicate pushdown and common
  * subexpression elimination remain valid; non-foldable so ConstantFolding
  * leaves it alone. */
case class ExecCurrentTimestamp() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    GraftExecutionContext.currentMicros()
  override def prettyName: String = "exec_current_timestamp"
}

/** current_date against the frozen execution clock, session-timezone aware. */
case class ExecCurrentDate(timeZoneId: Option[String] = None)
    extends LeafExpression with TimeZoneAwareExpression with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = false
  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(timeZoneId))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    DateTimeUtils.microsToDays(GraftExecutionContext.currentMicros(), zoneId)
  override def prettyName: String = "exec_current_date"
}

/** localtimestamp() against the frozen execution clock (TIMESTAMP_NTZ in the
  * session zone) — ComputeCurrentTime folds the stock LocalTimestamp too. */
case class ExecLocalTimestamp(timeZoneId: Option[String] = None)
    extends LeafExpression with TimeZoneAwareExpression with CodegenFallback {
  override def dataType: DataType = TimestampNTZType
  override def nullable: Boolean = false
  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(timeZoneId))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    DateTimeUtils.localDateTimeToMicros(
      DateTimeUtils.microsToInstant(GraftExecutionContext.currentMicros())
        .atZone(zoneId).toLocalDateTime)
  override def prettyName: String = "exec_localtimestamp"
}

/** Analyzer rule: swap clock expressions for execution-time variants before
  * the optimizer can constant-fold them (`ComputeCurrentTime` matches the
  * stock classes only). */
object ExecTimeRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CurrentTimestamp() => ExecCurrentTimestamp()
    case Now() => ExecCurrentTimestamp()
    case cd: CurrentDate => ExecCurrentDate(cd.timeZoneId)
    case lt: LocalTimestamp => ExecLocalTimestamp(lt.timeZoneId)
  }
}

/** Session extension wiring — usable both from `GraftSession.builder` and via
  * `spark.sql.extensions=graft.engine.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => ExecTimeRewrite)
    // replaces the excluded ConvertToLocalRelation with the clock-safe
    // variant: driver-side local-relation folding (the reference's
    // no-job fast path) without freezing Exec* clocks into cached plans
    e.injectOptimizerRule(_ => ClockSafeConvertToLocalRelation)
    // interval-containment theta joins (BETWEEN joins) plan as banded
    // equi-joins instead of nested loops — exact for any band width,
    // plan-gated in RangeJoinRuleSpec
    e.injectOptimizerRule(_ => graft.plans.BandedIntervalJoinRule)
    // the row_number-over-theta-join AS-OF idiom plans as the one-shuffle
    // union-stream window instead of the pair explosion — AsofRuleSpec
    e.injectOptimizerRule(_ => graft.plans.AsofJoinRule)
  }
}
