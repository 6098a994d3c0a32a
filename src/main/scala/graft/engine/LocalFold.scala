package graft.engine

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, IntegerLiteral, InterpretedMutableProjection, Predicate, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Clock-safe driver-side folding of local-relation plans.
  *
  * The facade excludes Spark's `ConvertToLocalRelation` because it evaluates
  * projections over `LocalRelation` at OPTIMIZATION time, which would freeze
  * the `Exec*` execution-clock expressions into a cached plan (see
  * ExecTime.scala). But the blanket exclusion also cost the fast path that
  * is the reference's whole regime — small in-memory tables answered on the
  * driver without launching a job (reference `DirectSparkSession.sqlDirectly`
  * executes entirely on the calling thread; collect over a plan that
  * optimizes to a bare `LocalRelation` never submits a Spark job). This rule
  * restores that path with the one guard the stock rule lacks: a
  * Project/Filter/Limit over a LocalRelation folds eagerly ONLY when its
  * expressions are deterministic and contain no execution-clock expression —
  * those plans keep their live per-execution semantics under the plan cache.
  *
  * (Stricter than stock in one more way: the stock rule folds
  * non-deterministic projections too, which is sound for a single query but
  * observable under a cached plan — rand() would return identical values on
  * every re-execution. Skipping those keeps cached-plan re-execution
  * semantics identical to uncached.)
  */
object ClockSafeConvertToLocalRelation extends Rule[LogicalPlan] {

  private def hasClockExpr(e: Expression): Boolean = e.exists {
    case _: ExecCurrentTimestamp | _: ExecCurrentDate | _: ExecLocalTimestamp => true
    case _ => false
  }

  private def foldableExpr(e: Expression): Boolean =
    e.deterministic && !hasClockExpr(e) && !e.exists {
      case u: Unevaluable => !u.isInstanceOf[AttributeReference]
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList, l: LocalRelation) if projectList.forall(foldableExpr) =>
      val projection = new InterpretedMutableProjection(projectList, l.output)
      projection.initialize(0)
      LocalRelation(projectList.map(_.toAttribute),
        l.data.map(r => projection(r).copy()), l.isStreaming)

    case Limit(IntegerLiteral(limit), l: LocalRelation) =>
      LocalRelation(l.output, l.data.take(limit), l.isStreaming)

    case Filter(condition, l: LocalRelation) if foldableExpr(condition) =>
      val predicate = Predicate.create(condition, l.output)
      predicate.initialize(0)
      LocalRelation(l.output, l.data.filter(row => predicate.eval(row)), l.isStreaming)
  }
}
