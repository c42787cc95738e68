package graft.plans

import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/** A duplicated-scan budget, enforced INSIDE the engine as a Catalyst
  * optimizer rule — the institutional form of the discipline this
  * library learned the hard way: Spark INLINES CTEs, so a query whose
  * SQL references a shared frame N times re-executes the full subtree
  * N times (the r8 KL defect measured SIX corpus scans of one parquet
  * relation in a single query; the fix each time was checkpointing the
  * shared intermediate). Plan locks catch this for the queries the
  * test suite knows about — this rule catches it for the ones it
  * doesn't: user-authored endpoint SQL arriving through the serving
  * path.
  *
  * Semantics: with `spark.graft.scanBudget.max = N` (> 0), any
  * OPTIMIZED plan that scans the same file-source relation more than N
  * times fails with a directed error naming the relation, the count,
  * and the two sanctioned fixes (checkpoint the shared frame / raise
  * the budget). Default 0 = off: the rule inspects nothing and
  * transforms nothing. User-provided rules run inside the
  * operator-optimization batch — AFTER the Inline-CTE batch, so the
  * count reflects post-inline reference multiplicity, not the SQL
  * text's — and the walk descends into SUBQUERY EXPRESSION plans too
  * (EXISTS / IN / scalar subqueries are where endpoint SQL usually
  * hides its re-scans). The count is an UPPER bound on execution: the
  * physical planner's exchange reuse can dedupe identical subtrees
  * later, so the guard is a conservative lint, which is the right
  * polarity for an opt-in budget.
  *
  * The rule never rewrites — it is a guard, so it is trivially
  * idempotent under the optimizer's fixed-point driver.
  */
object ScanBudgetRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.scanBudget.max"

  final class ScanBudgetExceeded(msg: String) extends RuntimeException(msg)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val max =
      try SQLConf.get.getConfString(ConfKey, "0").toInt
      catch { case _: NumberFormatException => 0 }
    if (max > 0) {
      val scans = collectScans(plan)
      scans.groupBy(identity).foreach { case (path, hits) =>
        if (hits.size > max)
          throw new ScanBudgetExceeded(
            s"scan budget exceeded: relation [$path] is scanned " +
              s"${hits.size} times in one query (budget $ConfKey=$max). " +
              "Spark inlines CTEs, so each reference re-executes the " +
              "subtree — localCheckpoint the shared intermediate (see " +
              "graft.operators.SessionMemo/DirMemo) or raise the budget.")
      }
    }
    plan
  }

  /** File-source scans of `plan` INCLUDING those inside subquery
    * expressions (plan.collect walks operator children only — an
    * EXISTS/IN/scalar subquery's plan hangs off an expression and
    * would otherwise count its scans against nothing). */
  private def collectScans(plan: LogicalPlan): Seq[String] = {
    val here = plan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString).sorted.mkString(",")
    }
    val nested = plan.flatMap(_.expressions.flatMap(_.collect {
      case s: SubqueryExpression => collectScans(s.plan)
    }.flatten))
    here ++ nested
  }
}
