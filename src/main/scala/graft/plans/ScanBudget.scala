package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, ExprId, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
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

  /** `fail` (default) throws the directed error; `warn` logs it and
    * lets the plan run — the migration mode for a deployment upgrading
    * onto the default-on budget with pre-existing endpoint SQL it has
    * not yet checkpointed (observe violations in the logs first, flip
    * to fail once clean). Any other value reads as `fail` — the guard
    * never silently disables through a typo. */
  val ModeKey = "spark.graft.scanBudget.mode"

  /** The shipped default (r11 verdict #1: the rule existed but shipped
    * dark at 0=off). 4 clears every sanctioned multi-reference shape in
    * the gate — self-joins (2), per-probe pruned ANN branches (3), the
    * dedup verify rejoin (3) — while catching the failure class it was
    * built for (the r8 KL CTE shape measured SIX scans of one
    * relation). [[graft.GraftSession]] sets it on every session it
    * builds; [[graft.server.GraftBootstrap]] sets it on a serving
    * session that arrives without one. */
  val DefaultBudget = 4

  final class ScanBudgetExceeded(msg: String) extends RuntimeException(msg)

  /** One violation, as the metrics surface reports it. */
  final case class Violation(relation: String, scans: Int, budget: Int,
      mode: String, atMillis: Long)

  /** Serving-visible violation telemetry (r12 verdict #4: `warn` mode
    * was log-only, so the observe-then-flip migration path — run warn,
    * watch for violations, flip to fail once clean — required log
    * scraping). Every violation feeds the counter and the
    * last-violation gauge, in BOTH modes: warn is the migration
    * consumer, and a fail-mode 422 leaving a trace here lets an
    * operator correlate request errors with the relation that caused
    * them. The server surfaces the snapshot on `/mcp/metrics`. */
  object Metrics {
    private val count = new java.util.concurrent.atomic.AtomicLong()
    @volatile private var last: Option[Violation] = None

    private[plans] def record(v: Violation): Unit = { count.incrementAndGet(); last = Some(v) }

    def violations: Long = count.get()
    def lastViolation: Option[Violation] = last

    def toJson: String = {
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      val lastJson = last.fold("null")(v =>
        s"""{"relation":"${esc(v.relation)}","scans":${v.scans},""" +
          s""""budget":${v.budget},"mode":"${v.mode}","at_ms":${v.atMillis}}""")
      s"""{"violations":${count.get()},"last":$lastJson}"""
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val max =
      try SQLConf.get.getConfString(ConfKey, "0").toInt
      catch { case _: NumberFormatException => 0 }
    if (max > 0) {
      val warnOnly =
        SQLConf.get.getConfString(ModeKey, "fail").trim
          .equalsIgnoreCase("warn")
      val scans = collectScans(plan)
      scans.groupBy(identity).foreach { case (path, hits) =>
        if (hits.size > max) {
          val msg =
            s"scan budget exceeded: relation [$path] is scanned " +
              s"${hits.size} times in one query (budget $ConfKey=$max). " +
              "Spark inlines CTEs, so each reference re-executes the " +
              "subtree — localCheckpoint the shared intermediate (see " +
              "graft.operators.SessionMemo/DirMemo) or raise the budget."
          Metrics.record(Violation(path, hits.size, max,
            if (warnOnly) "warn" else "fail", System.currentTimeMillis()))
          if (warnOnly) logWarning(msg)
          else throw new ScanBudgetExceeded(msg)
        }
      }
    }
    plan
  }

  /** File-source scans of `plan` INCLUDING those inside subquery
    * expressions (plan.collect walks operator children only — an
    * EXISTS/IN/scalar subquery's plan hangs off an expression and
    * would otherwise count its scans against nothing).
    *
    * Partition-slice exemption: a scan whose directly-enclosing
    * Filter/Project chain constrains a PARTITION column of the
    * relation reads a partition SLICE, not the relation — the
    * sanctioned multi-branch shape (a served ANN probe unions
    * per-probe `cell IN (…)` branches of one partitioned index: six
    * pruned slices, not six index scans). Such scans key on
    * (path, canonicalized partition predicate) so DISTINCT slices
    * count separately while IDENTICAL slices still accumulate toward
    * the budget. Unconstrained scans key on the path alone — the
    * CTE-inline failure class this rule exists for always re-scans
    * the same unsliced subtree. */
  private def collectScans(plan: LogicalPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // And-split a condition into its conjuncts: slice keying must look
    // at conjuncts INDIVIDUALLY — CombineFilters merges per-consumer
    // predicates into the partition predicate's And, and keying on the
    // whole condition would give every re-scan of the same slice a
    // unique key (a silent bypass of the budget on partitioned tables)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def leafKey(lr: LogicalRelation, fs: HadoopFsRelation,
        conds: Seq[Expression]): String = {
      val path = fs.location.rootPaths.map(_.toString).sorted.mkString(",")
      val partCols = fs.partitionSchema.fieldNames
        .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      // the relation's ACTUAL partition attributes, by ExprId — a
      // Project alias that merely SHARES a partition column's name
      // mints a fresh ExprId, so a data predicate over it can never
      // classify as a slice (the name-match version could be shadowed
      // into silently bypassing the budget — r12 ADVICE)
      val partAttrIds = lr.output.filter(a =>
        partCols.contains(a.name.toLowerCase(java.util.Locale.ROOT)))
        .map(_.exprId).toSet
      // a conjunct is a SLICE predicate only when it references
      // partition columns EXCLUSIVELY — a mixed or data-only conjunct
      // is consumer logic and must not differentiate the key
      val partConds = conds.flatMap(conjuncts).filter { c =>
        val refs = c.references.toSeq
        refs.nonEmpty && refs.forall {
          case a: AttributeReference => partAttrIds.contains(a.exprId)
          case _ => false
        }
      }
      if (partConds.isEmpty) path
      else {
        // normalize expression ids STRUCTURALLY (every spark.read of
        // the same path mints fresh ids, so identical slices would
        // never collide) — a rendered-string regex would also mangle
        // '#digits' inside string-literal partition VALUES and
        // conflate genuinely distinct slices
        val slices = partConds
          .map(_.transform {
            case a: AttributeReference => a.withExprId(ExprId(0))
          }.canonicalized.toString)
          .sorted.mkString("&")
        path + "#" + slices
      }
    }
    // walk linear Filter/Project chains carrying the filter context;
    // any other node resets it (a filter above a join/aggregate does
    // not slice the scans underneath). Crossing a Project REMAPS the
    // carried conditions through its alias list, so a condition that
    // referenced `alias AS cell` arrives at the leaf as a condition
    // over the alias's CHILD expression (whose refs are what decide
    // slice-ness) — without the remap, a filter above an aliasing
    // Project would reference ExprIds the leaf has never heard of.
    def walk(node: LogicalPlan, conds: Seq[Expression]): Unit = node match {
      case f: Filter => walk(f.child, conds :+ f.condition)
      case p: Project =>
        val aliasById = p.projectList.collect {
          case al: org.apache.spark.sql.catalyst.expressions.Alias =>
            al.exprId -> al.child
        }.toMap
        val remapped =
          if (aliasById.isEmpty) conds
          else conds.map(_.transform {
            case a: AttributeReference if aliasById.contains(a.exprId) =>
              aliasById(a.exprId)
          })
        walk(p.child, remapped)
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        out += leafKey(lr, fs, conds); ()
      case other => other.children.foreach(walk(_, Nil))
    }
    walk(plan, Nil)
    val nested = plan.flatMap(_.expressions.flatMap(_.collect {
      case s: SubqueryExpression => collectScans(s.plan)
    }.flatten))
    out.toSeq ++ nested
  }
}
