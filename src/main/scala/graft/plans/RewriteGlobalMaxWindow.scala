package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite empty-frame global-aggregate windows
  * (`MAX(x) OVER ()` — SURVEY W2; reference `lib.ts:380-381, 455-456`)
  * into a broadcast cross join against a 1-row aggregate.
  *
  * Why: a window with an empty `PARTITION BY` funnels EVERY row into a
  * single window partition — one task, one spill domain; at 100 TB it
  * is the whole job's bottleneck. The equivalent scalar aggregate is a
  * partial+final reduction (parallel everywhere) whose 1-row result
  * broadcasts back. The engine's hand-written queries already use the
  * broadcast form; this rule makes naively-written `OVER ()` queries
  * (e.g. ported reference SQL) plan well automatically.
  *
  * Fires only when every window expression on the node is a
  * non-distinct aggregate over the full frame; rank-family or framed
  * windows are left alone.
  */
object RewriteGlobalMaxWindow extends Rule[LogicalPlan] {

  private def fullFrame(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  private def rewritableAlias(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(ae: AggregateExpression,
        WindowSpecDefinition(Seq(), Seq(), f)), _) =>
      !ae.isDistinct && ae.filter.isEmpty && fullFrame(f)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // `child.deterministic` guard: the rewrite duplicates `child` into
    // both join sides, so a non-deterministic child (rand(), uuid(),
    // non-idempotent source) would have its aggregate computed over a
    // DIFFERENT sample than the joined rows — silently wrong versus
    // the Window form. Mirrors Spark's own care around duplicating
    // non-deterministic subtrees; such plans keep the Window.
    // (For deterministic children the double-scan is the documented
    // cost of trading a single-partition window for a parallel
    // aggregate — a win at any real scale.)
    case w @ Window(wexprs, Seq(), Seq(), child, _)
        if wexprs.nonEmpty && wexprs.forall(rewritableAlias) && child.deterministic =>
      // keep the original exprIds so parent operators resolve unchanged
      val aggAliases = wexprs.map { case a @ Alias(WindowExpression(ae, _), name) =>
        Alias(ae, name)(a.exprId, a.qualifier, a.explicitMetadata)
      }
      val agg = Aggregate(Nil, aggAliases, child)
      Join(child, agg, Cross, None,
        JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
  }
}

/** Production registration point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Existing sessions can opt in via [[GraftExtensions.install]]
  * (experimental extraOptimizations).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteGlobalMaxWindow)
}

object GraftExtensions {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteGlobalMaxWindow))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteGlobalMaxWindow
}
