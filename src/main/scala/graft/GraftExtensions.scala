package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SparkSessionExtensions entry point (the engine's custom-Catalyst
  * wiring surface, SURVEY.md §4): installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` on the
  * session builder — the production mechanism for shipping optimizer
  * rules with a library, no Spark fork required. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => CollapseSanitize)
}

/** Optimizer rule: `sanitize_filename(sanitize_filename(x))` →
  * `sanitize_filename(x)`. Sanitization is idempotent (SanitizeSpec
  * proves it by fuzz: the output alphabet is a fixed point of the
  * mapping), so the inner application is dead work — the kind of
  * domain-specific rewrite Catalyst can't know about but an engine can
  * teach it. Composed pipelines sanitize defensively at several stages
  * (reference sanitizes per handler entry, child.py:130/114-recursion),
  * so nested applications arise naturally. */
object CollapseSanitize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case graft.expr.SanitizeFilename(inner @ graft.expr.SanitizeFilename(_)) =>
        inner
    }
}
