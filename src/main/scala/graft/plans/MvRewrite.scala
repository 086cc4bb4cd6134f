package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view CATALOG + transparent REWRITE rule — the
  * mv_incremental family completed with the piece that makes an MV
  * useful to queries that don't know it exists: a registered
  * definition's plan is recognized INSIDE any later query and replaced
  * by a scan of the materialized parquet, so the 100 TB aggregation
  * runs once and every subsequent ask costs one grid-sized file read.
  * This is the engine-teaches-Catalyst mechanism (same surface as
  * [[TopKRewrite]]): `SparkSessionExtensions.injectOptimizerRule`, no
  * Spark fork.
  *
  * Matching is CANONICAL-PLAN EQUALITY, not subsumption: the stored
  * key is the definition's OPTIMIZED canonicalized plan (exprIds
  * normalized away, so a freshly constructed identical query matches),
  * and the rule — which runs inside the operator-optimization
  * fixed point, i.e. against subtrees in optimized form — swaps any
  * matching subtree for a Project over the pre-ANALYZED parquet
  * relation, aliasing each MV column back to the matched subtree's
  * exprIds so every downstream reference stays bound. Exact-equality
  * scope is deliberate (the subsumption lattice — rollup-ability,
  * predicate implication — is a different, research-sized feature);
  * it is also what keeps the rewrite provably result-identical: the
  * replacement reads rows the definition itself wrote.
  *
  * Safety rails: the relation is resolved at REGISTRATION time (no
  * re-entrant planning inside the optimizer), types must match
  * position-wise (parquet may only widen nullability), the rule is
  * conf-gated (`spark.graft.mv.rewrite`) so the unrewritten plan stays
  * independently testable, and transformDown rewrites the OUTERMOST
  * match (a child rewrite would orphan its parent's canonical form).
  * Staleness is the caller's contract, exactly as with any MV:
  * re-register after refresh ([[graft.ops.Lake.mergeMv]] is the
  * incremental-refresh half of the pair). */
object MvCatalog {
  private val views = TrieMap.empty[LogicalPlan, LogicalPlan]

  /** Register `materialized` (a plain parquet-backed DataFrame holding
    * `definition`'s rows, same column order) as the rewrite target for
    * `definition`'s plan. */
  def register(definition: DataFrame, materialized: DataFrame): Unit =
    views.put(definition.queryExecution.optimizedPlan.canonicalized,
      materialized.queryExecution.analyzed)

  private[plans] def lookup(p: LogicalPlan): Option[LogicalPlan] =
    views.get(p.canonicalized)

  def clear(): Unit = views.clear()
}

object MvRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.mv.rewrite", "false").toBoolean)
      return plan
    plan.transformDown {
      case p if rewritable(p) =>
        val rel = MvCatalog.lookup(p).get
        Project(p.output.zip(rel.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, rel)
    }
  }

  private def rewritable(p: LogicalPlan): Boolean =
    MvCatalog.lookup(p).exists { rel =>
      // already the rewritten form? (fixed-point batch re-runs the
      // rule over its own output — a Project over the relation has a
      // different canonical form than the definition, but guard on
      // shape anyway) — and types must line up position-wise.
      rel.output.length == p.output.length &&
        rel.output.zip(p.output).forall { case (n, o) =>
          n.dataType == o.dataType }
    }
}
