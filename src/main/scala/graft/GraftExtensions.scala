package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SparkSessionExtensions entry point (the engine's custom-Catalyst
  * wiring surface, SURVEY.md §4): installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` on the
  * session builder — the production mechanism for shipping optimizer
  * rules AND SQL functions with a library, no Spark fork required.
  * Any session built with the extension can call the engine's native
  * expressions from plain `spark.sql(...)` with zero registration
  * calls (exercised by the fn_sql_registry query). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CollapseSanitize)
    e.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    e.injectOptimizerRule(_ => graft.plans.MvRewrite)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((new FunctionIdentifier("sanitize_filename"),
      new ExpressionInfo(classOf[graft.expr.SanitizeFilename].getName,
        "sanitize_filename"),
      (exprs: Seq[Expression]) => graft.expr.SanitizeFilename(exprs.head)))
    e.injectFunction((new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.expr.MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => graft.expr.MinHashSig(exprs.head)))
    e.injectFunction((new FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[graft.expr.MinHashSketch].getName,
        "minhash_sketch"),
      (exprs: Seq[Expression]) => graft.expr.MinHashSketch(exprs.head)))
    e.injectFunction((new FunctionIdentifier("dot64"),
      new ExpressionInfo(classOf[graft.expr.DotProductF64].getName, "dot64"),
      (exprs: Seq[Expression]) =>
        graft.expr.DotProductF64(exprs.head, exprs(1))))
    e.injectFunction((new FunctionIdentifier("sqdist_i64"),
      new ExpressionInfo(classOf[graft.expr.SqDistI64].getName, "sqdist_i64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"sqdist_i64 expects 2 arguments, got ${exprs.length}")
        graft.expr.SqDistI64(exprs.head, exprs(1))
      }))
    e.injectFunction((new FunctionIdentifier("isect_count_s64"),
      new ExpressionInfo(classOf[graft.expr.IntersectCountSorted64].getName,
        "isect_count_s64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"isect_count_s64 expects 2 arguments, got ${exprs.length}")
        graft.expr.IntersectCountSorted64(exprs.head, exprs(1))
      }))
    e.injectFunction((new FunctionIdentifier("dtw_dist"),
      new ExpressionInfo(classOf[graft.expr.DtwDist].getName, "dtw_dist"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dtw_dist expects 2 arguments, got ${exprs.length}")
        graft.expr.DtwDist(exprs.head, exprs(1))
      }))
    e.injectFunction((new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[graft.expr.WinnowFps].getName, "winnow_fps"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"winnow_fps expects 1 argument, got ${exprs.length}")
        graft.expr.WinnowFps(exprs.head)
      }))
    e.injectFunction((new FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[graft.expr.NgramHashes].getName,
        "ngram_hashes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"ngram_hashes expects 1 argument, got ${exprs.length}")
        graft.expr.NgramHashes(exprs.head)
      }))
    e.injectFunction((new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[graft.expr.RepetitionStats].getName,
        "repetition_stats"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"repetition_stats expects 1 argument, got ${exprs.length}")
        graft.expr.RepetitionStats(exprs.head)
      }))
    e.injectFunction((new FunctionIdentifier("ttr_stats"),
      new ExpressionInfo(classOf[graft.expr.TtrStats].getName, "ttr_stats"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"ttr_stats expects 1 argument, got ${exprs.length}")
        graft.expr.TtrStats(exprs.head)
      }))
    e.injectFunction((new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[graft.expr.DeflateLen].getName, "deflate_len"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"deflate_len expects 1 argument, got ${exprs.length}")
        graft.expr.DeflateLen(exprs.head)
      }))
  }
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
