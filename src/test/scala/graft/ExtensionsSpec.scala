package graft

import graft.expr.Sanitize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule ([[CollapseSanitize]]) must fire through
  * the normal session-extensions path (SharedSpark installs
  * graft.GraftExtensions) and must not change results. */
class ExtensionsSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("optimizer collapses nested sanitize applications") {
    Sanitize.register(spark)
    val df = Tables.t(spark, sf, "part")
      .select(Sanitize.sanitize(Sanitize.sanitize(col("p_name"))).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert("sanitize_filename".r.findAllIn(optimized).size === 1,
      s"nested sanitize must collapse to one application:\n$optimized")
  }

  test("TopKRewrite replaces the window top-k plan with the bounded-heap aggregate") {
    val df = SparkEntry.queries("topk_group_rewrite")(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("topk_pairs"), s"rewrite did not fire:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      s"window operator must be gone:\n$p")
    // and the flag must not leak into later plans
    val p2 = SparkEntry.queries("topk_group")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(p2.contains("Window") && !p2.contains("topk_pairs"),
      s"flag leaked — plain topk_group was rewritten:\n$p2")
  }

  test("TopKRewrite is bit-exact vs the window formulation") {
    val rewritten = SparkEntry.queries("topk_group_rewrite")(spark, sf)
      .collect().map(_.toSeq)
    val window = SparkEntry.queries("topk_group")(spark, sf)
      .collect().map(_.toSeq)
    assert(rewritten === window)
  }

  test("the rewrite is sound: nested equals single application") {
    Sanitize.register(spark)
    val nested = Tables.t(spark, sf, "part")
      .select(col("p_partkey"),
        Sanitize.sanitize(Sanitize.sanitize(col("p_name"))).as("c"))
      .orderBy("p_partkey").collect().map(_.getString(1)).toSeq
    val single = Tables.t(spark, sf, "part")
      .select(col("p_partkey"), Sanitize.sanitize(col("p_name")).as("c"))
      .orderBy("p_partkey").collect().map(_.getString(1)).toSeq
    assert(nested === single)
  }
}
