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
