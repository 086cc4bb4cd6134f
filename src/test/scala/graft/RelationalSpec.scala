package graft

import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("bucketed join plans without a shuffle exchange") {
    // build the bucketed tables, then inspect the bare join's plan
    SparkEntry.queries("join_bucketed")(spark, sf).count()
    val plan = ops.Relational.bucketedJoinPlan(spark)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("ShuffleExchange"),
      s"bucketed join must not shuffle:\n$plan")
  }

  test("salted skew join equals the unsalted join") {
    val salted = SparkEntry.queries("join_skew_salted")(spark, sf).collect()
    val plain = {
      import org.apache.spark.sql.functions._
      val o = Tables.t(spark, sf, "orders")
        .select(pmod(col("o_custkey"), lit(10)).as("hot_key"),
          col("o_totalprice"))
      val n = Tables.t(spark, sf, "nation").where(col("n_nationkey") < 10)
      o.join(n, o("hot_key") === n("n_nationkey"))
        .groupBy("hot_key", "n_name")
        .agg(count(lit(1)).as("n"),
          Tables.dsum2(col("o_totalprice")).as("total"))
        .orderBy("hot_key")
        .collect()
    }
    assert(salted.toSeq === plain.toSeq)
  }

  test("observe metrics match a direct aggregation") {
    val obs = SparkEntry.queries("obs_accounting")(spark, sf).collect().head
    val li = Tables.t(spark, sf, "lineitem")
    assert(obs.getLong(0) === li.count())
  }

  test("quarantine splits good from corrupt without failing the job") {
    val rows = SparkEntry.queries("ingest_quarantine")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("ok", 3L, 70L), ("quarantined", 2L, 30L)))
  }
}
