package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every driver-contract query must run at sf0.001; flagship must be
  * non-empty; oracle keys must reference existing queries. */
class QueriesSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // Queries whose result can legitimately be empty at tiny scale.
  private val mayBeEmpty = Set("join_range")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("known cardinalities at sf0.001") {
    assert(SparkEntry.queries("scan_parquet")(spark, sf).count() === 5 + 20)
    assert(SparkEntry.queries("agg_hash")(spark, sf).count() <= 6)
    assert(SparkEntry.queries("sort_limit")(spark, sf).count() === 100)
    assert(SparkEntry.queries("sim_cosine_topk")(spark, sf).count() === 50)
  }
}
