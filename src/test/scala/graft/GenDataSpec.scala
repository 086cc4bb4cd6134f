package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the datagen that underwrites SCALING.md: determinism
  * (same SF → bit-identical content regardless of run) and the
  * distribution laws the slope analysis assumes. */
class GenDataSpec extends AnyFunSuite {
  import SharedSpark.spark

  private def digest(dir: String): Map[String, (Long, BigDecimal)] = {
    import org.apache.spark.sql.functions._
    Seq("lineitem", "orders", "customer", "events", "documents",
      "embeddings", "part", "supplier", "nation", "region").map { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      // decimal sum: order-independent, no ANSI long overflow
      val r = df.select(count(lit(1)),
        sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
        .collect()(0)
      t -> ((r.getLong(0), BigDecimal(r.getDecimal(1))))
    }.toMap
  }

  test("GenData is deterministic: two runs at the same SF are row-identical") {
    val d1 = s"${Tables.scratchRoot}/gendata_a"
    val d2 = s"${Tables.scratchRoot}/gendata_b"
    GenData.write(spark, d1, 0.001)
    GenData.write(spark, d2, 0.001)
    assert(digest(d1) === digest(d2),
      "hash-derived generation must not depend on run or partitioning")
  }

  test("GenData distribution laws: counts, monotone event time, planted dups") {
    import org.apache.spark.sql.functions._
    val d = s"${Tables.scratchRoot}/gendata_a"
    assert(spark.read.parquet(s"$d/lineitem.parquet").count() === 6000L)
    assert(spark.read.parquet(s"$d/events.parquet")
      .select(col("ts"), lag("ts", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("event_id")).as("p"))
      .where(col("p") >= col("ts")).count() === 0L,
      "event timestamps must be strictly increasing")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    assert(docs.count() === 50L)
    // n_chars is derived from the text, never free-standing
    assert(docs.where(length(col("text")) =!= col("n_chars")).count() === 0L)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val norms = emb.select(sqrt(aggregate(col("embedding"), lit(0.0d),
      (a, x) => a + x * x)).as("n")).agg(min("n"), max("n")).collect()(0)
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-3 &&
      math.abs(norms.getDouble(1) - 1.0) < 1e-3, s"unit norms: $norms")
  }
}
