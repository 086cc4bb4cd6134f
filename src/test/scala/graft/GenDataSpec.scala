package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the datagen that underwrites SCALING.md: determinism
  * (same SF + mode → bit-identical content regardless of run) and the
  * distribution laws the slope analysis assumes. */
class GenDataSpec extends AnyFunSuite {
  import SharedSpark.spark

  // Each test builds what it reads — no cross-test ordering dependency.
  private lazy val genA: String = {
    val d = s"${Tables.scratchRoot}/gendata_a"
    GenData.write(spark, d, 0.001)
    d
  }

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
    val d2 = s"${Tables.scratchRoot}/gendata_b"
    GenData.write(spark, d2, 0.001)
    assert(digest(genA) === digest(d2),
      "hash-derived generation must not depend on run or partitioning")
  }

  test("GenData --real is deterministic too, and differs from the default mode") {
    val r1 = s"${Tables.scratchRoot}/gendata_r1"
    val r2 = s"${Tables.scratchRoot}/gendata_r2"
    GenData.write(spark, r1, 0.001, realism = true)
    GenData.write(spark, r2, 0.001, realism = true)
    assert(digest(r1) === digest(r2))
    // the mode is live: lineitem (part skew) and documents (vocab tail)
    // must differ from the driver-matched default
    val dflt = digest(genA)
    val real = digest(r1)
    assert(real("lineitem") !== dflt("lineitem"))
    assert(real("documents") !== dflt("documents"))
    // untouched tables are identical across modes
    assert(real("customer") === dflt("customer"))
    assert(real("events") === dflt("events"))
  }

  test("GenData distribution laws: counts, monotone event time, derived n_chars") {
    import org.apache.spark.sql.functions._
    val d = genA
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
