package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-2 ADVICE fixes: strong scratch keying, option
  * validation, and loud failure on replay anomalies. */
class RobustnessSpec extends AnyFunSuite {
  import SharedSpark.spark

  test("scratch checkpoint keys survive String.hashCode collisions") {
    // "Aa" and "BB" collide under String.hashCode (2112) — the round-2
    // keying would have silently shared these two datasets' checkpoints.
    assert("/data/Aa".hashCode === "/data/BB".hashCode)
    assert(ops.Llm.Scratch.key("/data/Aa") !== ops.Llm.Scratch.key("/data/BB"))
    // and the key is stable (pure function of the path)
    assert(ops.Llm.Scratch.key("/data/Aa") === ops.Llm.Scratch.key("/data/Aa"))
  }

  test("agg_approx_quantile is self-auditing: rel_err column ≤ 1%") {
    import org.apache.spark.sql.functions._
    val sf = SharedSpark.sf
    val out = SparkEntry.queries("agg_approx_quantile")(spark, sf)
    // flat scalar schema (the driver gate sorts cells via pandas —
    // arrays would crash it, the r4 red row)
    assert(out.schema.fields.forall(f =>
      !f.dataType.typeName.startsWith("array")), "no array columns")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("rel_err")
      assert(err <= 0.01, s"${r.getString(0)}: rel_err $err > 1%")
    }
    // and the audit channel itself is honest: recompute one exact
    // percentile independently and compare to the embedded exact_q50
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(percentile(col("l_extendedprice"), lit(0.5)), 6).as("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("exact_q50") - exact(r.getString(0))) < 1e-6)
    }
  }

  test("RemoteFileSource rejects a missing/empty 'urls' option loudly") {
    val e1 = intercept[Exception] {
      spark.read.format("graft.sources.RemoteFileSource").load().count()
    }
    assert(e1.getMessage.contains("urls"),
      s"error must name the missing option, got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.RemoteFileSource")
        .option("urls", " , ").load().count()
    }
    assert(e2.getMessage.contains("urls"))
  }

  test("RemoteMicroBatchStream fails loudly when a batch record is missing") {
    val ckpt = new java.io.File(s"${Tables.scratchRoot}/test-replay-anomaly")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete(): Unit
    }
    if (ckpt.exists()) del(ckpt)
    val stream = new sources.RemoteMicroBatchStream(
      urls = Seq(s"ftp://localhost:21${ops.Ingest.buildFixture()}"),
      numPartitions = 2, batchSize = Int.MaxValue,
      required = sources.RemoteFileSource.schema,
      checkpointLocation = ckpt.getAbsolutePath)
    // No admission record exists for offset 0 (fresh batch log), yet the
    // offset range [0, 3) claims admitted files: replay must throw, not
    // silently plan zero rows.
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(
        sources.RemoteOffset(0L), sources.RemoteOffset(3L))
    }
    assert(e.getMessage.contains("no admission record"))
    // An EMPTY range with no record is legitimate (nothing to read).
    assert(stream.planInputPartitions(
      sources.RemoteOffset(0L), sources.RemoteOffset(0L)).isEmpty)
  }

  test("variant parsing is lenient: malformed props yield null fields, not errors") {
    import org.apache.spark.sql.functions._
    val sp = SharedSpark.spark
    import sp.implicits._
    val df = Seq((1L, """{"k": 7}"""), (2L, "not json at all"), (3L, null))
      .toDF("event_id", "props")
      .select(col("event_id"),
        variant_get(try_parse_json(col("props")), "$.k", "long").as("k_val"))
      .orderBy("event_id")
    val rows = df.collect()
    assert(rows(0).getLong(1) === 7L)
    assert(rows(1).isNullAt(1), "malformed JSON must yield null, not throw")
    assert(rows(2).isNullAt(1))
  }

  test("win_gapfill emits a dense per-type grid with LOCF over gaps") {
    val sp = SharedSpark.spark
    val rows = SparkEntry.queries("win_gapfill")(sp, SharedSpark.sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    val sizes = byType.values.map(_.length).toSet
    assert(sizes.size == 1, s"every type must span the same grid: $sizes")
    byType.values.foreach { rs =>
      val slots = rs.map(_.getLong(1)).sorted
      // Dense: consecutive slots 600 s apart, no holes.
      assert(slots.zip(slots.tail).forall { case (a, b) => b - a == 600 })
      // LOCF: a gap slot (n=0) after any observation carries a value.
      var seen = false
      rs.sortBy(_.getLong(1)).foreach { r =>
        if (r.getLong(2) > 0) seen = true
        else if (seen) assert(!r.isNullAt(3), "gap after data must carry LOCF")
      }
    }
  }

  test("topk_pairs rejects non-positive k at registration") {
    val sp = SharedSpark.spark
    graft.expr.TopKAgg.register(sp)
    val e = intercept[Exception] {
      sp.sql("SELECT topk_pairs(CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT), 0)")
        .collect()
    }
    assert(e.getMessage.contains("k must be an INT literal >= 1")
      || Option(e.getCause).exists(_.getMessage.contains("k must be")),
      s"got: ${e.getMessage}")
  }
}
