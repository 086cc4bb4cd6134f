package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pin for ml_kmeans: the distributed Lloyd iterations must agree with
  * an independent single-threaded reference run of the same integer
  * recurrence over the collected points. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("ml_pq matches a driver-side reference and recalls against exact L2") {
    val pts = Tables.t(spark, SharedSpark.sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => floor((x.cast("double") + 1.0d) * 1000000.0d).cast("long"))
        .as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val byId = pts.toMap
    // Train the codebook with the PqRef driver-side Lloyd reference,
    // encode every vector, build per-query ADC tables, exact top-10.
    val cb = PqRef.train(byId)
    val codes = PqRef.encode(byId, cb)
    val expected = (0L until 5L).flatMap { q =>
      val qp = byId(q)
      def qd(s: Int, c: Long): Long = PqRef.sqd(PqRef.sub(qp, s), cb((s, c)))
      pts.filter(_._1 != q).map { case (id, _) =>
        (q, id, (0 until 4).map(s => qd(s, codes(id)(s))).sum)
      }.sortBy { case (_, id, ad) => (ad, id) }.take(10)
        .zipWithIndex.map { case ((qq, id, ad), i) => (qq, id, ad, i + 1) }
    }
    val got = SparkEntry.queries("ml_pq")(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got == expected)
  }

  test("ml_pq retrieval is cluster-pure on clustered data") {
    // The corpus embeddings are uniform-random — distance concentration
    // makes ANY compressed index near-random there, so the retrieval
    // QUALITY pin runs on data with cluster structure, where PQ is
    // actually used: 4 well-separated centers, every vector a small
    // deterministic perturbation of its center, and the Lloyd-trained
    // codebook must recover entries INSIDE the clusters (the 8 seeds
    // cover all 4 clusters under (id/2) mod 4, so no entry's mean can
    // straddle two clusters). Each query's entire ADC top-10 must come
    // from its own cluster, and the corpus-query correctness stays
    // pinned by the reference-equality test above plus the DuckDB
    // oracle.
    def center(j: Int): Array[Double] =
      Array.tabulate(64)(k => ((k * 7 + j * 13) % 17) / 17.0 - 0.5)
    def clusterOf(id: Long): Int = ((id / 2) % 4).toInt
    def vec(id: Long): Array[Double] = {
      val c = center(clusterOf(id))
      Array.tabulate(64)(k =>
        c(k) + ((id * 31 + k * 7) % 11 - 5) / 1000.0)
    }
    val ids = (0L until 200L)
    val dir = s"${Tables.scratchRoot}/pq_fixture"
    val sp = spark
    import sp.implicits._
    ids.map(id => (id, vec(id).map(_.toFloat))).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("ml_pq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 50, "5 queries x top-10")
    got.foreach { case (q, id) =>
      assert(clusterOf(id) == clusterOf(q),
        s"query $q (cluster ${clusterOf(q)}) retrieved $id " +
          s"(cluster ${clusterOf(id)})")
    }
  }

  test("ml_kmeans matches a driver-side reference of the integer Lloyd loop") {
    val pts = Tables.t(spark, SharedSpark.sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => floor((x.cast("double") + 1.0d) * 1000000.0d).cast("long"))
        .as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    assert(pts.nonEmpty)
    assert(pts.forall(_._2.forall(_ >= 0L)), "micro-units must be positive")

    var cent: Map[Long, Array[Long]] =
      pts.filter(_._1 < 8).map { case (id, p) => id -> p }.toMap
    var assign: Map[Long, Long] = Map.empty
    for (_ <- 1 to 3) {
      assign = pts.map { case (id, p) =>
        val best = cent.toSeq.map { case (cl, cp) =>
          var d = 0L
          var i = 0
          while (i < p.length) { val t = p(i) - cp(i); d += t * t; i += 1 }
          (d, cl)
        }.min // (dist, cl) lexicographic = the window's tie-break
        id -> best._2
      }.toMap
      cent = pts.groupBy(t => assign(t._1)).map { case (cl, members) =>
        val dims = members.head._2.length
        val cp = Array.tabulate(dims) { i =>
          members.map(_._2(i)).sum / members.length // positive floor div
        }
        cl -> cp
      }
    }
    val expected = assign.groupBy(_._2).toSeq.map { case (cl, m) =>
      (cl, m.size.toLong, m.keys.sum, cent(cl)(0))
    }.sortBy(_._1)

    val got = SparkEntry.queries("ml_kmeans")(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }
}
