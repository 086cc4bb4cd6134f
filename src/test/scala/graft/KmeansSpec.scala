package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pin for ml_kmeans: the distributed Lloyd iterations must agree with
  * an independent single-threaded reference run of the same integer
  * recurrence over the collected points. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

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
