package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.MGBuf

/** Pins for the Misra–Gries summary (expr/MisraGries.scala) and the
  * agg_heavy_hitters 2-pass query: the classic frequency guarantee, the
  * mergeable-summaries bound under arbitrary stream splits, and
  * exactness of the end-to-end query against a brute-force group-by. */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // Deterministic skewed stream: key k_i appears ~n/(i+1) times
  // (zipf-ish), interleaved round-robin so heavy keys are spread out.
  private def zipfStream(nKeys: Int, scale: Int): Seq[String] =
    (0 until nKeys).flatMap(i => Seq.fill(scale / (i + 1))(s"k$i"))
      .zipWithIndex.sortBy { case (_, idx) => (idx * 2654435761L) % 1000003 }
      .map(_._1)

  test("MG guarantee: counter in [true - n/(m+1), true], heavy keys present") {
    val stream = zipfStream(50, 2000)
    val n = stream.length
    val m = 9
    val buf = new MGBuf(m)
    stream.foreach(buf.add(_, 1L))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val err = n / (m + 1)
    assert(buf.counts.size <= m)
    buf.counts.forEach { (k, lb) =>
      assert(lb <= truth(k), s"$k overcounted: $lb > ${truth(k)}")
      assert(lb >= truth(k) - err, s"$k undercounted past the bound")
    }
    truth.foreach { case (k, c) =>
      if (c > err)
        assert(buf.counts.containsKey(k), s"heavy key $k (count $c) dropped")
    }
  }

  test("MG merge keeps the bound across arbitrary stream splits") {
    val stream = zipfStream(40, 1500)
    val n = stream.length
    val m = 7
    val err = n / (m + 1)
    // Split into uneven chunks, summarize each, merge pairwise.
    val chunks = Seq(
      stream.slice(0, 13), stream.slice(13, 700),
      stream.slice(700, 711), stream.slice(711, n))
    val agg = MisraGriesAggTestAccess.mergeAll(m, chunks)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(agg.counts.size <= m)
    agg.counts.forEach { (k, lb) =>
      assert(lb <= truth(k), s"$k overcounted after merge")
      assert(lb >= truth(k) - err, s"$k merged counter below the bound")
    }
    truth.foreach { case (k, c) =>
      if (c > err)
        assert(agg.counts.containsKey(k), s"heavy key $k lost in merge")
    }
  }

  test("weighted add (merge path) admits a key heavier than the floor") {
    val buf = new MGBuf(2)
    buf.add("a", 10L); buf.add("b", 3L)
    buf.add("c", 8L) // must evict b (weight 3) and survive with mass left
    assert(buf.counts.containsKey("a"))
    assert(buf.counts.containsKey("c"))
    assert(!buf.counts.containsKey("b"))
  }

  test("agg_heavy_hitters equals brute-force exact counts") {
    val df = SparkEntry.queries("agg_heavy_hitters")(spark, SharedSpark.sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val words = Tables.t(spark, SharedSpark.sf, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
    val n = words.count()
    val brute = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 500 > n)
      .orderBy(col("cnt").desc, col("word"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == brute)
    assert(got.nonEmpty, "fixture corpus must have words above 0.2% share")
  }
}

/** Test-only helper kept out of the spec class so the chunked merge can
  * be reused; builds one buffer per chunk and folds them together the
  * way partial aggregation does. */
object MisraGriesAggTestAccess {
  def mergeAll(m: Int, chunks: Seq[Seq[String]]): MGBuf =
    chunks.map { ch =>
      val b = new MGBuf(m); ch.foreach(b.add(_, 1L)); b
    }.reduce { (a, b) =>
      b.counts.forEach { (k, v) =>
        a.counts.put(k, a.counts.getOrDefault(k, 0L) + v)
      }
      a.shrinkToCapacity()
      a
    }
}
