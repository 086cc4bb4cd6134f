package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IntersectCountSorted64 must be a drop-in for
  * `size(array_intersect(a, b))` on array_sort'd inputs — identical
  * counts (duplicate collapse, null-element match, null array) — or
  * dedup_minhash_recall's exact-truth audit would silently drift. */
class IntersectCountSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  private def native(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = call_function("isect_count_s64", a, b)
  private def builtin(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    size(array_intersect(a, b)).cast("long")

  test("isect_count_s64 equals size(array_intersect) on every corpus shingle-set pair") {
    import spark.implicits._
    // the operator's own arrays: per-doc distinct shingle hashes,
    // value-sorted (sf0.001: 50 docs → 2,500 pairs, all compared)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        array_sort(transform(graft.ops.Llm.shingles(col("text")),
          g => xxhash64(g))).as("ghss"))
    val a = docs.select(col("doc_id").as("a_id"), col("ghss").as("ga"))
    val b = docs.select(col("doc_id").as("b_id"), col("ghss").as("gb"))
    val rows = a.crossJoin(b)
      .select(native(col("ga"), col("gb")).as("n"),
        builtin(col("ga"), col("gb")).as("h"))
      .as[(Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n === h) }
    // sanity: self-pairs intersect fully, so nonzero counts exist
    assert(rows.count { case (n, _) => n.exists(_ > 0L) } > 0)
  }

  test("isect_count_s64 adversarial shapes match the builtin: dups, nulls, empty, disjoint") {
    import spark.implicits._
    val cases: Seq[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])] = Seq(
      (Some(Seq(Some(1L), Some(2L), Some(3L))), Some(Seq(Some(2L), Some(3L), Some(4L)))),
      (Some(Seq(Some(1L), Some(1L), Some(2L))), Some(Seq(Some(1L), Some(2L), Some(2L)))), // dups collapse
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), None))), // null matches once
      (Some(Seq(Some(1L), None)), Some(Seq(Some(2L)))), // null only on one side
      (Some(Seq.empty), Some(Seq(Some(1L)))), // empty
      (None, Some(Seq(Some(1L)))), // null array
      (Some(Seq(Some(-5L), Some(0L))), Some(Seq(Some(1L), Some(2L)))), // disjoint
      (Some(Seq(Some(Long.MinValue), Some(Long.MaxValue))),
        Some(Seq(Some(Long.MinValue), Some(Long.MaxValue)))) // extremes
    )
    val df = cases.toDF("a", "b")
      .select(array_sort(col("a").cast("array<bigint>")).as("a"),
        array_sort(col("b").cast("array<bigint>")).as("b"))
    val out = df.select(native(col("a"), col("b")).as("n"),
      builtin(col("a"), col("b")).as("h"))
      .as[(Option[Long], Option[Long])].collect()
    out.foreach { case (n, h) => assert(n === h) }
    assert(out(0) === ((Some(2L), Some(2L))))
    assert(out(1) === ((Some(2L), Some(2L))))
    assert(out(2) === ((Some(2L), Some(2L)))) // {1, null}
    assert(out(5) === ((None, None)))
  }

  test("dedup_minhash_recall prefix-filter truth is row-identical to the naive join") {
    // the operator-level guarantee the kernel swap must preserve
    // (same pin LlmSpec carries; re-asserted here against THIS change)
    val pf = graft.ops.Llm.dedupMinhashRecallPlan(spark, sf,
      prefixFiltered = true).collect().toSeq
    val naive = graft.ops.Llm.dedupMinhashRecallPlan(spark, sf,
      prefixFiltered = false).collect().toSeq
    assert(pf === naive)
    assert(pf.nonEmpty)
  }
}
