package graft.expr

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a typed Aggregator (the UDAF surface from
  * SURVEY.md §2b): aggregates exploded shingles into a k-slot minimum
  * signature. Buffer is k longs regardless of group size; merge is
  * element-wise min, so partial (map-side) aggregation applies — the
  * shuffle carries k longs per doc, never the shingle set.
  *
  * Hash is IDENTICAL to the expression-level path
  * (`xxhash64(lit(seed), shingle)` = XXH64(seed=42) over the int then
  * the UTF-8 bytes), so the two implementations cross-validate
  * bit-for-bit (LlmSpec).
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val u = UTF8String.fromString(shingle)
    var i = 0
    while (i < k) {
      val h = XXH64.hashUnsafeBytes(
        u.getBaseObject, u.getBaseOffset, u.numBytes, XXH64.hashInt(i, 42L))
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
