package graft.expr

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** 64-bit SimHash bit-vote aggregation as a typed Aggregator.
  *
  * Input is the per-token 64-bit hash; each hash votes +1 on every set
  * bit and -1 on every clear bit; strictly-positive vote totals become
  * set fingerprint bits. Semantically identical to the declarative
  * 64-column `sum(when(...))` formulation it replaces, but the buffer
  * is one 64-int array and the update is a tight JVM loop — no
  * 64-aggregate whole-stage codegen, whose janino compile alone cost
  * ~4 s per session. Merge is element-wise add, so partial (map-side)
  * aggregation applies: the shuffle carries 64 ints per doc, never the
  * token stream.
  *
  * Output is [fp_hi, fp_lo]: the high/low 32 fingerprint bits, each in
  * a long, matching the (fp_hi, fp_lo) layout the pigeonhole pair join
  * chunks on.
  */
class SimhashAgg extends Aggregator[Long, Array[Int], Array[Long]] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var i = 0
    while (i < 64) {
      buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Array[Long] = {
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 32) { if (buf(i) > 0) lo |= 1L << i; i += 1 }
    while (i < 64) { if (buf(i) > 0) hi |= 1L << (i - 32); i += 1 }
    Array(hi, lo)
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
