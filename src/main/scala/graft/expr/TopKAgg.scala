package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (score, id) pairs, kept sorted by
  * (score DESC, id ASC) — the same total order as
  * `row_number() OVER (ORDER BY score DESC, id)`, so results are
  * bit-identical to the window formulation. Linear-shift insertion is
  * O(k) per accepted row; rows worse than the current k-th are rejected
  * with a single comparison. */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def beats(s: Double, i: Long, pos: Int): Boolean =
    s > scores(pos) || (s == scores(pos) && i < ids(pos))

  def insert(s: Double, i: Long): Unit = {
    if (n == k && !beats(s, i, n - 1)) return
    var pos = if (n < k) n else n - 1
    if (n < k) n += 1
    while (pos > 0 && beats(s, i, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = i
  }
}

/** Top-k per group as a NATIVE aggregate — the scale-correct shape for
  * "k best rows per key" (reference analog: keep-latest collision
  * handling, child.py:185-188).
  *
  * The window formulation (`row_number() <= k`, see topk_group) must
  * shuffle EVERY input row to its group's partition and sort the whole
  * group before discarding all but k. This aggregate keeps a k-bounded
  * buffer per group and is map-side combinable: each input partition
  * sends at most k pairs per group across the wire, and no full-group
  * sort ever happens. At 100 TB with millions of rows per group that is
  * the difference between shuffling the corpus and shuffling k·groups.
  * Result order is pinned to (score DESC, id ASC), so it is bit-equal
  * to the window version and shares its oracle. */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData((0 until buf.n).map(i =>
      InternalRow(buf.scores(i), buf.ids(i))).toArray[Any])

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var i = 0
    // entries arrive already sorted; insert preserves order
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(score = newLeft, id = newRight)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"
}

object TopKAgg {
  /** Register `topk_pairs(score, id, k)` (k must be an int literal). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("topk_pairs",
      exprs => {
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_pairs k must be an INT literal, got $other")
        }
        TopKAgg(exprs(0), exprs(1), k)
      }, "built-in")
  }
}
