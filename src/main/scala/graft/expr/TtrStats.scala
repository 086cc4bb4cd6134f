package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Lexical-diversity counting kernel as ONE native pass per row:
  * token count, distinct-token count, and the Simpson numerator Σf²
  * in a single tokenize+hash sweep.
  *
  * Why an Expression: the declarative formulation explodes every
  * token into a (doc_id, token) row, hash-aggregates twice, and ships
  * the tokens through a shuffle — at 100 TB that shuffle IS the cost,
  * and it carries information the final row never needs (each doc's
  * result is a pure function of that doc's text). This kernel is the
  * [[RepetitionStats]] discipline applied to the diversity triple:
  * O(tokens) expected per row, zero shuffle, codegen-friendly (one
  * static call fused into whole-stage codegen).
  *
  * Exactness: identical integers to the exploded chain — tokens are
  * `split(text, " ", -1)` (trailing empties kept, matching Spark's
  * split), Σf² accumulates per-token counts in a hash map. LlmSpec
  * pins bit-identity against the exploded two-aggregate formulation
  * on the gate corpus. */
case class TtrStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TtrStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ttr_stats requires STRING, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    TtrStats.stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = graft.expr.TtrStats.stats($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ttr_stats"
}

object TtrStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("s2", LongType, nullable = false)))

  /** One tokenize+hash sweep. Called from generated code. */
  def stats(s: UTF8String): InternalRow = {
    val words = s.toString.split(" ", -1)
    val n = words.length
    val counts = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      counts.merge(words(i), java.lang.Long.valueOf(1L), (a, x) =>
        java.lang.Long.valueOf(a.longValue() + x.longValue()))
      i += 1
    }
    var s2 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val f = it.next().longValue(); s2 += f * f }
    new GenericInternalRow(
      Array[Any](n.toLong, counts.size.toLong, s2))
  }
}
