package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-repetition counting kernel as ONE native pass per row:
  * word count, distinct-word count, and top-bigram frequency in a
  * single tokenize+hash sweep.
  *
  * Why an Expression: the HOF formulation counted each distinct
  * bigram's occurrences with `filter(bigrams, …)` INSIDE a lambda over
  * `array_distinct(bigrams)`, and `bigrams` itself rebuilt `words`
  * (the split) inside its own lambda — interpreted lambdas re-evaluate
  * referenced subtrees per element, so the chain was O(words³) per
  * row. Harmless at ~50-word synthetic docs, a cliff on real
  * 5,000-word documents — the same trap WinnowFps removes from the
  * winnow chain, one count-kernel over. This loop is O(words)
  * expected (hash map), allocation-light, and codegen-friendly.
  *
  * Exactness: identical integer results to the HOF chain — words are
  * `split(text, " ", -1)` (trailing empties kept, like Spark's
  * split), bigrams join adjacent words with a single space, and a
  * ≤1-word document has top_bigram = 0. LlmSpec pins bit-identity on
  * real docs plus empty/single-word/all-repeated edges.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires STRING, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    RepetitionStats.stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = graft.expr.RepetitionStats.stats($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false)))

  /** One tokenize+hash sweep. Called from generated code. */
  def stats(s: UTF8String): InternalRow = {
    val words = s.toString.split(" ", -1)
    val n = words.length
    val distinct = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { distinct.add(words(i)); i += 1 }
    var top = 0
    if (n > 1) {
      val counts = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val b = words(i) + " " + words(i + 1)
        val c = counts.merge(b, Integer.valueOf(1), (a, x) =>
          Integer.valueOf(a.intValue() + x.intValue()))
        if (c.intValue() > top) top = c.intValue()
        i += 1
      }
    }
    new GenericInternalRow(
      Array[Any](n.toLong, distinct.size.toLong, top.toLong))
  }
}
