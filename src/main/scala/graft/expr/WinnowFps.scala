package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (MOSS) as ONE native pass per row: k-gram
  * rolling polynomial hash + w-window minimum + first-occurrence
  * distinct, k=8 / w=4 / mod 1e9+7.
  *
  * Why an Expression instead of the nested-HOF formulation
  * (`transform(sequence…, i -> aggregate(slice(chars, i, k)…))`):
  * Catalyst higher-order functions are interpreted, and a lambda body
  * RE-EVALUATES every referenced subtree per element — `chars` inlined
  * into each gram and `grams` inlined into each window made the chain
  * O(len³) per row (measured: minutes per 300-char corpus partition at
  * sf0.1; this loop is microseconds). Same trap DotProductF64 documents,
  * one nesting level deeper.
  *
  * Exactness: identical integer math to the DuckDB oracle — chars are
  * code points (corpus is ASCII, where UTF-16 units == code points ==
  * `ord`), gram i folds chars[i..i+k) left-to-right as
  * (acc*31+c) mod 1e9+7 from seed 0, window j takes min over grams
  * [j..j+w), distinct keeps the first occurrence. Boundary semantics
  * replicate the HOF/oracle slicing: gram and window counts are
  * max(len-(k-1), 1) / max(nGrams-(w-1), 1), with short tail slices
  * capped at the array end; the empty string behaves as the single
  * char 0 (`ascii('') = 0`).
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires STRING, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    WinnowFps.fps(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = graft.expr.WinnowFps.fps($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

object WinnowFps {
  private final val K = 8
  private final val W = 4
  private final val P = 1000000007L

  /** One tight pass: chars → k-gram hashes → w-window minima →
    * first-occurrence distinct. Called from generated code. */
  def fps(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = math.max(str.length, 1)
    val ch = new Array[Long](n)
    var i = 0
    while (i < str.length) { ch(i) = str.charAt(i).toLong; i += 1 }
    val nG = math.max(n - (K - 1), 1)
    val grams = new Array[Long](nG)
    i = 0
    while (i < nG) {
      var acc = 0L
      var j = i
      val end = math.min(i + K, n)
      while (j < end) { acc = (acc * 31 + ch(j)) % P; j += 1 }
      grams(i) = acc
      i += 1
    }
    val nF = math.max(nG - (W - 1), 1)
    val seen = new java.util.HashSet[java.lang.Long](nF * 2)
    val out = new Array[Long](nF)
    var k = 0
    i = 0
    while (i < nF) {
      var m = java.lang.Long.MAX_VALUE
      var j = i
      val end = math.min(i + W, nG)
      while (j < end) { if (grams(j) < m) m = grams(j); j += 1 }
      if (seen.add(m)) { out(k) = m; k += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }
}
