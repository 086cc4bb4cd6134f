package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-compressed length of a string (SQL name `deflate_len`) — the
  * kernel under the compression-ratio quality filter (Gopher-style:
  * text that compresses too well is repetitive boilerplate; text that
  * barely compresses is noise/encoded junk).
  *
  * Deterministic cross-engine: java.util.zip.Deflater and CPython's
  * zlib wrap the SAME zlib codec, and at an explicit fixed level the
  * compressed stream is byte-identical (verified: identical hex for
  * identical input at level 6), so an oracle pinned from CPython zlib
  * over the same rows is exact — not a tolerance check.
  *
  * Execution shape: one static call per row inside whole-stage
  * codegen; a thread-local Deflater is reset per row, so no native
  * allocations in the hot loop and no finalizer pressure. Compression
  * runs where the text lives — only (lang, source, two longs) leave
  * the scan, the text column never shuffles.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    DeflateLen.len(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DeflateLen.len($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "deflate_len"
}

object DeflateLen {
  /** Fixed level 6 = CPython zlib.compress default — the pinning
    * contract; do not change without regenerating the oracle. */
  private val Level = 6

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(Level, /*nowrap=*/ false)
  }

  /** Total zlib stream length (header + deflate blocks + adler32) of
    * the UTF-8 bytes. Called from generated code. */
  def len(s: UTF8String): Long = {
    val in = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
