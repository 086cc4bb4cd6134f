package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for filename sanitization (reference
  * child.py:20-33; semantics documented in [[Sanitize]]).
  *
  * Why an Expression instead of the regexp_replace chain: this runs on
  * every row of a 100 TB ingest manifest. A single pass over the bytes
  * with a branchless ASCII table beats regex matching (no NFA, no
  * per-row Matcher state), stays inside whole-stage codegen via
  * doGenCode, and allocates only when the name actually changes.
  *
  * UTF-8 note: every byte of a multi-byte codepoint has the high bit
  * set, so mapping each non-ASCII *byte* would emit one '-' per byte,
  * not per codepoint. The loop therefore decodes the UTF-8 length from
  * the lead byte and emits exactly one '-' per codepoint — matching
  * Python re / Java regex semantics (one hyphen per emoji).
  */
case class SanitizeFilename(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sanitize_filename requires STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SanitizeFilename.sanitizeBytes(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.SanitizeFilename.sanitizeBytes($c.getBytes()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sanitize_filename"
}

object SanitizeFilename {
  /** allowed[b] for ASCII b: letter, digit, '.', '_', '-', ' '. */
  private val allowed: Array[Boolean] = {
    val a = new Array[Boolean](128)
    for (c <- 'A' to 'Z') a(c) = true
    for (c <- 'a' to 'z') a(c) = true
    for (c <- '0' to '9') a(c) = true
    a('.') = true; a('_') = true; a('-') = true; a(' ') = true
    a
  }

  /** Single pass over UTF-8 bytes; one '-' per disallowed codepoint;
    * strips leading/trailing spaces. Called from generated code. */
  def sanitizeBytes(bytes: Array[Byte]): String = {
    val n = bytes.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 128) {
        sb.append(if (allowed(b)) b.toChar else '-')
        i += 1
      } else {
        // UTF-8 lead byte → codepoint length 2..4; one '-' per codepoint.
        val len =
          if (b >= 0xf0) 4 else if (b >= 0xe0) 3 else 2
        sb.append('-')
        i += len
      }
    }
    // strip spaces only (reference strips ' ' specifically)
    var s = 0
    var e = sb.length()
    while (s < e && sb.charAt(s) == ' ') s += 1
    while (e > s && sb.charAt(e - 1) == ' ') e -= 1
    sb.substring(s, e)
  }
}
