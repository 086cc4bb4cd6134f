package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over `ARRAY<DOUBLE>` — the kernel under every
  * cosine/norm in the similarity family (sim_cosine_topk, sim_ann_lsh,
  * sim_ann_ivf, sim_range_search, dedup_embed, embed_normalize).
  *
  * Why an Expression instead of `aggregate(zip_with(a, b, _*_), 0, _+_)`:
  * Catalyst higher-order functions do not participate in whole-stage
  * codegen — each row pays interpreted lambda dispatch per ELEMENT,
  * plus a materialized intermediate array from zip_with. This is one
  * static call per row with a tight primitive loop inside, no
  * intermediate allocation, and it keeps the surrounding stage fused.
  * On a 100 TB corpus the dot product runs O(pairs·d) times — it is
  * the single hottest scalar in the engine.
  *
  * Bit-exactness: the loop accumulates a(i)*b(i) left-to-right in
  * index order — the identical IEEE fold the HOF formulation and the
  * DuckDB `list_reduce` oracles perform, so swapping it into
  * oracle-verified queries changes no output bit (VectorOpsSpec pins
  * this against the HOF on real and adversarial vectors).
  *
  * Null semantics replicate the HOF chain exactly: null array → null;
  * length mismatch → null (zip_with pads with null, the product
  * poisons the fold); null ELEMENT → null.
  */
case class DotProductF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot64 requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
          s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductF64.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("dotResult")
      s"""
        java.lang.Double $d = graft.expr.DotProductF64.dot($a, $b);
        if ($d == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $d.doubleValue();
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot64"
}

object DotProductF64 {
  /** Left-to-right IEEE fold; null on length mismatch or null element
    * (the HOF chain's exact semantics). Called from generated code. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
