package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Scale-10 sibling of [[MomentPartials]]'s scale-12 rounding: the
  * unscaled value of `CAST(p AS DECIMAL(28,10))` followed by the
  * BIGINT cast of its ×10¹⁰ scale-up, exactly as the SQL fold it
  * replaces computes it — shortest-representation HALF_UP (fast
  * multiply+floor window with a BigDecimal fallback near halfway
  * points), null (sentinel) for non-finite or precision-28 overflow,
  * two's-complement wrap past BIGINT range (the non-ANSI decimal→long
  * cast's behavior; unreachable at sane magnitudes and adjudicated by
  * the oracle if ever reached). */
object DecimalRound {

  /** Returned where the mirrored SQL yields NULL. Collides only with
    * an exact unscaled value of -2⁶³ — outside any real score. */
  final val NullSentinel = Long.MinValue

  def unscaled10(p: Double): Long = {
    if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return NullSentinel
    val y = p * 1e10
    if (java.lang.Math.abs(y) < 4.0e15) {
      val f = y - java.lang.Math.floor(y)
      val tol = java.lang.Math.ulp(p) * 0.5e10 +
        java.lang.Math.abs(y) * 1.2e-16 + 1e-9
      if (java.lang.Math.abs(f - 0.5) > tol)
        return java.lang.Math.floor(y + 0.5).toLong
    }
    val bd = java.math.BigDecimal.valueOf(p).setScale(10, RoundingMode.HALF_UP)
    if (bd.precision > 28) return NullSentinel
    bd.unscaledValue().longValue() // wraps past BIGINT range, like the cast
  }

  /** scale-10 unscaled long → the double the SQL tail produces
    * (`CAST(CAST(acc AS DECIMAL(28,0)) / 10¹⁰ AS DOUBLE)`). */
  def toDouble10(acc: Long): Double =
    java.math.BigDecimal.valueOf(acc, 10).doubleValue()
}

/** Fused diagonal-Mahalanobis score — the codegen replacement for
  * sim10's interpreted `aggregate` HOF fold (SCALE_NOTES named this
  * the next constant-factor lever): one generated loop over the D
  * dims computing Σ CAST((xᵢ-μᵢ)²/σᵢ² AS DECIMAL(28,10)) as an
  * unscaled-BIGINT accumulation, bit-identical to both the HOF fold
  * and the round-4 explode plan (MomentAggSpec). Null mirrors the
  * SQL: a null/short embedding under a positive-variance dimension
  * nullifies the row; a σ²≤0 (or null) dimension contributes exactly
  * 0 without touching the embedding element. */
case class MahalScore(emb: Expression, mu: Expression, v: Expression)
    extends TernaryExpression {

  override def first: Expression = emb
  override def second: Expression = mu
  override def third: Expression = v

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok = emb.dataType.isInstanceOf[ArrayType] &&
      emb.dataType.asInstanceOf[ArrayType].elementType == FloatType &&
      Seq(mu, v).forall(e => e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mahal_score expects (array<float>, array<double>, array<double>), got " +
        s"(${emb.dataType.catalogString}, ${mu.dataType.catalogString}, " +
        s"${v.dataType.catalogString})")
  }

  override def nullSafeEval(e: Any, m: Any, vv: Any): Any = {
    val xs = e.asInstanceOf[ArrayData]
    val ms = m.asInstanceOf[ArrayData]
    val vs = vv.asInstanceOf[ArrayData]
    val n = ms.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val vPos = !vs.isNullAt(i) && vs.getDouble(i) > 0.0
      if (vPos) {
        if (i >= xs.numElements() || xs.isNullAt(i) || ms.isNullAt(i)) return null
        val d = xs.getFloat(i).toDouble - ms.getDouble(i)
        val u = DecimalRound.unscaled10(d * d / vs.getDouble(i))
        if (u == DecimalRound.NullSentinel) return null
        acc += u
      }
      i += 1
    }
    DecimalRound.toDouble10(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, m, vv) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val u = ctx.freshName("u")
      val dr = "graft.functions.DecimalRound"
      s"""
         |int $n = $m.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$vv.isNullAt($i) && $vv.getDouble($i) > 0.0) {
         |    if ($i >= $e.numElements() || $e.isNullAt($i) || $m.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $d = (double) $e.getFloat($i) - $m.getDouble($i);
         |    long $u = $dr.unscaled10($d * $d / $vv.getDouble($i));
         |    if ($u == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; break; }
         |    $acc += $u;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dr.toDouble10($acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MahalScore =
    copy(emb = newFirst, mu = newSecond, v = newThird)
}
