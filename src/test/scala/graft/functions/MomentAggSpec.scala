package graft.functions

import java.math.RoundingMode

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, SparkEntry}
import graft.ops.Similarity

/** Parity proof for the [[MomentPartials]] production path: the
  * single-pass aggregate must be BIT-identical to the round-4
  * explode-then-hash-aggregate plans it replaced (same decimal
  * addends, associative exact sums), and the fast rounding path must
  * agree with `BigDecimal.valueOf(_).setScale(12, HALF_UP)` — the
  * exact semantics of Spark's `CAST(double AS DECIMAL(28,12))` —
  * including at adversarial near-halfway values. */
class MomentAggSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // --- fast-rounding fuzz -------------------------------------------

  private def reference(p: Double): BigInt = {
    val bd = java.math.BigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
    if (bd.precision > 28) BigInt(0) else BigInt(bd.unscaledValue())
  }

  private def viaBuffer(p: Double): BigInt = {
    val buf = new MomentBuffer(1)
    MomentPartials.addRounded(buf, 0, p)
    BigInt(buf.unscaled(0))
  }

  test("fast decimal rounding equals the BigDecimal reference on random and adversarial doubles") {
    val rnd = new scala.util.Random(42)
    // uniform in the embedding-product range, plus wide magnitudes
    val randoms = Seq.fill(200000)(rnd.nextDouble() * 8.0 - 4.0) ++
      Seq.fill(20000)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(20) - 10))
    // adversarial: exact scale-12 values, exact halfway points at
    // scale 13, shortest-repr boundary shapes, signed zeros, extremes
    val adversarial = Seq(
      0.0, -0.0, 1e-13, -1e-13, 5e-13, -5e-13, 1.5e-12, -1.5e-12,
      0.0000000000005, -0.0000000000005, 1.0000000000005,
      -1.0000000000005, 123.4567890123455, 0.1, 0.3, 1.0 / 3.0,
      2.5e-12, 3.5e-12, -2.5e-12, 1e16, -1e16, 4000.000000000001,
      1e15 + 0.5, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity) ++
      // values engineered to sit within one ulp of a halfway point
      (1 to 2000).map(k => (k * 2 - 1) * 5e-13) ++
      (1 to 2000).map(k => ((k * 2 - 1) * 5e-13) * (1 + 2e-16))
    (randoms ++ adversarial).foreach { p =>
      val want = if (p.isNaN || p.isInfinite) BigInt(0) else reference(p)
      assert(viaBuffer(p) == want, s"rounding mismatch for p=$p (${p.toString})")
    }
  }

  test("scale-10 fold rounding (MahalScore kernel) equals the BigDecimal reference") {
    def ref10(p: Double): Option[Long] = {
      if (p.isNaN || p.isInfinite) return None
      val bd = java.math.BigDecimal.valueOf(p).setScale(10, RoundingMode.HALF_UP)
      if (bd.precision > 28) None else Some(bd.unscaledValue().longValue())
    }
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(100000)(rnd.nextDouble() * 200.0 - 100.0) ++
      Seq.fill(20000)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(16) - 8)) ++
      Seq(0.0, -0.0, 5e-11, -5e-11, 1.00000000005, 66.746698, 1e19,
        Double.NaN, Double.PositiveInfinity) ++
      (1 to 2000).map(k => (k * 2 - 1) * 5e-11)
    vals.foreach { p =>
      val got = DecimalRound.unscaled10(p)
      ref10(p) match {
        case None => assert(got === DecimalRound.NullSentinel, s"p=$p")
        case Some(w) => assert(got === w, s"p=$p")
      }
    }
  }

  test("buffer long-lane overflow promotes to the BigInteger lane losslessly") {
    val buf = new MomentBuffer(1)
    buf.add(0, Long.MaxValue - 5)
    buf.add(0, 100) // overflows the long lane
    buf.add(0, 7)
    assert(buf.unscaled(0) == java.math.BigInteger.valueOf(Long.MaxValue - 5)
      .add(java.math.BigInteger.valueOf(107)))
    val other = new MomentBuffer(1)
    other.add(0, Long.MaxValue - 1)
    other.add(0, 50)
    buf.mergeFrom(other)
    assert(buf.unscaled(0) == java.math.BigInteger.valueOf(Long.MaxValue - 5)
      .add(java.math.BigInteger.valueOf(107))
      .add(java.math.BigInteger.valueOf(Long.MaxValue - 1))
      .add(java.math.BigInteger.valueOf(50)))
  }

  // --- plan-level parity with the round-4 explode forms --------------

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("sim09 production aggregate is bit-identical to the explode formulation") {
    val prod = rows(SparkEntry.queries("sim09_covariance")(spark, sf))
    val expl = rows(Similarity.covarianceExplode(spark, sf))
    assert(prod.nonEmpty && prod == expl)
  }

  test("sim10 production fold is bit-identical to the explode formulation") {
    val prod = rows(SparkEntry.queries("sim10_mahalanobis")(spark, sf))
    val expl = rows(Similarity.mahalanobisExplode(spark, sf))
    assert(prod.nonEmpty && prod == expl)
  }
}
