package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Partition-merged exact decimal accumulator for [[MomentPartials]].
  *
  * Each slot holds the running sum of DECIMAL(28,12) addends as an
  * unscaled integer: a primitive `long` lane for the hot path and a
  * lazily-allocated `BigInteger` overflow lane (decimal addition is
  * exact and associative, so per-partition partials merged in any
  * order equal the single global sum bit-for-bit — the property that
  * lets this replace the explode-then-hash-aggregate plan without
  * touching the oracle contract).
  */
final class MomentBuffer(val slots: Int) {
  val lo = new Array[Long](slots)
  var hi: Array[BigInteger] = null // allocated only if a slot overflows

  private def promote(i: Int, v: BigInteger): Unit = {
    if (hi == null) hi = new Array[BigInteger](slots)
    val base = if (hi(i) == null) BigInteger.valueOf(lo(i))
      else hi(i).add(BigInteger.valueOf(lo(i)))
    hi(i) = base.add(v)
    lo(i) = 0L
  }

  def add(i: Int, v: Long): Unit =
    if (hi != null && hi(i) != null) promote(i, BigInteger.valueOf(v))
    else try lo(i) = Math.addExact(lo(i), v)
    catch { case _: ArithmeticException => promote(i, BigInteger.valueOf(v)) }

  def addBig(i: Int, v: BigInteger): Unit = promote(i, v)

  def mergeFrom(o: MomentBuffer): Unit = {
    var i = 0
    while (i < slots) {
      if (o.hi != null && o.hi(i) != null) addBig(i, o.hi(i))
      add(i, o.lo(i))
      i += 1
    }
  }

  /** Final unscaled (scale-12) value of a slot. */
  def unscaled(i: Int): BigInteger = {
    val l = BigInteger.valueOf(lo(i))
    if (hi != null && hi(i) != null) hi(i).add(l) else l
  }
}

/** Exact corpus moments in ONE pass and ONE row — the production
  * shape for sim09/sim10 (replacing their per-row `posexplode` /
  * upper-triangle generate): per-dimension sums `sx`, and either the
  * full upper-triangle product sums `sxy` (row-major, `(i,j)` with
  * `j ≥ i` — the diagonal IS the per-dim sum of squares) or, in
  * `diag` mode, just the diagonal (`sxx`), at D instead of D(D+1)/2
  * slots per row.
  *
  * Parity contract: every addend is the double product rounded to
  * DECIMAL(28,12) exactly as Spark's `CAST(double AS DECIMAL(28,12))`
  * rounds it — HALF_UP on the SHORTEST decimal representation of the
  * double (`BigDecimal.valueOf`, i.e. `Double.toString`), not on its
  * exact binary expansion; the two differ when the binary value and
  * its shortest form straddle a scale-12 halfway point. The hot path
  * rounds with one multiply + floor and falls back to the BigDecimal
  * route only when the value lies within a conservative tolerance of
  * a halfway point (or is too large for the fast window), so the sum
  * is bit-identical to the `sum(CAST(p AS DECIMAL(28,12)))` the
  * DuckDB oracle and the old explode plan compute, at a few ns per
  * addend instead of a struct + hash-probe per addend. Elements the
  * old plan dropped (null array slots, non-finite or overflowing
  * products → CAST null) are skipped here identically.
  *
  * At 100 TB: the aggregation state is D(D+1)/2 longs (~16 KB at
  * D=64) per task, merged once per partition — the textbook mergeable
  * moment sketch, with zero row inflation into the scan.
  */
case class MomentPartials(
    child: Expression,
    dims: Int,
    diag: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentBuffer] with UnaryLike[Expression] {

  private val nProd = if (diag) dims else dims * (dims + 1) / 2
  private val slots = dims + nProd

  override def dataType: DataType = StructType(Seq(
    StructField("sx", ArrayType(DecimalType(38, 12), containsNull = false)),
    StructField(if (diag) "sxx" else "sxy",
      ArrayType(DecimalType(38, 12), containsNull = false))))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MomentBuffer = new MomentBuffer(slots)

  private def addRounded(buf: MomentBuffer, slot: Int, p: Double): Unit =
    MomentPartials.addRounded(buf, slot, p)

  override def update(buffer: MomentBuffer, input: InternalRow): MomentBuffer = {
    val a = child.eval(input)
    if (a == null) return buffer
    val arr = a.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dims)
    val xs = new Array[Double](dims)
    val ok = new Array[Boolean](dims)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { xs(i) = arr.getFloat(i).toDouble; ok(i) = true }
      i += 1
    }
    i = 0
    while (i < dims) {
      if (ok(i)) addRounded(buffer, i, xs(i))
      i += 1
    }
    if (diag) {
      i = 0
      while (i < dims) {
        if (ok(i)) addRounded(buffer, dims + i, xs(i) * xs(i))
        i += 1
      }
    } else {
      var pos = dims
      i = 0
      while (i < dims) {
        var j = i
        while (j < dims) {
          if (ok(i) && ok(j)) addRounded(buffer, pos, xs(i) * xs(j))
          pos += 1
          j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: MomentBuffer, other: MomentBuffer): MomentBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MomentBuffer): Any = {
    def dec(i: Int): Decimal =
      Decimal(new java.math.BigDecimal(buffer.unscaled(i), 12), 38, 12)
    val sx = new Array[Any](dims)
    var i = 0
    while (i < dims) { sx(i) = dec(i); i += 1 }
    val pr = new Array[Any](nProd)
    i = 0
    while (i < nProd) { pr(i) = dec(dims + i); i += 1 }
    InternalRow(new GenericArrayData(sx), new GenericArrayData(pr))
  }

  override def serialize(buffer: MomentBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.slots)
    var i = 0
    while (i < buffer.slots) { out.writeLong(buffer.lo(i)); i += 1 }
    val over = if (buffer.hi == null) Seq.empty[Int]
      else (0 until buffer.slots).filter(buffer.hi(_) != null)
    out.writeInt(over.size)
    over.foreach { idx =>
      out.writeInt(idx)
      val b = buffer.hi(idx).toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MomentBuffer(n)
    var i = 0
    while (i < n) { buf.lo(i) = in.readLong(); i += 1 }
    val nOver = in.readInt()
    i = 0
    while (i < nOver) {
      val idx = in.readInt()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      if (buf.hi == null) buf.hi = new Array[BigInteger](n)
      buf.hi(idx) = new BigInteger(b)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentPartials =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentPartials =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MomentPartials =
    copy(child = newChild)
}

object MomentPartials {

  /** Mirror of `CAST(p AS DECIMAL(28,12))` + running sum: see the
    * class doc for why the fast window is guarded by a halfway-point
    * tolerance rather than applied unconditionally. Package-visible
    * so the spec can fuzz it against the BigDecimal reference. */
  private[graft] def addRounded(buf: MomentBuffer, slot: Int, p: Double): Unit = {
    if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return
    val y = p * 1e12
    if (java.lang.Math.abs(y) < 4.0e15) {
      // distance of y from the nearest halfway point, vs the worst-case
      // gap between p's binary value and its shortest decimal form
      // (half an ulp) plus the p*1e12 rounding error — both scaled to
      // slot units
      val f = y - java.lang.Math.floor(y)
      val tol = java.lang.Math.ulp(p) * 0.5e12 +
        java.lang.Math.abs(y) * 1.2e-16 + 1e-9
      if (java.lang.Math.abs(f - 0.5) > tol) {
        buf.add(slot, java.lang.Math.floor(y + 0.5).toLong)
        return
      }
    }
    // slow path: exact shortest-representation rounding
    val bd = java.math.BigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
    if (bd.precision > 28) return // CAST overflow → null → dropped from sum
    val u = bd.unscaledValue()
    if (u.bitLength() < 63) buf.add(slot, u.longValueExact())
    else buf.addBig(slot, u)
  }
}
