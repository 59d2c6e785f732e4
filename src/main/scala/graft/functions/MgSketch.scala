package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries summary state: at most `k` counters plus the exact
  * total item count `n` (nulls excluded). The decrement bookkeeping
  * guarantees every item's stored count underestimates its true
  * frequency by at most n/(k+1) — across partial aggregation AND
  * shuffle-merged partials (the merge rule below is the mergeable-
  * summaries form of Agarwal et al., PODS 2012), so any item with
  * true count > n/(k+1) is guaranteed to survive in the final
  * candidate set.
  */
final class MgBuffer(val k: Int) {
  val counts = new JHashMap[String, java.lang.Long]()
  var n: Long = 0L

  def offer(key: String): Unit = {
    n += 1
    val cur = counts.get(key)
    if (cur != null) counts.put(key, cur + 1L)
    else if (counts.size < k) counts.put(key, 1L)
    else {
      // decrement-all: removes k+1 units of weight (k stored + the
      // uninserted newcomer), so decrement events number ≤ n/(k+1)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - 1L
        if (v == 0L) it.remove() else e.setValue(v)
      }
    }
  }

  def mergeFrom(o: MgBuffer): Unit = {
    n += o.n
    val oit = o.counts.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from every counter and
      // drop the non-positive — each of the ≥ k+1 counters loses ≥ the
      // dropped weight's share, so the n/(k+1) bound is preserved
      val arr = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { arr(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(arr)
      val c = arr(arr.length - 1 - k)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - c
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
  }
}

/** Exact distributed heavy hitters, phase one: a bounded-state
  * Misra-Gries candidate sketch as a Catalyst aggregate.
  *
  * `mg_sketch(expr)` → `struct(items ARRAY<STRING>, n BIGINT)`:
  * `items` (sorted, deterministic) is a SUPERSET of every value whose
  * true frequency exceeds n/(k+1); `n` is the exact non-null row
  * count. The catalog query recounts the ≤ k candidates exactly
  * (broadcast membership filter + one ordinary aggregate) and applies
  * the φ = 1/(k+1) threshold, so the emitted rows hash-match the
  * exact `HAVING count(*)*(k+1) > n` oracle — while the plan's state
  * is O(partitions · k) instead of a full distinct-key shuffle.
  *
  * At 100 TB: the sketch state is ≤ k (key, long) pairs per task
  * (~8 KB at k=127 for short keys) merged once per partition, and the
  * recount aggregates only rows matching ≤ k broadcast keys — key
  * cardinality (billions of users / n-grams) never reaches a shuffle.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val keys = new Array[String](buffer.counts.size)
    var i = 0
    val it = buffer.counts.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    InternalRow(
      new GenericArrayData(keys.map(s => UTF8String.fromString(s): Any)),
      buffer.n)
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeLong(buffer.n)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    buf.n = in.readLong()
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(new String(b, UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
