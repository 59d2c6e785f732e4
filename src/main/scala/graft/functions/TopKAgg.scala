package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over struct rows: keeps the K SMALLEST
  * input structs under the struct's natural (lexicographic field)
  * ordering and returns them as a sorted array.
  *
  * This is the state primitive the streaming ANN probe (st09) needs:
  * a per-query "best k neighbors" aggregation whose state is K rows
  * — independent of how many candidates the probed cells contain.
  * The builtin alternatives both fail at scale: a window row_number
  * is not streaming-legal in append mode, and
  * `slice(array_sort(collect_list(...)))` accumulates EVERY candidate
  * in state (cell-proportional — corpus-growth-proportional — memory
  * per key, the textbook streaming scale-killer). Here `update` is a
  * K-bounded insertion (K is catalog-small, so the linear insert
  * beats heap constant factors), `merge` folds partials in any order
  * to the same K rows (min-k is a semilattice), and `eval` emits the
  * ascending array — callers encode "cosine DESC, id ASC" by putting
  * a negated sort key first, exactly like the sentinel-argmax trick
  * in the st05 core.
  *
  * Rows are pinned into UnsafeRow copies on insert (eval-time rows
  * are reused buffers) and shuffled as length-prefixed bytes. At
  * 100 TB: per-group state is K fixed-width rows; the aggregate is
  * map-side combinable, so each partition contributes at most K rows
  * to the exchange. */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[UnsafeRow]]
  with UnaryLike[Expression] {

  private def structType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val ordering: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(structType.fields.map(_.dataType))

  @transient private lazy val project = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[UnsafeRow] =
    scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]

  /** Insert `row` (already a private copy) keeping the buffer sorted
    * ascending and at most K long. */
  private def insert(buf: scala.collection.mutable.ArrayBuffer[UnsafeRow],
      row: UnsafeRow): Unit = {
    if (buf.size >= k && ordering.compare(row, buf.last) >= 0) return
    var i = buf.size
    buf += row // placeholder slot; shifted below
    while (i > 0 && ordering.compare(row, buf(i - 1)) < 0) {
      buf(i) = buf(i - 1)
      i -= 1
    }
    buf(i) = row
    if (buf.size > k) buf.remove(buf.size - 1)
  }

  override def update(buf: scala.collection.mutable.ArrayBuffer[UnsafeRow],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, project(v.asInstanceOf[InternalRow]).copy())
    buf
  }

  override def merge(buf: scala.collection.mutable.ArrayBuffer[UnsafeRow],
      other: scala.collection.mutable.ArrayBuffer[UnsafeRow]): scala.collection.mutable.ArrayBuffer[UnsafeRow] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val b = r.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.size)
      row.pointTo(b, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)
}
