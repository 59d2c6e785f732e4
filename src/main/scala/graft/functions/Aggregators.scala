package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` showcase (SURVEY.md §7.4/§7.7):
  * top-k rows per group with a BOUNDED buffer.
  *
  * Why this shape matters at 100 TB: the relational top-k-per-group
  * (`row_number() <= k`, o02/w02) shuffles EVERY row to rank it; this
  * aggregator keeps only k entries per group in the partial-aggregate
  * buffer, so the map side reduces each partition to ≤ k rows per
  * group before the exchange — the classic bounded-state pattern
  * Spark's built-in aggregates use, expressed through the typed API.
  *
  * Semantics are deterministic and oracle-checkable: order by value
  * DESC with event_id ASC tie-break — exactly
  * `row_number() OVER (ORDER BY value DESC, event_id ASC) <= k`.
  */
object TopKByValue {
  /** One candidate row: (event_id, value). */
  final case class Entry(event_id: Long, value: Double)
}

class TopKByValue(k: Int)
    extends Aggregator[TopKByValue.Entry, List[TopKByValue.Entry], Seq[TopKByValue.Entry]] {
  import TopKByValue.Entry

  require(k > 0, "k must be positive")

  /** Total order: value DESC, event_id ASC. */
  private def beats(a: Entry, b: Entry): Boolean =
    a.value > b.value || (a.value == b.value && a.event_id < b.event_id)

  /** Sorted (best-first) insert, truncated to k — O(k) per row, and
    * the buffer never exceeds k entries regardless of group size. */
  private def insert(buf: List[Entry], e: Entry): List[Entry] = {
    if (buf.lengthCompare(k) >= 0 && beats(buf.last, e)) buf // fast reject
    else {
      val (pre, post) = buf.span(b => beats(b, e))
      val merged = pre ::: (e :: post)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
  }

  override def zero: List[Entry] = Nil
  override def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(buf, e)
  override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
    b.foldLeft(a)(insert)
  override def finish(r: List[Entry]): Seq[Entry] = r

  override def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder[List[Entry]]()
  override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
}

/** Mergeable Bloom-filter build as a typed `Aggregator`: the buffer
  * is a fixed-size bitset (`mWords` 64-bit words), `reduce` sets the
  * k bit positions computed for each key, and `merge` is bitwise OR —
  * the property that makes the build DISTRIBUTED: every partition
  * builds a partial filter map-side and the exchange carries one
  * `mWords`-word bitset per partition, never the key stream.
  *
  * Bit positions are computed IN THE PLAN (see `Joins.bloomPosExpr`)
  * and fed to the aggregator as an array column, so the build and
  * probe sides share one SQL fragment — a single source of truth for
  * the hash family, with no JVM-side hashing to drift from it.
  */
class BloomAgg(mWords: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(mWords > 0, "bitset must be non-empty")

  override def zero: Array[Long] = new Array[Long](mWords)
  override def reduce(buf: Array[Long], positions: Seq[Long]): Array[Long] = {
    positions.foreach { p =>
      buf((p >>> 6).toInt) |= 1L << (p & 63)
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < mWords) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
