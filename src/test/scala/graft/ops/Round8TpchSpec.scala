package graft.ops

import java.math.{BigDecimal => JBig, RoundingMode}
import java.time.{LocalDateTime, ZoneOffset}

import graft.{SparkEntry, SparkSpec, Tables}

/** Invariants for the round-8 TPC-H widening (Q12 / Q13 / Q15 / Q16 /
  * Q19 / Q22 analogs — the remaining shapes: conditional counts,
  * zero-preserving outer aggregation, correlated MAX, NOT-IN over
  * distinct pairs, the three-arm disjunction, scalar-average-gated
  * anti join). Like Round8OpsSpec, each test recomputes the query
  * naively driver-side over sf0.001 so a plan bug cannot hide behind
  * a matching oracle transcription; exact result parity with DuckDB
  * stays the Verify gate's job.
  */
class Round8TpchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private val dayMs = 86400000L
  private def ts(s: String) = LocalDateTime.parse(s.replace(" ", "T"))
  private def ms(t: LocalDateTime) = t.toInstant(ZoneOffset.UTC).toEpochMilli

  /** dsum's addend semantics: HALF_UP decimal cast at `scale`. */
  private def dec(x: Double, scale: Int) =
    new JBig(x).setScale(scale, RoundingMode.HALF_UP)

  private case class Line(order: Long, part: Long, supp: Long, qty: Double,
      price: Double, disc: Double, status: String, ship: LocalDateTime)
  private lazy val lines: Seq[Line] =
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_linestatus", "l_shipdate")
      .collect().toSeq.map { r =>
        Line(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getString(6),
          r.getAs[LocalDateTime](7))
      }
  private lazy val ordersByKey: Map[Long, (LocalDateTime, Long, String)] =
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderdate", "o_custkey", "o_orderpriority")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[LocalDateTime](1), r.getLong(1 + 1), r.getString(3)))).toMap
  private lazy val customers: Seq[(Long, Int, Double)] =
    Tables.customer(spark, sf).select("c_custkey", "c_nationkey", "c_acctbal")
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
  private lazy val parts: Map[Long, (String, String, Int)] =
    Tables.part(spark, sf).select("p_partkey", "p_brand", "p_type", "p_size")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getInt(3)))).toMap
  private lazy val suppBal: Map[Long, Double] =
    Tables.supplier(spark, sf).select("s_suppkey", "s_acctbal")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  // ---- q12: conditional counts over the late join ------------------

  test("q12: CASE counts equal the naive late-line classification") {
    val lo = ts("1996-01-01 00:00:00"); val hi = ts("1997-01-01 00:00:00")
    val late = lines.filter { l =>
      !l.ship.isBefore(lo) && l.ship.isBefore(hi) &&
        ordersByKey.get(l.order).exists { case (od, _, _) =>
          ms(l.ship) > ms(od) + 45 * dayMs
        }
    }
    val expected = late.groupBy(_.status).view.mapValues { ls =>
      val high = ls.count(l => Set("1-URGENT", "2-HIGH")(ordersByKey(l.order)._3))
      (high.toLong, (ls.size - high).toLong)
    }.toMap
    val got = q("q12_late_priority").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  // ---- q13: zero-preserving distribution ---------------------------

  test("q13: distribution includes customers with zero qualifying orders") {
    val perCust: Map[Long, Long] = ordersByKey.values.toSeq
      .filter(_._3 == "1-URGENT")
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val counts = customers.map { case (ck, _, _) => perCust.getOrElse(ck, 0L) }
    val expected = counts.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = q("q13_customer_distribution").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(expected.contains(0L),
      "fixture must exercise the zero-order bucket or the outer join is untested")
  }

  // ---- q15: correlated MAX ----------------------------------------

  test("q15: the returned supplier(s) carry exactly the maximum window revenue") {
    val lo = ts("1996-01-01 00:00:00"); val hi = ts("1996-04-01 00:00:00")
    val rev: Map[Long, JBig] = lines
      .filter(l => !l.ship.isBefore(lo) && l.ship.isBefore(hi))
      .groupBy(_.supp).view.mapValues(
        _.map(l => dec(l.price * (1.0 - l.disc), 4)).reduce(_.add(_))).toMap
    val mx = rev.values.map(_.doubleValue()).max
    val expected = rev.collect {
      case (s, v) if v.doubleValue() == mx => s -> v.doubleValue()
    }.toMap
    val got = q("q15_top_supplier").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == expected)
  }

  // ---- q16: NOT-IN over distinct supply pairs ----------------------

  test("q16: supplier counts equal the naive distinct-pair recomputation") {
    val sizes = Set(1, 4, 9, 14, 19, 23, 36, 45)
    val pairs = lines.map(l => (l.part, l.supp)).distinct
    val expected = pairs
      .filter { case (p, s) =>
        parts.get(p).exists { case (b, t, sz) =>
          b != "Brand#1" && t != "PROMO" && sizes(sz)
        } && suppBal.get(s).exists(_ >= 0)
      }
      .groupBy { case (p, _) => parts(p) }.view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    val got = q("q16_part_supplier_cnt").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(got == expected.map { case ((b, t, sz), n) => (b, t, sz) -> n })
  }

  // ---- q19: three-arm disjunction ----------------------------------

  test("q19: disjunctive revenue equals the naive per-arm sum") {
    def arm(l: Line, brand: String, szLo: Int, szHi: Int,
        qLo: Double, qHi: Double) =
      parts.get(l.part).exists { case (b, _, sz) =>
        b == brand && sz >= szLo && sz <= szHi && l.qty >= qLo && l.qty <= qHi
      }
    val matched = lines.filter(l =>
      arm(l, "Brand#12", 1, 5, 1, 11) || arm(l, "Brand#23", 1, 10, 10, 20) ||
        arm(l, "Brand#3", 1, 15, 20, 30))
    assert(matched.nonEmpty, "fixture must exercise at least one arm")
    val expected = matched.map(l => dec(l.price * (1.0 - l.disc), 4))
      .reduce(_.add(_)).doubleValue()
    val got = q("q19_disjunctive_revenue").head().getDouble(0)
    assert(got == expected)
  }

  // ---- q22: scalar-average-gated anti join -------------------------

  test("q22: groups equal the naive above-average no-recent-orders recomputation") {
    val cust = customers.filter { case (_, nk, _) => Set(0, 1, 2)(nk % 5) }
    val pos = cust.filter(_._3 > 0)
    val avg = pos.map(c => dec(c._3, 2)).reduce(_.add(_)).doubleValue() / pos.size
    val recent = ordersByKey.values.collect {
      case (od, ck, _) if !od.isBefore(ts("1999-01-01 00:00:00")) => ck
    }.toSet
    val kept = cust.filter { case (ck, _, bal) => bal > avg && !recent(ck) }
    assert(kept.nonEmpty, "fixture must keep at least one customer")
    val expected = kept.groupBy { case (_, nk, _) => nk % 5 }.view.mapValues { cs =>
      (cs.size.toLong,
        cs.map(c => dec(c._3, 2)).reduce(_.add(_)).doubleValue())
    }.toMap
    val got = q("q22_global_sales").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }
}
