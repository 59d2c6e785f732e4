package graft.ops

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Row

import graft.{SparkEntry, SparkSpec, Tables}

/** Invariants for the round-8 TPC-H decorrelation shapes (Q2 / Q4 /
  * Q20 / Q21 analogs). Exact result parity is the DuckDB oracle's
  * job — these recompute each query's semantics naively (driver-side
  * loops over the sf0.001 fixture) and require the distributed plans
  * to agree, so a decorrelation bug cannot hide behind a matching
  * oracle transcription of the same mistake.
  */
class Round8OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private val dayMs = 86400000L

  // naive in-memory copies of the tiny fixture tables
  private case class Line(order: Long, part: Long, supp: Long, qty: Double,
      price: Double, ship: LocalDateTime)
  private lazy val lines: Seq[Line] =
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_shipdate")
      .collect().toSeq.map { r =>
        Line(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getAs[LocalDateTime](5))
      }
  private lazy val ordersByKey: Map[Long, (LocalDateTime, String, String)] =
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority")
      .collect().map(r => r.getLong(0) -> ((r.getAs[LocalDateTime](1), r.getString(2),
        r.getString(3)))).toMap

  private def ts(s: String) = LocalDateTime.parse(s.replace(" ", "T"))
  private def ms(t: LocalDateTime) = t.toInstant(ZoneOffset.UTC).toEpochMilli

  // ---- q4: EXISTS decorrelation ------------------------------------

  test("q4: semi-join counts equal the naive per-order EXISTS recomputation") {
    val lateOrders: Set[Long] = lines.filter { l =>
      ordersByKey.get(l.order).exists { case (od, _, _) =>
        ms(l.ship) > ms(od) + 30 * dayMs
      }
    }.map(_.order).toSet
    val expected = ordersByKey.toSeq
      .filter { case (k, (od, _, _)) =>
        !od.isBefore(ts("1996-01-01 00:00:00")) && od.isBefore(ts("1996-04-01 00:00:00")) &&
          lateOrders.contains(k)
      }
      .groupBy(_._2._3).view.mapValues(_.size.toLong).toMap
    val got = q("q4_order_priority").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // and the output order is by priority
    val prios = q("q4_order_priority").collect().map(_.getString(0)).toSeq
    assert(prios == prios.sorted)
  }

  // ---- q2: correlated-MIN subquery ---------------------------------

  test("q2: every row carries its part's true EUROPE-region minimum unit cost") {
    val eurSupp: Set[Long] = {
      val n = Tables.nation(spark, sf).collect()
        .map(r => r.getAs[Number]("n_nationkey").intValue() ->
          r.getAs[Number]("n_regionkey").intValue()).toMap
      val eurRegions = Tables.region(spark, sf).collect()
        .filter(_.getAs[String]("r_name") == "EUROPE")
        .map(_.getAs[Number]("r_regionkey").intValue()).toSet
      Tables.supplier(spark, sf).collect()
        .filter(r => eurRegions.contains(n(r.getAs[Number]("s_nationkey").intValue())))
        .map(_.getAs[Number]("s_suppkey").longValue()).toSet
    }
    // naive supply relation: min unit price per (part, supplier)
    val supply: Map[(Long, Long), Double] = lines
      .groupBy(l => (l.part, l.supp))
      .view.mapValues(_.map(l => l.price / l.qty).min).toMap
    val minEur: Map[Long, Double] = supply.toSeq
      .filter { case ((_, s), _) => eurSupp.contains(s) }
      .groupBy(_._1._1).view.mapValues(_.map(_._2).min).toMap
    val rows = q("q2_min_cost_supp").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val partMeta = Tables.part(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("p_type"),
        r.getAs[Number]("p_size").intValue()))).toMap
    rows.foreach { r =>
      val part = r.getAs[Long]("p_partkey")
      val (ptype, psize) = partMeta(part)
      assert(ptype == "LARGE" && psize <= 10, s"part $part fails the dimension filter")
      val cost = r.getAs[Double]("supply_cost")
      assert(math.abs(cost - BigDecimal(minEur(part)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"part $part: reported $cost != min ${minEur(part)}")
    }
    // sorted by acctbal desc (first key)
    val bal = rows.map(_.getAs[Double]("s_acctbal")).toSeq
    assert(bal == bal.sorted.reverse)
  }

  // ---- q20: nested-IN with correlated scalar -----------------------

  test("q20: returned suppliers are exactly those with an excess-share part") {
    val smallParts: Set[Long] = Tables.part(spark, sf).collect()
      .filter(_.getAs[String]("p_name").startsWith("small"))
      .map(_.getLong(0)).toSet
    val natRegion0: Set[Int] = Tables.nation(spark, sf).collect()
      .filter(_.getAs[Number]("n_regionkey").intValue() == 0)
      .map(_.getAs[Number]("n_nationkey").intValue()).toSet
    def dsum2(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val byPs = lines.groupBy(l => (l.part, l.supp))
    val excessSupp: Set[Long] = byPs.collect {
      case ((p, s), ls)
          if smallParts.contains(p) && {
            val recent = ls.filter(l =>
              !l.ship.isBefore(ts("1996-01-01 00:00:00")) &&
                l.ship.isBefore(ts("1997-01-01 00:00:00")))
            recent.nonEmpty &&
              dsum2(recent.map(_.qty)) > 0.5 * dsum2(ls.map(_.qty))
          } => s
    }.toSet
    val expected = Tables.supplier(spark, sf).collect()
      .filter(r => natRegion0.contains(r.getAs[Number]("s_nationkey").intValue()) &&
        excessSupp.contains(r.getLong(0)))
      .map(_.getLong(0)).toSet
    val got = q("q20_excess_suppliers").collect().map(_.getLong(0))
    assert(got.toSet == expected)
    assert(got.toSeq == got.toSeq.sorted, "ordered by s_suppkey")
  }

  // ---- q21: multi-EXISTS / NOT-EXISTS ------------------------------

  test("q21: numwait equals the naive sole-late-supplier recomputation") {
    def late(l: Line): Boolean = ordersByKey.get(l.order).exists {
      case (od, _, _) => ms(l.ship) > ms(od) + 60 * dayMs
    }
    val suppsByOrder: Map[Long, Set[Long]] =
      lines.groupBy(_.order).view.mapValues(_.map(_.supp).toSet).toMap
    val lateSuppsByOrder: Map[Long, Set[Long]] =
      lines.filter(late).groupBy(_.order).view.mapValues(_.map(_.supp).toSet).toMap
    val sName = Tables.supplier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val counted = lines.filter { l1 =>
      ordersByKey.get(l1.order).exists(_._2 == "F") && late(l1) &&
        suppsByOrder(l1.order).exists(_ != l1.supp) &&
        !lateSuppsByOrder.getOrElse(l1.order, Set.empty).exists(_ != l1.supp)
    }
    val expected = counted.groupBy(l => sName(l.supp))
      .view.mapValues(_.size.toLong).toSeq
      .sortBy { case (n, c) => (-c, n) }.take(10)
    val got = q("q21_waiting_supplier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }
}
