package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.Portable

/** Invariants for this round's new operators (exact result parity is
  * the DuckDB oracle's job — these guard semantics standalone). */
class Round5OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- dd10 benchmark decontamination -------------------------------

  test("dd10: flags are train-only, ratio-bounded, and above both thresholds") {
    val rows = q("dd10_decontaminate").collect()
    assert(rows.nonEmpty)
    val evalIds = Tables.documents(spark, sf)
      .filter(expr(s"${Portable.phashExpr("concat('ev:', CAST(doc_id AS STRING))")} % ${Dedup.EvalMod} = 0"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val (id, nHit, nSh) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit"), r.getAs[Long]("n_sh"))
      assert(!evalIds.contains(id), s"eval doc $id flagged as contaminated train doc")
      assert(nHit >= Dedup.DecontamMinOverlap && nHit <= nSh)
      val c = r.getAs[Double]("contamination")
      assert(c >= Dedup.DecontamMinRatio - 1e-9 && c <= 1.0)
    }
  }

  test("dd10: n_hit matches a direct per-doc intersect against the eval shingle union") {
    val flagged = q("dd10_decontaminate").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(flagged.nonEmpty)
    val shs = Tables.documents(spark, sf)
      .withColumn("tokens", expr(TextAnalysis.tokensExpr))
      .withColumn("shingles", expr(TextAnalysis.shinglesExpr))
      .select(col("doc_id"),
        expr(s"array_distinct(transform(shingles, s -> ${Portable.phashExpr("s")}))").as("shs"),
        expr(s"${Portable.phashExpr("concat('ev:', CAST(doc_id AS STRING))")} % ${Dedup.EvalMod} = 0").as("is_eval"))
      .collect()
    val evalUnion = shs.filter(_.getAs[Boolean]("is_eval"))
      .flatMap(_.getAs[scala.collection.Seq[Long]]("shs")).toSet
    val direct = shs.filterNot(_.getAs[Boolean]("is_eval")).map { r =>
      r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Long]]("shs").count(evalUnion.contains).toLong
    }.toMap
    flagged.foreach { case (id, nHit) =>
      assert(direct(id) === nHit, s"doc $id: catalog n_hit $nHit != direct ${direct(id)}")
    }
    // and nothing above both thresholds was missed
    direct.foreach { case (id, hits) =>
      val nSh = shs.find(r => r.getAs[Long]("doc_id") == id).get.getAs[scala.collection.Seq[Long]]("shs").size
      if (hits >= Dedup.DecontamMinOverlap &&
          hits.toDouble / nSh >= Dedup.DecontamMinRatio)
        assert(flagged.contains(id), s"doc $id over threshold but not flagged")
    }
  }

  // ---- bf01 bloom-filter semi-join ----------------------------------

  test("bf01: bloom prefilter passes every true key (no false negatives) at a low FP rate") {
    val bloomAgg = udaf(new graft.functions.BloomAgg((Joins.BloomBits / 64).toInt),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    val hot = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > Joins.HotOrderPrice).select(col("o_custkey"))
    val bloom = hot.select(expr(Joins.bloomPosExpr("o_custkey")).as("ps"))
      .agg(bloomAgg(col("ps")).as("bf"))
    val preKeys = Tables.customer(spark, sf).crossJoin(broadcast(bloom))
      .filter(expr(Joins.bloomProbeExpr("bf", "c_custkey")))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val custKeys = Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val trueKeys = hot.distinct().collect().map(_.getLong(0)).toSet.intersect(custKeys)
    assert(trueKeys.nonEmpty)
    assert(trueKeys.subsetOf(preKeys), "bloom dropped a true key — must be impossible")
    val negatives = custKeys.size - trueKeys.size
    val fps = (preKeys -- trueKeys).size
    assert(negatives == 0 || fps.toDouble / negatives < 0.05,
      s"FP rate ${fps.toDouble / negatives} above the designed ~2%")
  }

  test("BloomAgg: OR-merge of partial filters equals the single-pass build") {
    val agg = new graft.functions.BloomAgg(8)
    val positions = Seq(Seq(0L, 63L, 64L), Seq(7L, 200L), Seq(511L, 64L), Seq(3L))
    val single = positions.foldLeft(agg.zero)(agg.reduce)
    val (left, right) = positions.splitAt(2)
    val merged = agg.merge(
      left.foldLeft(agg.zero)(agg.reduce),
      right.foldLeft(agg.zero)(agg.reduce))
    assert(single.toSeq === merged.toSeq)
    // and every fed position reads back as set
    positions.flatten.foreach { p =>
      assert(((single((p >>> 6).toInt) >> (p & 63)) & 1L) === 1L)
    }
  }

  // ---- u01 SCD2 merge ----------------------------------------------

  test("u01: every key has exactly one current version and a gap-free version chain") {
    val rows = q("u01_scd2_merge").collect()
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(_.getAs[Long]("c_custkey"))
    val nBase = Tables.customer(spark, sf).count()
    assert(byKey.size >= nBase, "merge lost base keys")
    byKey.foreach { case (k, vs) =>
      assert(vs.length <= 2, s"key $k has ${vs.length} versions after one merge")
      assert(vs.count(_.getAs[Int]("is_current") == 1) === 1, s"key $k current-count != 1")
      vs.foreach { v =>
        val current = v.getAs[Int]("is_current") == 1
        assert(current === (v.getAs[java.sql.Date]("valid_to") == null),
          s"key $k: is_current must equal open-ended valid_to")
      }
      if (vs.length == 2) {
        val sorted = vs.sortBy(_.getAs[java.sql.Date]("valid_from").toString)
        assert(sorted.head.getAs[java.sql.Date]("valid_to").toString ===
          sorted.last.getAs[java.sql.Date]("valid_from").toString,
          s"key $k: version chain has a gap")
      }
    }
    // inserts exist, carry synthetic keys, and open at the effective date
    val inserts = byKey.filter(_._1 >= Incremental.InsertKeyOffset)
    assert(inserts.nonEmpty)
    inserts.values.foreach { vs =>
      assert(vs.length === 1 &&
        vs.head.getAs[java.sql.Date]("valid_from").toString === Incremental.MergeEffective)
    }
  }

  // ---- cdc01 snapshot diff -----------------------------------------

  test("cdc01: change classes are shape-consistent and updates differ by exactly the delta") {
    val rows = q("cdc01_snapshot_diff").collect()
    assert(rows.nonEmpty)
    val types = rows.groupBy(_.getAs[String]("change_type")).view.mapValues(_.length).toMap
    assert(Set("added", "removed", "updated").subsetOf(types.keySet),
      s"expected all three change classes, got $types")
    rows.foreach { r =>
      val (o, n) = (Option(r.get(r.fieldIndex("old_price"))).map(_.asInstanceOf[Double]),
        Option(r.get(r.fieldIndex("new_price"))).map(_.asInstanceOf[Double]))
      r.getAs[String]("change_type") match {
        case "added" => assert(o.isEmpty && n.nonEmpty)
        case "removed" => assert(o.nonEmpty && n.isEmpty)
        case "updated" =>
          assert(o.nonEmpty && n.nonEmpty)
          assert(math.abs(n.get - o.get - Incremental.PriceDelta) < 1e-9)
      }
    }
  }

  // ---- ivm01 incremental view maintenance ---------------------------

  test("ivm01: delta-folded view equals the full recompute and the delta is non-trivial") {
    val inc = q("ivm01_delta_agg").collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("priority_revenue"), r.getAs[Long]("order_cnt"))).toMap
    assert(inc.nonEmpty)
    // independent full recompute over snapshot B
    val o = Tables.orders(spark, sf)
    val bSlice = expr(s"${Portable.phashExpr("concat('b:', CAST(o_orderkey AS STRING))")} % ${Incremental.SnapMod}")
    val mSlice = expr(s"${Portable.phashExpr("concat('m:', CAST(o_orderkey AS STRING))")} % ${Incremental.ChangeMod}")
    val full = o.filter(bSlice =!= 0)
      .select(col("o_orderpriority"),
        when(mSlice === 0, col("o_totalprice") + Incremental.PriceDelta)
          .otherwise(col("o_totalprice")).as("p"))
      .groupBy("o_orderpriority")
      .agg(Tables.dsum(col("p"), 2).as("rev"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("rev"), r.getAs[Long]("n"))).toMap
    assert(inc === full, "incremental refresh diverged from full recompute")
    // and the maintenance actually moved the view: γ(A) differs from γ(B)
    val aSlice = expr(s"${Portable.phashExpr("concat('a:', CAST(o_orderkey AS STRING))")} % ${Incremental.SnapMod}")
    val viewA = o.filter(aSlice =!= 0).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n")).toMap
    assert(inc.exists { case (k, (_, n)) => viewA.get(k).exists(_ != n) },
      "delta was a no-op — the test would prove nothing")
  }
}
