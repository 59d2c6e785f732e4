package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Invariants for the round-4 second-continuation operators (SNM
  * dedup, SCD2 as-of, rolling windows, vocab coverage, leakage-safe
  * split) — exact result parity is the DuckDB oracle's job; these
  * re-derive the semantics independently. */
class Round6OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- dd12 sorted-neighborhood pairs -------------------------------

  /** Reference SNM in plain Scala: sorted-token-prefix key order,
    * window of SnmWindow successors, exact shingle Jaccard. */
  test("dd12: equals a full in-memory SNM recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val canon = docs.groupBy(_._2).map { case (t, g) => (g.map(_._1).min, t) }.toSeq
    def toks(t: String) = t.toLowerCase.split(" +").filter(_.nonEmpty).toSeq
    def shingles(ts: Seq[String]) =
      if (ts.length < 3) Set.empty[String]
      else ts.sliding(3).map(_.mkString(" ")).toSet
    val keyed = canon.map { case (id, t) =>
      (id, toks(t).sorted.mkString(" ").take(Dedup.SnmKeyLen), shingles(toks(t)))
    }.sortBy(k => (k._2, k._1))
    val expected = (for {
      i <- keyed.indices
      j <- (i + 1) to math.min(i + Dedup.SnmWindow, keyed.length - 1)
      a = keyed(i); b = keyed(j)
      common = (a._3 & b._3).size
      union = a._3.size + b._3.size - common
      if union > 0 && common.toDouble / union >= 0.3
    } yield (math.min(a._1, b._1), math.max(a._1, b._1),
      math.round(common.toDouble / union * 1e6) / 1e6)).toSet
    val got = q("dd12_snm_pairs").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(got.nonEmpty, "sf0.001 contains near-dup pairs with shared token bags")
    assert(got === expected)
  }

  // ---- u02 SCD2 point-in-time lookup --------------------------------

  test("u02: pre-merge probe sees the base dimension; at-merge probe sees upserts") {
    val rows = q("u02_scd2_asof").collect()
      .map(r => r.getAs[java.sql.Date]("as_of").toString ->
        (r.getAs[Long]("n_customers"), r.getAs[Double]("total_bal"))).toMap
    assert(rows.keySet === Set(Incremental.AsOfEarly, Incremental.MergeEffective))
    val base = Tables.customer(spark, sf).count()
    // before the merge: every base customer active in its original
    // version, no inserts visible
    assert(rows(Incremental.AsOfEarly)._1 === base)
    // at the merge date: closed versions are replaced 1:1, inserts add
    val inserts = Tables.customer(spark, sf)
      .filter(expr(s"${graft.functions.Portable.phashExpr("concat('i1:', CAST(c_custkey AS STRING))")} % ${Incremental.InsertMod} = 0"))
      .count()
    assert(rows(Incremental.MergeEffective)._1 === base + inserts)
  }

  test("u02: as-of rows are consistent with filtering u01's output directly") {
    val dim2 = q("u01_scd2_merge").cache()
    val expected = Seq(Incremental.AsOfEarly, Incremental.MergeEffective).map { dStr =>
      val d = java.sql.Date.valueOf(dStr)
      val active = dim2.filter(col("valid_from") <= lit(d) &&
        (col("valid_to").isNull || col("valid_to") > lit(d)))
      dStr -> active.count()
    }.toMap
    val got = q("u02_scd2_asof").collect()
      .map(r => r.getAs[java.sql.Date]("as_of").toString -> r.getAs[Long]("n_customers"))
      .toMap
    assert(got === expected)
    dim2.unpersist()
  }

  // ---- ts02 rolling range-frame window ------------------------------

  test("ts02: rolling sums equal a per-line recompute over the event-time axis") {
    val rows = q("ts02_rolling").collect().map(r =>
      (r.getAs[String]("line"), r.getAs[String]("hour_ts"), r.getAs[Long]("n_events"),
        r.getAs[Long]("roll_hours"), r.getAs[Long]("roll_events")))
    assert(rows.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val byLine = rows.groupBy(_._1)
    byLine.foreach { case (_, rs) =>
      val hours = rs.map { t =>
        val ep = java.time.LocalDateTime.parse(t._2, fmt)
          .toEpochSecond(java.time.ZoneOffset.UTC)
        (ep, t._3, t._4, t._5)
      }.sortBy(_._1)
      hours.foreach { case (ep, _, rollH, rollE) =>
        val inFrame = hours.filter(h => h._1 >= ep - 7200 && h._1 <= ep)
        assert(rollH === inFrame.length.toLong, s"roll_hours at $ep")
        assert(rollE === inFrame.map(_._2).sum, s"roll_events at $ep")
      }
    }
  }

  test("ts02: a gap shrinks the frame instead of stretching it (RANGE semantics)") {
    // hourly rows are sparse on the sf0.001 events table, so some row
    // must have fewer than 3 hours in its 3-hour frame while having a
    // predecessor row — the RANGE-vs-ROWS distinction made observable
    val rows = q("ts02_rolling").collect()
    val shrunk = rows.exists(r => r.getAs[Long]("roll_hours") < 3L)
    assert(shrunk, "expected at least one gap-shrunk frame in a sparse series")
  }

  // ---- tx12 vocabulary coverage -------------------------------------

  test("tx12: equals an in-memory top-V vocab recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String) = t.toLowerCase.split(" +").filter(_.nonEmpty).toSeq
    val all = docs.flatMap { case (_, t) => toks(t) }
    val vocab = all.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(TextAnalysis.VocabTopK)
      .map(_._1).toSet
    val expected = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      if (ts.isEmpty) None
      else Some((id, ts.length.toLong, ts.count(x => !vocab.contains(x)).toLong))
    }.toSet
    val got = q("tx12_vocab_coverage").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_oov"))).toSet
    assert(got === expected)
    assert(got.exists(_._3 > 0), "V < corpus vocab, so some OOV tokens exist")
  }

  // ---- at01 last-touch attribution ----------------------------------

  test("at01: equals a per-user timeline replay; out-of-window clicks never attribute") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), trim(col("event_type")).as("et"),
        floor(col("ts").cast("double")).cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val timeline = rows.sortBy(r => (r._4, r._2))
      var lastClick: Option[(Long, Long)] = None // (epoch, event_id)
      timeline.flatMap { case (uid, eid, et, s) =>
        if (et == "click") { lastClick = Some((s, eid)); None }
        else if (et == "purchase") {
          val attr = lastClick.filter(c => s - c._1 <= Analytics.AttribWindowSec)
          Some((eid, uid, attr.map(_._2), attr.map(c => s - c._1)))
        } else None
      }
    }.toSet
    val got = q("at01_attribution").collect().map { r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        Option(r.getAs[java.lang.Long]("click_event_id")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("gap_s")).map(_.longValue))
    }.toSet
    assert(got === expected)
    assert(got.exists(_._3.nonEmpty), "some purchases are attributed")
  }

  // ---- sim09 embedding covariance -----------------------------------

  test("sim09: matches a dense double recompute and has PSD-consistent diagonals") {
    val M = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = M.length.toDouble
    val dims = M.head.length
    val mean = Array.tabulate(dims)(i => M.map(_(i)).sum / n)
    val got = q("sim09_covariance").collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r.getAs[Double]("cov"))
      .toMap
    assert(got.size === dims * (dims + 1) / 2)
    got.foreach { case ((i, j), cov) =>
      val ref = M.map(v => v(i.toInt) * v(j.toInt)).sum / n - mean(i.toInt) * mean(j.toInt)
      assert(math.abs(cov - ref) < 2e-6, s"cell ($i,$j): $cov vs $ref")
      if (i == j) assert(cov >= 0.0, s"negative variance at $i")
    }
  }

  // ---- q5 local-supplier snowflake ----------------------------------

  test("q5: one row per region nation; revenue only from local-supplier lineitems") {
    val rows = q("q5_local_supplier").collect()
      .map(r => r.getAs[String]("n_name") -> r.getAs[Double]("revenue")).toMap
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.keySet.subsetOf(asiaNations))
    rows.values.foreach(v => assert(v > 0.0))
    // cross-check one nation's revenue with an independent SQL-text plan
    val n0 = rows.keySet.min
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("v_li")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("v_o")
    spark.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("v_c")
    spark.read.parquet(s"$sf/supplier.parquet").createOrReplaceTempView("v_s")
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("v_n")
    val ref = spark.sql(
      s"""SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS rev
         |FROM v_li JOIN v_o ON l_orderkey = o_orderkey
         |JOIN v_s ON l_suppkey = s_suppkey
         |JOIN v_c ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN v_n ON s_nationkey = n_nationkey
         |WHERE n_name = '$n0'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin)
      .collect().head.getDouble(0)
    assert(rows(n0) === ref)
  }

  // ---- dq04 table checksum ------------------------------------------

  test("dq04: checksum is partitioning-invariant and catches a single-row edit") {
    val base = q("dq04_table_checksum").collect()
      .map(r => r.getAs[String]("month") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("checksum"))).toMap
    assert(base.nonEmpty)
    def fingerprint(df: org.apache.spark.sql.DataFrame) =
      DataQuality.orderFingerprint(df).collect()
        .map(r => r.getAs[String]("month") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("checksum"))).toMap
    // any repartitioning/shuffle order produces the identical fingerprint
    val shuffled = fingerprint(Tables.orders(spark, sf).repartition(7))
    assert(shuffled === base)
    // a one-cent edit to one row flips exactly that month's checksum
    val firstKey = Tables.orders(spark, sf)
      .orderBy("o_orderkey").select("o_orderkey").limit(1)
      .collect().head.getLong(0)
    val mutated = fingerprint(Tables.orders(spark, sf)
      .withColumn("o_totalprice",
        when(col("o_orderkey") === firstKey, col("o_totalprice") + 0.01)
          .otherwise(col("o_totalprice"))))
    val changed = mutated.filter { case (m, v) => base(m) != v }
    assert(changed.size === 1, s"exactly one month's checksum changes: $changed")
    assert(changed.head._2._1 === base(changed.head._1)._1, "row count unchanged")
  }

  // ---- sim10 diagonal Mahalanobis -----------------------------------

  test("sim10: top-k matches a dense recompute of the whitened distance") {
    val M = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val n = M.length.toDouble
    val dims = M.head._2.length
    val mu = Array.tabulate(dims)(i => M.map(_._2(i)).sum / n)
    val v = Array.tabulate(dims)(i =>
      M.map(x => x._2(i) * x._2(i)).sum / n - mu(i) * mu(i))
    val scores = M.map { case (id, x) =>
      id -> (0 until dims).map(i =>
        if (v(i) > 0) (x(i) - mu(i)) * (x(i) - mu(i)) / v(i) else 0.0).sum
    }.toMap
    val got = q("sim10_mahalanobis").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("mahalanobis")))
    assert(got.length === math.min(Similarity.MahalTopK, M.length))
    got.foreach { case (id, m) =>
      assert(math.abs(m - scores(id)) < 2e-5, s"vec $id: $m vs ${scores(id)}")
      assert(m >= 0.0)
    }
    // the reported set IS the top-k of the dense recompute
    val expectedTop = scores.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(got.length).map(_._1).toSet
    assert(got.map(_._1).toSet === expectedTop)
  }

  // ---- q10 returned items -------------------------------------------

  test("q10: top row's revenue matches an independent SQL-text recompute") {
    val rows = q("q10_returned_items").collect()
    assert(rows.length === 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "sorted desc")
    val top = rows.head
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("w_li")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("w_o")
    val ref = spark.sql(
      s"""SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         |FROM w_li JOIN w_o ON l_orderkey = o_orderkey
         |WHERE l_returnflag = 'R' AND o_custkey = ${top.getAs[Long]("c_custkey")}
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin)
      .collect().head.getDouble(0)
    assert(top.getAs[Double]("revenue") === ref)
  }

  // ---- j12 forward as-of join ---------------------------------------

  test("j12: equals a per-user forward replay; unconverted clicks stay null") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val purchases = rows.filter(_._3 == "purchase").map(_._4).sorted
      rows.filter(_._3 == "click").map { case (uid, eid, _, us) =>
        (eid, uid, purchases.find(_ >= us))
      }
    }.toSet
    val got = q("j12_asof_forward").collect().map { r =>
      val pts = Option(r.getAs[String]("purchase_ts_s"))
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"), pts)
    }.toSet
    // compare on second-truncated timestamps (the operator's display format)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val expectedFmt = expected.map { case (e, u, us) =>
      (e, u, us.map(x => fmt.format(java.time.Instant.ofEpochSecond(x / 1000000L))))
    }
    assert(got === expectedFmt)
    assert(got.exists(_._3.isEmpty), "some clicks never convert")
    assert(got.exists(_._3.nonEmpty), "some clicks convert")
  }

  // ---- w06 ABC / Pareto ---------------------------------------------

  test("w06: cumulative share is monotone, ends at 1, and classes partition the ranking") {
    val rows = q("w06_abc_pareto").collect().map(r =>
      (r.getAs[Long]("l_partkey"), r.getAs[Double]("revenue"),
        r.getAs[Double]("cum_share"), r.getAs[String]("abc_class")))
    assert(rows.nonEmpty)
    // ranking order: revenue non-increasing, share non-decreasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 <= b._3 + 1e-9)
    }
    assert(math.abs(rows.last._3 - 1.0) < 1e-9, "total share is 1")
    // classes appear in A..B..C blocks along the ranking
    val classSeq = rows.map(_._4).distinct
    assert(classSeq === classSeq.sorted, s"class blocks ordered: $classSeq")
    assert(rows.map(_._4).toSet === Set("A", "B", "C"))
    // exact recompute of the shares from BigDecimal revenue sums
    val revs = rows.map(t => (t._1, BigDecimal(t._2).setScale(4)))
    val total = revs.map(_._2).sum
    var cum = BigDecimal(0)
    revs.zip(rows).foreach { case ((_, r), (_, _, share, _)) =>
      cum += r
      val ref = (cum.toDouble / total.toDouble * 1e6).round / 1e6
      assert(math.abs(share - ref) < 2e-6, s"share $share vs $ref")
    }
  }

  // ---- u03 SCD2 merge with deletes ----------------------------------

  test("u03: tombstoned keys close without a successor; the tombstone beats an update") {
    import graft.functions.Portable
    val rows = q("u03_merge_delete").collect()
    val byKey = rows.groupBy(_.getAs[Long]("c_custkey"))
    val deleted = Tables.customer(spark, sf)
      .filter(expr(s"${Portable.phashExpr("concat('d1:', CAST(c_custkey AS STRING))")} % ${Incremental.DeleteMod} = 0"))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty)
    deleted.foreach { k =>
      val versions = byKey(k)
      assert(versions.length === 1, s"deleted key $k has no successor version")
      assert(versions.head.getAs[Int]("is_current") === 0)
      assert(versions.head.getAs[java.sql.Date]("valid_to") != null)
    }
    // every surviving current version is exactly one per non-deleted key
    byKey.foreach { case (k, vs) =>
      val cur = vs.count(_.getAs[Int]("is_current") == 1)
      if (deleted.contains(k)) assert(cur === 0) else assert(cur === 1, s"key $k")
    }
  }

  // ---- dq05 distribution drift --------------------------------------

  test("dq05: KL is non-negative and near zero for hash-halves; counts reconcile") {
    val rows = q("dq05_dist_drift").collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Double]("kl_term")))
    assert(rows.nonEmpty)
    val kl = rows.map(_._4).sum
    assert(kl >= -1e-6, s"KL(A||B) >= 0 (Gibbs): $kl")
    assert(kl < 0.05, s"hash halves of one corpus barely drift: $kl")
    val total = rows.map(r => r._2 + r._3).sum
    val direct = Tables.documents(spark, sf)
      .select(explode(expr(TextAnalysis.tokensExpr)).as("t")).count()
    assert(total === direct, "per-token half counts cover every token occurrence")
  }

  // ---- sim11 ANN precision ------------------------------------------

  test("sim11: precision equals a direct intersect of the two catalog frames") {
    val bf = q("sim01_knn").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val iv = q("sim04_ivf_ann").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val returned = iv.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val hits = iv.groupBy(_._1).view
      .mapValues(ns => ns.count(bf.contains).toLong).toMap
    val got = q("sim11_ann_recall").collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_ret"), r.getAs[Long]("n_hit"),
          Option(r.getAs[java.lang.Double]("precision")).map(_.doubleValue))).toMap
    // spine covers every query in the query-set definition, even ones
    // the index returned nothing for
    val spine = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < Similarity.KnnQueries)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.keySet === spine)
    got.foreach { case (qid, (nRet, nHit, p)) =>
      assert(nRet === returned.getOrElse(qid, 0L))
      assert(nHit === hits.getOrElse(qid, 0L))
      if (nRet > 0) {
        assert(math.abs(p.get - nHit.toDouble / nRet) < 1e-6)
        assert(p.get >= 0.0 && p.get <= 1.0)
      } else assert(p.isEmpty, "no candidates -> null precision")
    }
  }

  // ---- ds07 leakage-safe split --------------------------------------

  test("ds07: no duplicate cluster spans two splits; singletons follow their own hash") {
    val split = q("ds07_leakage_safe_split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val clusters = q("dd07_dup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep"))
    assert(clusters.nonEmpty)
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      val splits = members.map(m => split(m._1)).distinct
      assert(splits.length === 1, s"cluster $rep spans splits $splits")
    }
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(split.size === Tables.documents(spark, sf).count())
    // train dominates under the 90/5/5 layout
    val n = split.size.toDouble
    assert(split.values.count(_ == "train") / n > 0.7)
  }
}
