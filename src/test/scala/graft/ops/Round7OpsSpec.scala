package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Invariants for the round-5 closing operators (exact result parity
  * is the DuckDB oracle's job — these guard semantics standalone). */
class Round7OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- dd13 incremental (batch-vs-corpus) dedup ---------------------

  test("dd13: one decision row per batch doc, matches point only into the corpus") {
    val rows = q("dd13_incremental_dedup").collect()
    val batchIds = Tables.documents(spark, sf)
      .filter(col("source") === Dedup.IncBatchSrc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val corpusIds = Tables.documents(spark, sf)
      .filter(col("source") =!= Dedup.IncBatchSrc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("batch_doc")).toSet == batchIds)
    assert(rows.length == batchIds.size, "left join must not fan out")
    rows.filter(!_.isNullAt(1)).foreach { r =>
      assert(corpusIds.contains(r.getAs[Long]("dup_of")),
        s"batch doc ${r.getLong(0)} matched a non-corpus doc ${r.getLong(1)}")
      assert(r.getAs[Double]("est_jaccard") >= 0.5)
    }
  }

  test("dd13: matched pairs are exactly dd03's verified pairs that cross the batch boundary") {
    val batchIds = Tables.documents(spark, sf)
      .filter(col("source") === Dedup.IncBatchSrc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // dd03 orients doc_a < doc_b over the whole corpus; reorient the
    // crossing subset to (batch, corpus)
    val crossing = q("dd03_lsh_pairs").collect().flatMap { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      if (batchIds.contains(a) != batchIds.contains(b))
        Some(if (batchIds.contains(a)) (a, b) else (b, a))
      else None
    }.toSet
    val decided = q("dd13_incremental_dedup").collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getAs[Long]("batch_doc"), r.getAs[Long]("dup_of"))).toSet
    // dd13 keeps only the best match per batch doc — its pairs are a
    // subset, and every decided batch doc must appear in the crossing
    // set with that same best partner admissible
    assert(decided.subsetOf(crossing),
      s"dd13 invented pairs: ${decided.diff(crossing)}")
    val decidedDocs = decided.map(_._1)
    val crossingDocs = crossing.map(_._1)
    assert(decidedDocs == crossingDocs,
      "every batch doc with ≥1 crossing verified pair must receive a dup_of decision")
  }

  // ---- a20 explicit grouping sets -----------------------------------

  test("a20: one Expand-fed aggregate reproduces the two independent groupBys") {
    val rows = q("a20_grouping_sets").collect()
    val byLine = rows.filter(r => r.getAs[Int]("g_d") == 1)
    val byDay = rows.filter(r => r.getAs[Int]("g_line") == 1)
    assert(byLine.length + byDay.length == rows.length,
      "every row belongs to exactly one of the two named sets")
    val ev = graft.Tables.events(spark, sf)
      .select(trim(col("event_type")).as("line"), to_date(col("ts")).cast("string").as("d"))
    val lineCounts = ev.groupBy("line").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dayCounts = ev.groupBy("d").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLine.map(r => r.getAs[String]("line") -> r.getAs[Long]("n")).toMap == lineCounts)
    assert(byDay.map(r => r.getAs[String]("d") -> r.getAs[Long]("n")).toMap == dayCounts)
    // the whole point of grouping sets: ONE scan via a single Expand,
    // not a union of two aggregates
    val plan = q("a20_grouping_sets").queryExecution.optimizedPlan.toString
    assert(plan.contains("Expand"), "grouping sets must plan as Expand")
    assert(!plan.contains("Union"), "grouping sets must not plan as a union of scans")
  }

  // ---- qs01 histogram quantiles -------------------------------------

  test("qs01: each reported bin brackets the exact quantile with error <= range/bins") {
    val rows = q("qs01_hist_quantiles").collect()
    assert(rows.map(_.getAs[Double]("q")).toSeq == Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    val vals = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull).select("value")
      .collect().map(_.getDouble(0)).sorted
    val (lo, hi, n) = (vals.head, vals.last, vals.length)
    val width = (hi - lo) / Analytics.QuantBins
    rows.foreach { r =>
      val q = r.getAs[Double]("q")
      val exact = vals(math.ceil(q * n).toInt - 1) // rank-ceil(q n) order statistic
      assert(r.getAs[Double]("bin_hi") - r.getAs[Double]("bin_lo") <= width + 1e-9,
        "reported interval wider than one bin")
      assert(exact >= r.getAs[Double]("bin_lo") - 1e-9 &&
        exact <= r.getAs[Double]("bin_hi") + 1e-9,
        s"exact q=$q quantile $exact outside [${r.getAs[Double]("bin_lo")}, ${r.getAs[Double]("bin_hi")}]")
      assert(r.getAs[Long]("n_le") >= math.ceil(q * n).toLong,
        "cumulative count at the chosen bin must reach the rank target")
    }
    // bins are monotone in q
    assert(rows.map(_.getAs[Int]("bin")).toSeq == rows.map(_.getAs[Int]("bin")).sorted.toSeq)
  }

  // ---- cur06 temperature mixing -------------------------------------

  test("cur06: sqrt temperature oversamples scarce languages") {
    val rows = q("cur06_temperature_mix").collect()
    assert(rows.nonEmpty)
    // keep rate ∝ w/n ∝ 1/sqrt(n): scarcer language ⇒ keep rate >=
    // that of any more common language (ties only via the min(1,·) cap)
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    val thrs = byN.map(_.getAs[Long]("keep_per_million"))
    assert(thrs.zip(thrs.tail).forall { case (scarce, common) => scarce >= common },
      s"thresholds not monotone-decreasing in language size: ${byN.map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"), r.getAs[Long]("keep_per_million"))).toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("keep_per_million") <= 1000000L)
    }
    // weights are a distribution over the observed languages
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4)
  }

  // ---- ds08 DSIR importance scoring ---------------------------------

  test("ds08: target-language docs score higher than the rest, flag matches sign") {
    val rows = q("ds08_importance_resample").collect()
    val langs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (tgt, rest) = rows.partition(r =>
      langs(r.getAs[Long]("doc_id")) == Curation.DsirTargetLang)
    assert(tgt.nonEmpty && rest.nonEmpty)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("dsir_score")).sum / rs.length
    assert(mean(tgt) > mean(rest),
      s"target-language mean ${mean(tgt)} not above non-target mean ${mean(rest)}")
    rows.foreach { r =>
      val (score, sel) = (r.getAs[Double]("dsir_score"), r.getAs[Int]("selected"))
      if (sel == 1) assert(score >= 0.0) else assert(score <= 0.0)
    }
  }

  // ---- dd14 SemDeDup decision table ---------------------------------

  test("dd14: greedy cluster-local pruning is sound and complete") {
    val rows = q("dd14_semantic_dedup").collect()
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(rows.map(_.getAs[Long]("vec_id")).toSet == emb.keySet, "every vector decided")
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cluster = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    // rep = min id per distinct embedding, straight from the fixture
    val reps = emb.groupBy(_._2.toSeq).values.map(_.keys.min).toSet
    rows.foreach { r =>
      val (v, kept) = (r.getAs[Long]("vec_id"), r.getAs[Int]("kept"))
      if (kept == 1) assert(r.isNullAt(2), "kept rows carry no witness")
      else {
        val w = r.getAs[Long]("dup_of")
        assert(w < v, s"witness $w not lower-id than $v")
        val c = cos(emb(v), emb(w))
        // exact twin (cos≈1 and identical vector) or semantic witness in the same cluster
        assert(c >= Similarity.DupThreshold - 1e-9 || emb(v).sameElements(emb(w)),
          s"witness pair ($w,$v) below threshold: $c")
        if (!emb(v).sameElements(emb(w)))
          assert(cluster(w) == cluster(v), "semantic witness must share the cluster")
      }
    }
    // completeness: a kept rep has no lower-id rep in its cluster at >= threshold
    val keptReps = rows.filter(_.getAs[Int]("kept") == 1).map(_.getAs[Long]("vec_id"))
    keptReps.foreach { v =>
      reps.filter(w => w < v && cluster(w) == cluster(v)).foreach { w =>
        assert(cos(emb(v), emb(w)) < Similarity.DupThreshold + 1e-9,
          s"kept $v has an undetected lower-id witness $w")
      }
    }
    assert(rows.exists(_.getAs[Int]("kept") == 0), "fixture should contain at least one drop")
  }
}
