package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}

/** Invariants for the round-14 retrieval additions (tx15 BM25, sim25
  * RRF fusion, ds12 diversified top-k). Exact result parity is the
  * DuckDB oracle's job — these recompute the semantics naively over
  * the sf0.001 fixture and pin the plan shapes the scale story
  * depends on (map-side WindowGroupLimit for the BM25 top-k, lane
  * containment for the fusion, the per-cell quota for ds12), so a
  * transcription bug cannot hide behind a matching oracle.
  */
class Round14OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- tx15: BM25 -----------------------------------------------------

  private lazy val docTokens: Map[Long, Seq[String]] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" +").filter(_.nonEmpty).toSeq)
      .toMap

  test("tx15: naive driver-side BM25 agrees on every (query, rank, doc, score)") {
    val n = docTokens.size.toDouble
    val sumDl = docTokens.values.map(_.size.toLong).sum.toDouble
    val qterms = TextAnalysis.Bm25Queries
    val expected = qterms.flatMap { case (qid, terms) =>
      val dfm = terms.map(t =>
        t -> docTokens.values.count(_.contains(t)).toDouble).toMap
      val scored = docTokens.toSeq.flatMap { case (doc, toks) =>
        val matched = terms.filter(toks.contains)
        if (matched.isEmpty) None
        else {
          val dl = toks.size.toDouble
          val s = matched.map { t =>
            val tf = toks.count(_ == t).toDouble
            val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
            val raw = idf * (tf * (TextAnalysis.Bm25K1 + 1.0)) /
              (tf + TextAnalysis.Bm25K1 * (1.0 - TextAnalysis.Bm25B +
                TextAnalysis.Bm25B * dl * n / sumDl))
            BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          }.sum.toDouble
          Some((doc, s, matched.size.toLong))
        }
      }
      scored.sortBy { case (doc, s, _) => (-s, doc) }
        .take(TextAnalysis.Bm25TopK).zipWithIndex
        .map { case ((doc, s, nt), i) => (qid, i + 1, doc, s, nt) }
    }.toSet
    val got = q("tx15_bm25_topk").collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  // walks through the AdaptiveSparkPlanExec wrapper (PlanLintSpec's
  // collectAll rationale — a bare .collect sees only the AQE shell)
  private def collectAll(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val expanded = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    expanded +: (expanded.children.flatMap(collectAll) ++
      expanded.subqueries.flatMap(collectAll))
  }

  test("tx15: the per-query top-k plans as a map-side (partial) WindowGroupLimit") {
    val partials = collectAll(q("tx15_bm25_topk").queryExecution.executedPlan)
      .collect {
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.mode == org.apache.spark.sql.execution.window.Partial => w
      }
    assert(partials.nonEmpty,
      "BM25 top-k lost its map-side WindowGroupLimit — the query_id " +
        "exchange would carry every posting at 100 TB")
  }

  // ---- sim25: RRF fusion ----------------------------------------------

  test("sim25: fused rows come only from the lanes, scores match 1/(60+r) sums") {
    val ivf = SparkEntry.queries("sim04_ivf_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val lsh = Similarity.lshAnn(spark, sf, probes = Similarity.LshMultiProbes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    def ranks(lane: Seq[(Long, Long, Double)]): Map[(Long, Long), Int] =
      lane.groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy { case (_, nb, cos) => (-cos, nb) }.zipWithIndex
          .map { case ((qid, nb, _), i) => (qid, nb) -> (i + 1) }
      }
    val ra = ranks(ivf.toSeq)
    val rb = ranks(lsh.toSeq)
    val fused = q("sim25_rrf_fusion").collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expA = ra.get(key)
      val expB = rb.get(key)
      assert(expA.isDefined || expB.isDefined, s"$key in neither lane")
      assert(Option(r.get(3)).map(_.asInstanceOf[Int]) == expA, s"ra mismatch at $key")
      assert(Option(r.get(4)).map(_.asInstanceOf[Int]) == expB, s"rb mismatch at $key")
      val exp = expA.map(x => 1.0 / (Similarity.RrfK + x)).getOrElse(0.0) +
        expB.map(x => 1.0 / (Similarity.RrfK + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(5) - exp) < 1e-6, s"rrf mismatch at $key")
    }
    // two-lane agreement outranks any single-lane-only candidate with
    // the same best lane rank — the property RRF exists for
    val both = fused.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
    val only = fused.filter(r => r.isNullAt(3) ^ r.isNullAt(4))
    for (b <- both; o <- only if b.getLong(0) == o.getLong(0)) {
      val bBest = math.min(b.getInt(3), b.getInt(4))
      val oBest = if (o.isNullAt(3)) o.getInt(4) else o.getInt(3)
      if (bBest <= oBest)
        assert(b.getDouble(5) > o.getDouble(5))
    }
  }

  // ---- sim26: hybrid text+vector search ---------------------------------

  test("sim26: lanes fuse across modalities; the vector-only query degrades gracefully") {
    val bm = q("tx15_bm25_topk").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(2)) -> r.getInt(1)).toMap
    val vec = SparkEntry.queries("sim04_ivf_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val vr = vec.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy { case (_, nb, cos) => (-cos, nb) }.zipWithIndex
        .map { case ((qid, nb, _), i) => (qid, nb) -> (i + 1) }.toSeq
    }
    val fused = q("sim26_hybrid_search").collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expA = bm.get(key)
      val expB = vr.get(key)
      assert(expA.isDefined || expB.isDefined, s"$key in neither lane")
      assert(Option(r.get(3)).map(_.asInstanceOf[Int]) == expA, s"ra mismatch at $key")
      assert(Option(r.get(4)).map(_.asInstanceOf[Int]) == expB, s"rb mismatch at $key")
      val exp = expA.map(x => 1.0 / (Similarity.RrfK + x)).getOrElse(0.0) +
        expB.map(x => 1.0 / (Similarity.RrfK + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(5) - exp) < 1e-6, s"rrf mismatch at $key")
    }
    // query 4 has no BM25 workload: it must still serve, vector-only
    val q4 = fused.filter(_.getLong(0) == 4L)
    assert(q4.nonEmpty, "vector-only query 4 returned nothing")
    assert(q4.forall(_.isNullAt(3)), "query 4 grew a lexical rank from nowhere")
  }

  // ---- sim27: matryoshka progressive ANN ---------------------------------

  test("sim27: naive prefix-funnel recomputation agrees on every row") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double], n: Int): Double = {
      // left fold in array order — the engine kernel's summation order
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val P = Similarity.MatryoshkaPrefix
    val expected = (0L until Similarity.KnnQueries).flatMap { qid =>
      val qe = emb(qid)
      val cands = emb.toSeq.filter(_._1 != qid)
        .map { case (id, te) => (id, cos(qe, te, P)) }
        .sortBy { case (id, p) => (-p, id) }.take(Similarity.MatryoshkaCand)
      cands.map { case (id, p) => (id, p, cos(qe, emb(id), Similarity.Dims)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(Similarity.KnnK)
        .map { case (id, p, c) =>
          (qid, id,
            BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSet
    val got = q("sim27_matryoshka_ann").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == expected)
  }

  // ---- ds12: diversified top-k ------------------------------------------

  test("ds12: per-(query, cell) quota binds and survivors are the cosine top-k") {
    val rows = q("ds12_diverse_topk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // quota: never more than DiverseQuota results share a cell
    rows.groupBy(r => (r._1, r._4)).foreach { case (k, g) =>
      assert(g.length <= Similarity.DiverseQuota, s"quota exceeded at $k")
    }
    // per query: exactly KnnK rows (fixture has more cells than k),
    // ranked by cosine desc
    rows.groupBy(_._1).foreach { case (qid, g) =>
      assert(g.length == Similarity.KnnK, s"query $qid returned ${g.length}")
      val byRank = g.sortBy(_._2).map(_._5).toSeq
      assert(byRank == byRank.sortBy(x => -x), s"query $qid not cosine-ordered")
    }
    // diversity binds vs plain brute top-k on this fixture: the plain
    // top-k must violate the quota somewhere, else ds12 adds nothing
    val brute = SparkEntry.queries("sim01_knn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cellOf = rows.map(r => r._3 -> r._4).toMap
    // (only check neighbors whose cell ds12 reports; enough to show
    // at least one query's brute set concentrates past the quota)
    val concentrated = brute.groupBy(_._1).exists { case (_, g) =>
      g.flatMap(p => cellOf.get(p._2)).groupBy(identity)
        .exists(_._2.length > Similarity.DiverseQuota)
    }
    assert(concentrated || rows.map(_._3).toSet != brute.map(_._2).toSet,
      "fixture never concentrates: quota unobservable")
  }
}
