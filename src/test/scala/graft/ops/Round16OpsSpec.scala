package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{SparkEntry, SparkSpec}

/** Invariants for the round-16 additions (VERDICT r15 items 1, 3, 4,
  * 5, 6 + the ADVICE fixes): the skew-safe impact ranking, the
  * measured capped-probe staleness window, the drift-gated
  * maintenance loop (tx22), the exactly-once lexical maintain batch
  * (st20's core), the query-frame serving API, and the impactProbe
  * tombstone precondition. Exact result parity stays the DuckDB
  * oracle's job — these pin plan/mechanism properties and the
  * conditional behavior the oracle's single fixture can't reach.
  */
class Round16OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

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

  // ---- withImpactMeta: equality with the whole-table window form -------

  test("withImpactMeta equals the row_number window form, rank and df alike") {
    // synthetic postings: 50 terms x ~100 postings, unique doc_id,
    // tf/dl collisions on purpose so the doc_id tiebreak matters
    val p = spark.range(5000).select(
      concat(lit("t"), pmod(col("id"), lit(50))).as("term"),
      col("id").as("doc_id"),
      (pmod(col("id") * 13, lit(5)) + 1).as("tf"),
      (pmod(col("id") * 7, lit(20)) + 1).as("dl"))
    val got = LexIndex.withImpactMeta(p)
      .select("term", "doc_id", "tf", "dl", "imp_rank", "df")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
      .sortBy(t => (t._1, t._5))
    val w = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("dl").asc, col("doc_id").asc)
    val want = p
      .withColumn("imp_rank", row_number().over(w))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
      .sortBy(t => (t._1, t._5))
    assert(got.length == 5000)
    assert(got.toSeq == want.toSeq,
      "skew-safe two-phase ranking diverged from the window form")
  }

  test("withImpactMeta: a zipf-heavy term cannot serialize the ranking on one task") {
    // stopword-shaped fixture: ONE term holds ~91% of all postings
    val heavy = spark.range(100000).select(
      lit("the").as("term"), col("id").as("doc_id"),
      lit(1L).as("tf"), (pmod(col("id"), lit(40)) + 1).as("dl"))
    val tail = spark.range(10000).select(
      concat(lit("w"), pmod(col("id"), lit(1000))).as("term"),
      (col("id") + 1000000L).as("doc_id"),
      lit(1L).as("tf"), (pmod(col("id"), lit(40)) + 1).as("dl"))
    val p = heavy.unionByName(tail)
    // 1. the MECHANISM: range partitioning over the full impact order
    //    splits the heavy term across many partitions — per-task rows
    //    stay ~|rows|/parts whatever the df skew (the property the
    //    old Window.partitionBy("term") plan lacked by construction)
    val ranked = p.repartitionByRange(16, LexIndex.impactOrder: _*)
    val sizes = ranked.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n")).collect()
    val maxPart = sizes.map(_.getLong(1)).max
    info(s"range-partitioned max task rows: $maxPart of 110000 " +
      s"(heavy term df = 100000, ${sizes.length} partitions)")
    assert(maxPart < 100000 / 4,
      s"the heavy term still serializes: one task got $maxPart rows")
    val heavySpan = ranked.filter(col("term") === "the")
      .select(spark_partition_id()).distinct().count()
    assert(heavySpan >= 4,
      s"heavy term spans only $heavySpan partitions — not range-split")
    // 2. the PLAN: every window in the helper's output runs over the
    //    SEGMENT frame (per-(partition, term) aggregates — its input
    //    carries the `cnt` column), never over the raw postings, so
    //    no window partition scales with df
    val windows = collectAll(
      LexIndex.withImpactMeta(p).queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected the segment-offset windows")
    windows.foreach { w =>
      assert(w.child.output.exists(_.name == "cnt"),
        s"a window runs over a non-segment input: ${w.child.output.map(_.name)}")
    }
    // 3. and the result is still the exact global rank
    val sample = LexIndex.withImpactMeta(p)
      .filter(col("term") === "the" && col("imp_rank") <= 5)
      .orderBy("imp_rank").select("doc_id", "imp_rank", "df").collect()
    assert(sample.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4, 5))
    assert(sample.forall(_.getLong(2) == 100000L), "df lost under the split")
    // dl asc then doc_id asc: dl=1 rows are ids 0,40,80,120,160
    assert(sample.map(_.getLong(0)).toSeq == Seq(0L, 40L, 80L, 120L, 160L),
      s"global impact order broken: ${sample.map(_.getLong(0)).mkString(",")}")
  }

  // ---- staleness window of the capped probe (VERDICT item 3) ----------

  test("staleness: naive stale probe drifts with df bias; the segment merge recovers the global answer") {
    // the state dq08's threshold exists to bound: after an append and
    // BEFORE reindexImpact, batch-local metadata serves drifted
    // results. Measured here against both references — the
    // global-cap answer (tx20) and the EXACT uncapped answer (tx16) —
    // at append fractions 1/8, 1/4, 1/2, for BOTH stale serving
    // modes: the naive capped probe (batch-local df — tx20's verb on
    // a stale index) and the segment-merged probe (per-batch
    // candidates + exact summed df — tx23's verb).
    //
    // Round-16 findings (the numbers that motivated tx23):
    //   - the naive probe's loss is dominated by STALE df, not
    //     candidate truncation — a small fresh batch has tiny
    //     batch-local df, its docs' idf explodes, and they crowd out
    //     the true top-k; measured agreement vs the global cap was
    //     0.20 / 0.38 / 0.45 at fractions 1/8 / 1/4 / 1/2 (INVERSE
    //     in fraction: a balanced split biases idf uniformly, a
    //     lopsided one doesn't). The vocabulary-KL trigger (dq08)
    //     reads ~0.002 on these same splits — vocabulary drift and
    //     rank staleness are INDEPENDENT axes, so capped serving
    //     between reindexes needs the segment merge, not just the
    //     drift gate.
    //   - summed-df alone (no re-cap) measured 0.55–0.65: the extra
    //     per-term tails shift partial BM25 sums unpredictably on
    //     the cap-adversarial fixture. The re-capped merge is exact
    //     BY CONSTRUCTION (the per-segment top-C union contains the
    //     global top-C; re-ranking restores it), so the assertions
    //     below demand equality, not a floor.
    val globalPairs = q("tx20_bm25_impact_topk").collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSet
    val exactPairs = q("tx16_bm25_index_probe").collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSet
    val docs = graft.Tables.documents(spark, sf)
    def agree(a: Set[(Int, Long)], b: Set[(Int, Long)]) =
      (a & b).size.toDouble / b.size
    val rows = Seq(8, 4, 2).map { m =>
      val isNew = pmod(hash(col("doc_id")), lit(m)) === lit(0)
      val prefix = s"graft_lex_stale${m}_${System.nanoTime()}"
      val path = IndexCore.newTempDir(s"lexstale$m")
      try {
        LexIndex.persist(spark, sf, path, prefix, Some(docs.filter(!isNew)))
        // distinct stamp: segmentProbe's df sum is per (term, batch)
        LexIndex.append(spark, sf, docs.filter(isNew), prefix, batch = 1L)
        val naive = LexIndex.impactProbe(spark, sf, prefix).collect()
          .map(r => (r.getInt(0), r.getLong(2))).toSet
        val seg = LexIndex.segmentProbe(spark, sf, prefix).collect()
          .map(r => (r.getInt(0), r.getLong(2))).toSet
        val out = (m, agree(naive, globalPairs), agree(seg, globalPairs),
          agree(seg, exactPairs))
        info(f"1/$m append — naive vs global: ${out._2}%.3f; " +
          f"segment vs global: ${out._3}%.3f; segment vs exact: ${out._4}%.3f")
        out
      } finally {
        LexIndex.drop(spark, prefix)
        IndexCore.retireTempDir(path)
      }
    }
    val globalVsExact = agree(globalPairs, exactPairs)
    info(f"reference: global cap vs exact = $globalVsExact%.3f " +
      "(the fixture is cap-adversarial — Round15's contract)")
    rows.foreach { case (m, naiveG, segG, segE) =>
      // the re-capped segment merge serves the global-cap answer
      // EXACTLY at every append fraction — tx20's semantics with no
      // rebuild — and therefore inherits its exact-answer fidelity
      assert(segG == 1.0,
        f"1/$m: segment merge lost the global answer: $segG%.3f (naive: $naiveG%.3f)")
      assert(math.abs(segE - globalVsExact) < 1e-9,
        f"1/$m: segment-vs-exact $segE%.3f != global-vs-exact $globalVsExact%.3f")
    }
    // pin the naive probe's measured loss shape so a regression (or a
    // silent fix) shows up: low agreement, worst at the smallest
    // fraction — the df-bias signature tx23 exists to remove
    assert(rows.map(_._2).forall(a => a >= 0.1 && a <= 0.8),
      s"naive stale agreement left its measured band: ${rows.map(_._2)}")
  }

  // ---- tx22: the drift-gated maintenance loop --------------------------

  test("tx22: quiet corpus skips the rebuild; drifted corpus fires it and restores the global cap") {
    def corpus(newText: org.apache.spark.sql.Column): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-tx22").toString
      spark.range(400)
        .select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(4)) === 0, newText)
            .otherwise(lit("query filter join alpha beta")).as("text"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    // QUIET: the arriving quarter speaks the resident vocabulary —
    // KL ~ 0, the gate must NOT fire, no reindex phase runs
    val quiet = corpus(lit("query filter join alpha beta"))
    q2Run(quiet)
    val phasesQuiet = graft.tools.Phases.snapshot().getOrElse("tx22", Seq.empty)
    assert(phasesQuiet.exists(_._1 == "drift"), "drift gate never ran")
    assert(!phasesQuiet.exists(_._1 == "reindex"),
      s"quiet corpus fired the rebuild: ${phasesQuiet.map(_._1)}")
    // DRIFTED: disjoint vocabulary (still carrying query terms so the
    // serve is non-trivial) — the gate fires, the rebuild runs, and
    // the served result equals a FRESH FULL BUILD's capped probe
    // (global impact order restored end to end)
    val drifted = corpus(lit("stream window batch dup zulu"))
    val served = q2Run(drifted)
    val phasesDrift = graft.tools.Phases.snapshot().getOrElse("tx22", Seq.empty)
    assert(phasesDrift.exists(_._1 == "reindex"),
      s"drifted corpus did not fire the rebuild: ${phasesDrift.map(_._1)}")
    val prefix = s"graft_lex_tx22full_${System.nanoTime()}"
    val path = IndexCore.newTempDir("lextx22full")
    try {
      LexIndex.persist(spark, drifted, path, prefix)
      val fresh = LexIndex.impactProbe(spark, drifted, prefix)
        .collect().map(_.toString).toSeq
      assert(served.nonEmpty, "drifted serve returned nothing")
      assert(served == fresh,
        "post-rebuild serve diverged from the fresh full build's capped probe")
    } finally {
      LexIndex.drop(spark, prefix)
      IndexCore.retireTempDir(path)
    }
  }

  private def q2Run(dir: String): Seq[String] =
    SparkEntry.queries("tx22_bm25_maintain_loop")(spark, dir)
      .collect().map(_.toString).toSeq

  // ---- st20 core: exactly-once lexical maintenance ---------------------

  test("maintainBatch: replay is a whole-batch no-op; a crash window completes only the missing tables") {
    val docs = graft.Tables.documents(spark, sf)
    val h = pmod(hash(col("doc_id")), lit(4))
    val prefix = s"graft_lex_mb_${System.nanoTime()}"
    val path = IndexCore.newTempDir("lexmb")
    try {
      LexIndex.persist(spark, sf, path, prefix,
        Some(docs.filter(h === lit(1) || h === lit(2))))
      val batch0 = docs.filter(h === lit(3))
      val batch1 = docs.filter(h === lit(0))
      // clean run + replay
      assert(LexIndex.maintainBatch(spark, sf, prefix, batch0, 0L),
        "fresh index claims batch 0 already maintained")
      def counts() = (
        spark.table(LexIndex.postingsTable(prefix)).count(),
        spark.table(LexIndex.docstatsTable(prefix)).count(),
        spark.table(LexIndex.statsTable(prefix)).count())
      val afterB0 = counts()
      assert(!LexIndex.maintainBatch(spark, sf, prefix, batch0, 0L),
        "replayed batch 0 was not stamp-skipped")
      assert(counts() == afterB0, "replay mutated the index")
      // crash window: batch 1's postings land, then the "crash" —
      // docstats and the stats row never written
      LexIndex.writePostings(LexIndex.tokenized(batch1), path = "",
        prefix, 1L, firstWrite = false)
      val orphanPostings = spark.table(LexIndex.postingsTable(prefix))
        .filter(col("ingest_batch") === 1L).count()
      assert(orphanPostings > 0, "fixture wrote no orphan postings")
      // the replay must complete the batch: skip postings, write the rest
      assert(LexIndex.maintainBatch(spark, sf, prefix, batch1, 1L),
        "incomplete batch was skipped as done")
      assert(spark.table(LexIndex.postingsTable(prefix))
        .filter(col("ingest_batch") === 1L).count() == orphanPostings,
        "recovery double-appended postings")
      assert(spark.table(LexIndex.statsTable(prefix))
        .filter(col("ingest_batch") === 1L).count() == 1,
        "recovery did not land exactly one stats row")
      // and a final replay is a whole-batch no-op
      assert(!LexIndex.maintainBatch(spark, sf, prefix, batch1, 1L))
      // the maintained index (= full corpus) serves tx15's decisions
      val served = LexIndex.probe(spark, sf, prefix).collect().map(_.toString)
      val fresh = q("tx15_bm25_topk").collect().map(_.toString)
      assert(served.toSeq == fresh.toSeq,
        "maintained index diverged from the full build")
      // the replay fence must survive a stats re-base (round-16
      // review): compact folds per-batch stats into ONE BaseBatch
      // row, so the stats-stamp check alone would re-admit batch 1
      // and double-count its docs — the ledger row is what holds
      LexIndex.compact(spark, prefix)
      // the rewrite must keep the (term, imp_rank) within-bucket sort
      // (round-16 catch): dropping it both wedges later appends on a
      // bucketing-mismatch and loosens the footer bounds the capped
      // probe's imp_rank pruning reads
      val bs = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(
          LexIndex.postingsTable(prefix))).bucketSpec
      assert(bs.exists(_.sortColumnNames == Seq("term", "imp_rank")),
        s"compaction dropped the imp_rank sort: $bs")
      assert(!LexIndex.maintainBatch(spark, sf, prefix, batch1, 1L),
        "post-compact replay of a ledgered batch was not fenced")
      assert(spark.table(LexIndex.statsTable(prefix)).count() == 1,
        "post-compact replay appended a duplicate stats row")
      // and a MID-crash-window batch (stamped but unledgered) blocks
      // maintenance loudly instead of having its fence destroyed
      val b2 = docs.filter(h === lit(0)).limit(7)
      LexIndex.writeDocstats(LexIndex.tokenized(b2), path = "",
        prefix, 2L, firstWrite = false)
      val e = intercept[IllegalArgumentException] {
        LexIndex.compact(spark, prefix)
      }
      assert(e.getMessage.contains("maintainBatch"),
        s"guard message should point at the remedy: ${e.getMessage}")
      // replaying the batch completes + ledgers it; maintenance unblocks
      assert(LexIndex.maintainBatch(spark, sf, prefix, b2, 2L))
      LexIndex.compact(spark, prefix)
    } finally {
      LexIndex.drop(spark, prefix)
      IndexCore.retireTempDir(path)
    }
  }

  // ---- query-frame serving API (VERDICT item 6) ------------------------

  test("probe/impactProbe over a query FRAME serve the fixed workload's rows; small batches keep the IN pushdown") {
    import spark.implicits._
    val prefix = LexIndex.ensurePersisted(spark, sf)
    val qt = graft.ops.TextAnalysis.Bm25Queries
      .flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .toDF("query_id", "term")
    val viaFrame = LexIndex.probe(spark, qt, prefix).collect().map(_.toString)
    val fixed = q("tx16_bm25_index_probe").collect().map(_.toString)
    assert(viaFrame.toSeq == fixed.toSeq,
      "query-frame probe diverged from the fixed-workload probe")
    val viaFrameCapped = LexIndex.impactProbe(spark, qt, prefix)
      .collect().map(_.toString)
    val fixedCapped = q("tx20_bm25_impact_topk").collect().map(_.toString)
    assert(viaFrameCapped.toSeq == fixedCapped.toSeq,
      "query-frame impactProbe diverged from the fixed-workload probe")
    // small batch: the term set must reach the postings scan as a
    // pushed IN/INSET filter (bucket pruning upstream of everything)
    val scans = collectAll(
      LexIndex.probe(spark, qt, prefix).queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .filter(_.tableIdentifier.exists(_.table.endsWith("_postings")))
    assert(scans.nonEmpty, "no postings scan in the frame-probe plan")
    assert(scans.exists(_.dataFilters.exists(e =>
      e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.In] ||
        e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.InSet])),
      "small query frame lost the term IN pushdown:\n" +
        scans.map(_.dataFilters.mkString(", ")).mkString("\n"))
  }

  test("probe over a LARGE query frame falls back to the semi-join, same answer") {
    import spark.implicits._
    val prefix = LexIndex.ensurePersisted(spark, sf)
    // the real workload + 300 fake terms that match nothing: past
    // MaxInlineTerms the probe must not build a 300-literal IN, and
    // unmatched terms must not change any decision
    val fakes = (0 until 300).map(i => (0, s"zzz_nonexistent_$i"))
    val qt = (graft.ops.TextAnalysis.Bm25Queries
      .flatMap { case (id, ts) => ts.map(t => (id, t)) } ++ fakes)
      .toDF("query_id", "term")
    val got = LexIndex.probe(spark, qt, prefix).collect().map(_.toString)
    val fixed = q("tx16_bm25_index_probe").collect().map(_.toString)
    assert(got.toSeq == fixed.toSeq,
      "large-frame probe diverged (unmatched terms changed decisions?)")
    val scans = collectAll(
      LexIndex.probe(spark, qt, prefix).queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .filter(_.tableIdentifier.exists(_.table.endsWith("_postings")))
    assert(scans.forall(_.dataFilters.forall(e =>
      !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.In] &&
        !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.InSet])),
      "a 311-term batch was inlined as a literal IN filter")
  }

  // ---- tx24: the fused merge+reindex pass -------------------------------

  test("tx24: one fused rewrite folds segments, purges the retiree, refreshes global metadata") {
    val docs = graft.Tables.documents(spark, sf)
    val isNewDense = pmod(col("doc_id"), lit(4)) === lit(0)
    val prefix = s"graft_lex_merge_${System.nanoTime()}"
    val path = IndexCore.newTempDir("lexmerge")
    try {
      LexIndex.persist(spark, sf, path, prefix,
        Some(docs.filter(!isNewDense)))
      LexIndex.append(spark, sf, docs.filter(isNewDense), prefix, batch = 1L)
      val victim = LexIndex.segmentProbe(spark, sf, prefix)
        .filter(col("query_id") === 0 && col("rk") === 1)
        .select("doc_id")
      val victimId = victim.collect().head.getLong(0)
      LexIndex.retire(spark, prefix, victim)
      LexIndex.mergeReindex(spark, prefix)
      // physical: one postings file per bucket at the swapped location
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(
          LexIndex.postingsTable(prefix))).location.toString.stripPrefix("file:")
      val files = Option(new java.io.File(loc).listFiles()).fold(0)(
        _.count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")))
      assert(files == LexIndex.Buckets,
        s"fused merge left $files postings files, expected ${LexIndex.Buckets}")
      // logical: retiree physically gone, tombstones cleared, ranks
      // globally contiguous per term (tx21's invariant)
      val p = spark.table(LexIndex.postingsTable(prefix))
      assert(p.filter(col("doc_id") === victimId).count() == 0,
        "retired doc survived the fused rewrite")
      assert(!spark.catalog.tableExists(IndexCore.tombstonesTable(prefix)),
        "tombstones not cleared after the purge")
      val bad = p.groupBy("term").agg(
        count(lit(1)).as("n"),
        countDistinct(col("imp_rank")).as("d"),
        max(col("imp_rank")).as("m"))
        .filter(col("n") =!= col("d") || col("m") =!= col("n"))
      assert(bad.isEmpty, "ranks not globally contiguous after the fused pass")
      // serving: equals a FRESH build over the survivors
      val served = LexIndex.impactProbe(spark, sf, prefix)
        .collect().map(_.toString).toSeq
      val fullPrefix = s"graft_lex_mergefull_${System.nanoTime()}"
      val fullPath = IndexCore.newTempDir("lexmergefull")
      try {
        LexIndex.persist(spark, sf, fullPath, fullPrefix,
          Some(docs.filter(col("doc_id") =!= victimId)))
        val fresh = LexIndex.impactProbe(spark, sf, fullPrefix)
          .collect().map(_.toString).toSeq
        assert(served == fresh,
          "fused merge+reindex diverged from a fresh build over the survivors")
      } finally {
        LexIndex.drop(spark, fullPrefix)
        IndexCore.retireTempDir(fullPath)
      }
    } finally {
      LexIndex.drop(spark, prefix)
      IndexCore.retireTempDir(path)
    }
  }

  // ---- impactProbe precondition (round-16 ADVICE) ----------------------

  test("capped lanes under tombstones: text-less retire fails loudly; purge-without-reindex fences; reindex restores") {
    // round 17 rewrote the blanket fail-fast into the over-fetch +
    // mask + df-correction path — the REMAINING fail-fast states are
    // (a) a retire that recorded no term containment (df can't be
    // corrected) and (b) a compact purge that left metadata stale
    // with the side tables cleared (the round-17 ADVICE marker).
    val prefix = s"graft_lex_tomb_${System.nanoTime()}"
    val path = IndexCore.newTempDir("lextomb")
    try {
      LexIndex.persist(spark, sf, path, prefix)
      val victim = LexIndex.probe(spark, sf, prefix)
        .select(col("doc_id")).limit(1)
      LexIndex.retire(spark, prefix, victim) // no corpus → no dfcorr
      val e = intercept[IllegalArgumentException] {
        LexIndex.impactProbe(spark, sf, prefix).collect()
      }
      assert(e.getMessage.contains("retire"),
        s"guard message should point at the text-ful retire remedy: ${e.getMessage}")
      // the EXACT probe keeps serving through the tombstone window
      assert(LexIndex.probe(spark, sf, prefix).count() > 0)
      // a purge WITHOUT a metadata refresh must fence the capped lane
      // (stale imp_rank holes + overcounted df, correction tables gone)
      LexIndex.compact(spark, prefix)
      val e2 = intercept[IllegalArgumentException] {
        LexIndex.impactProbe(spark, sf, prefix).collect()
      }
      assert(e2.getMessage.contains("_NEEDS_REINDEX"),
        s"post-purge capped serve must hit the marker fence: ${e2.getMessage}")
      // the metadata-refreshing rewrite clears the fence
      LexIndex.reindexImpact(spark, prefix)
      assert(LexIndex.impactProbe(spark, sf, prefix).count() > 0)
    } finally {
      LexIndex.drop(spark, prefix)
      IndexCore.retireTempDir(path)
    }
  }
}
