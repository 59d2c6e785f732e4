package graft.ops

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec

/** Catalog-wide physical-plan lint — the 100 TB guards that hold for
  * EVERY query, not just the ones with dedicated plan tests:
  *
  *   1. no CartesianProductExec anywhere (an unbroadcast cross join
  *      of two big sides is never acceptable);
  *   2. every BroadcastNestedLoopJoin broadcasts a provably tiny
  *      side (≤ 1 MB by optimizer estimate) — the pattern the engine
  *      uses deliberately for 1-row count/size frames and constant
  *      relations (plane literals, bit tables), which must never
  *      silently grow into a corpus-sized broadcast;
  *   3. parquet scans under selective filters report PushedFilters
  *      (spot-checked on representative queries — pushdown is plan
  *      structure, so one green query pins the mechanism).
  */
class PlanLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // The maintenance-cycle entries run their full
  // persist/append/compact cycle EAGERLY inside the query function
  // (honest bench timing — the number covers the real work), so
  // invoking them once per lint test would execute heavy
  // side-effecting fixture work three times just to read plans, and
  // the frame they RETURN is a localCheckpoint scan with no plan left
  // to lint (round-10 ADVICE). Lint their constituent PROBE plans
  // instead — the read path a consumer executes at scale; the
  // write-side plan properties are pinned by BandIndexSpec /
  // VecIndexSpec.
  private def bandProbe(s: org.apache.spark.sql.SparkSession, d: String) =
    BandIndex.probe(s, d, BandIndex.ensurePersisted(s, d, "lint"))
  private def bandProbeShifted(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.functions.{col, lit}
    val ids = graft.Tables.documents(s, d)
      .filter(col("source") === Dedup.IncBatchSrc)
      .select((col("doc_id") + lit(BandIndex.DayOffset)).as("doc_id"))
    BandIndex.probeIds(s, d, BandIndex.ensurePersisted(s, d, "lint"), ids)
  }
  private def vecProbe(s: org.apache.spark.sql.SparkSession, d: String) =
    VecIndex.probe(s, d, VecIndex.ensurePersisted(s, d, "lint"))

  private val eagerCycleProbes: Map[String,
      (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "dd16_index_append" -> bandProbe _,
    "dd17_index_compact" -> bandProbe _,
    "dd18_index_retention" -> bandProbe _,
    "st07_stream_index_maintain" -> bandProbeShifted _,
    "st08_stream_exactly_once" -> bandProbeShifted _,
    "st11_selffence_replay" -> bandProbeShifted _,
    "sim15_vec_index_append" -> vecProbe _,
    "sim16_vec_index_compact" -> vecProbe _,
    "sim17_vec_retention" -> vecProbe _,
    "st10_stream_ann_maintain" -> vecProbe _)

  /** One DataFrame per catalog entry, built once and shared by all
    * three lint tests (executedPlan is computed lazily and cached per
    * QueryExecution, so plan construction happens once per entry). */
  private lazy val lintTargets: Seq[(String, org.apache.spark.sql.DataFrame)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> eagerCycleProbes.getOrElse(name, fn)(spark, sf)
    }

  private def collectAll(plan: SparkPlan): Seq[SparkPlan] = {
    val expanded = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    expanded +: (expanded.children.flatMap(collectAll) ++
      expanded.subqueries.flatMap(collectAll))
  }

  // BNLJ sides whose bound is RUNTIME-enforced by an in-plan filter
  // the optimizer cannot see through (vec_id < ncells where ncells is
  // a computed 1-row frame → no static selectivity): the side is
  // ⌈√n⌉ / ⌈n^¼⌉ rows by construction, but its static estimate is the
  // whole unfiltered table. Additions here need the same written
  // justification — this is the review gate, not an escape hatch.
  private val runtimeBoundedBnljSides = Set(
    "dd06_cosine_dup", // cents = e WHERE vec_id < ncells (⌈√n⌉ rows)
    "dd08_cosine_dup2", // l1cents/l2cents, ⌈n^¼⌉ and √n rows
    "sim06_ivf2_ann", // same two-level cells as dd08
    // the Lloyd-trained PQ codebook is GROUP BY code over ≤ M·K
    // assignment rows → exactly PqK (8) rows by construction, but it
    // arrives from a localCheckpoint'ed aggregation chain whose
    // static estimate is garbage; the crossJoin is explicitly
    // broadcast-hinted
    "sim07_pq_adc",
    "sim24_opq_adc", // sim07's codebook chain over the permuted frame
    "sim12_pq_train_eval", // embeds both sim07 codebook modes
    // SemDeDup centroid frame (Similarity.scala `cents`): reps
    // crossJoin'd with a broadcast 1-row (ncells, n, mid) frame,
    // hash-sampled at rate ncells/n (round 14) → ~⌈√n⌉ rows by
    // construction and explicitly broadcast-hinted into the
    // assignment join; the static estimate is the whole unfiltered
    // reps table because the optimizer has no selectivity for the
    // computed-scalar predicate — same runtime-bounded-cells pattern
    // as dd06/dd08/sim06
    "dd14_semantic_dedup",
    // ds11 reuses dd14's hash-sampled ~√n-cell centroid frame (reps
    // crossJoin'd with the broadcast 1-row counts frame,
    // self-selected at rate ncells/n → ~⌈√n⌉ rows by construction,
    // broadcast-hinted) — the same runtime-bounded-cells pattern;
    // the optimizer has no selectivity for the computed-scalar
    // predicate
    "ds11_contrastive_pairs",
    // embeds sim06's two-level quantizer twice (1-probe and
    // multi-probe variants share twoLevelParts) → the same
    // runtime-bounded ⌈n^¼⌉/√n cell frames, broadcast-hinted
    "sim13_multiprobe_recall",
    // the Lloyd-trained coarse quantizer is IvfCentroids (16) rows by
    // construction — same localCheckpoint'ed-aggregation garbage
    // static estimate as sim07's codebook; every crossJoin against it
    // is explicitly broadcast-hinted
    "sim21_trained_ivf")

  test("no catalog query plans a cartesian product; all BNLJ sides are tiny") {
    val MaxBroadcastBytes = 1L << 20
    lintTargets.foreach { case (name, df) =>
      val nodes = collectAll(df.queryExecution.executedPlan)
      val cartesian = nodes.collect { case c: CartesianProductExec => c }
      assert(cartesian.isEmpty, s"$name plans CartesianProduct")
      nodes.collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
        val broadcastSide = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          case _ => b.left
        }
        // not every exec node carries a logicalLink (exchange
        // wrappers, reused stages) — use the ROOT-MOST linked node
        // (collectAll is pre-order, so .head is the outermost
        // estimate): taking the subtree minimum would pass whenever
        // any tiny descendant exists, which is exactly the
        // corpus-sized-broadcast regression this lint guards against
        val estimates = collectAll(broadcastSide)
          .flatMap(_.logicalLink).map(_.stats.sizeInBytes)
        assert(estimates.nonEmpty,
          s"$name BroadcastNestedLoopJoin side has no size estimate")
        assert(estimates.head <= MaxBroadcastBytes ||
            runtimeBoundedBnljSides.contains(name),
          s"$name BroadcastNestedLoopJoin side estimated at ${estimates.head} bytes" +
            " — broadcast-bound it or justify it in runtimeBoundedBnljSides")
      }
    }
  }

  // Queries whose plans legitimately contain an UNPARTITIONED window,
  // each with the boundedness argument for its input (a constant
  // partition key cannot express this — Spark 4's
  // EliminateWindowPartitions folds foldable keys away, so the
  // canonical bounded-window plan IS the empty partitionSpec).
  // Additions need the same written justification; anything not
  // listed fails — that is the gate against a single-reducer global
  // sort over an unbounded frame. The set is compared EXACTLY, so a
  // stale entry (query regains a partition key) also flags.
  private val boundedUnpartitionedWindows = Set(
    // bucket/bin prefix-sum frames: the window input is GROUP BY over
    // a bounded-domain key (≤ 32 hash buckets / ≤ ~hundreds of
    // centinat or equal-width bins), never the corpus
    "ds03_context_pack", // PackBuckets=32 cross-bucket offsets
    "ds04_epoch_shuffle", // 32 range buckets of the 60-bit hash
    "ds05_curriculum", // difficulty deciles (10 buckets)
    "ds09_balanced_shards", // per-n-tokens bucket offsets (distinct n)
    "qs01_hist_quantiles", // QuantBins equal-width histogram bins
    // (cur07 left this list in round 11: its thresholds now come from
    // a single array-aggregate HOF over the collected histogram, no
    // window at all)
    "z01_zorder_layout", "z02_hilbert_layout", // space-filling-curve bucket offsets
    "dd12_snm_pairs", // 2-char blocking-prefix bucket offsets (≤ 36² keys)
    "w06_abc_pareto", // per-revenue-centile bucket totals prefix sum
    // post-limit rank: window input is .limit(SampleK) = 100 rows
    "ds10_exact_k_sample",
    // occupancy-total window over GROUP BY cluster — ≤ IvfCentroids
    // (16) rows by construction, never the corpus
    "dq07_cell_drift",
    // smoothing-total window over GROUP BY bucket — ≤ VocabTopK+1
    // (17) rows by construction (top-16 vocabulary + OOV), never
    // the corpus
    "dq08_vocab_drift",
    // OPQ variance rank: window input is the Dims-row (64) per-dim
    // variance frame, never the corpus
    "sim24_opq_adc",
    // ds09's bucket-offset form over pipe01's kept set — same
    // GROUP BY n bounded-domain argument as ds09
    "pipe02_shard_manifest")

  test("every unpartitioned window is allowlisted with a boundedness argument") {
    val violations = lintTargets.flatMap {
      case (name, df) =>
        val nodes = collectAll(df.queryExecution.executedPlan)
        val unpart = nodes.exists {
          case w: org.apache.spark.sql.execution.window.WindowExecBase =>
            w.partitionSpec.isEmpty
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
            w.partitionSpec.isEmpty
          case _ => false
        }
        if (unpart) Some(name) else None
    }.toSet
    assert(violations == boundedUnpartitionedWindows,
      s"unlisted unpartitioned windows: ${(violations -- boundedUnpartitionedWindows).toSeq.sorted.mkString(",")}; " +
        s"stale allowlist entries: ${(boundedUnpartitionedWindows -- violations).toSeq.sorted.mkString(",")}")
  }

  test("selective filters reach the parquet scan as PushedFilters") {
    Seq("p07_between", "p08_filter_eq").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("PushedFilters: ["), s"$name: no PushedFilters")
      assert(!formatted.contains("PushedFilters: []"), s"$name: empty PushedFilters")
    }
  }

  // Scans whose PUSHABLE-SHAPED dataFilters legitimately do not
  // reach the parquet reader — each entry needs the written reason.
  // Anything not listed fails: that is the gate against a selective
  // query silently reading every row group.
  private val pushdownExempt: Map[String, String] = Map.empty

  /** Is `e` a predicate shape the parquet source COULD push —
    * attribute-vs-literal comparison, attribute null test, IN-list,
    * string prefix? Filters over computed expressions (hash-based
    * splits, bit interleaves, derived arithmetic, lambda/array work)
    * are structurally unpushable and therefore not lint-relevant:
    * flagging them would force a 20+-entry allowlist that documents
    * nothing. AND needs one pushable conjunct; OR needs both (parquet
    * pushes a disjunction only whole). */
  private def pushableShaped(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case b: BinaryComparison =>
        (b.left.isInstanceOf[AttributeReference] && b.right.foldable) ||
          (b.right.isInstanceOf[AttributeReference] && b.left.foldable)
      case IsNotNull(_: AttributeReference) => true
      case IsNull(_: AttributeReference) => true
      case In(_: AttributeReference, list) => list.forall(_.foldable)
      case InSet(_: AttributeReference, _) => true
      case StartsWith(_: AttributeReference, l) => l.foldable
      case And(l, r) => pushableShaped(l) || pushableShaped(r)
      case Or(l, r) => pushableShaped(l) && pushableShaped(r)
      case Not(c) => pushableShaped(c)
      case _ => false
    }
  }

  test("catalog-wide: every pushable-filtered parquet scan pushes at least one filter") {
    // Round-9 VERDICT item 6: the spot-check above pins the
    // mechanism; this sweep pins the PROPERTY for all 185 plans.
    // Plan construction is cheap at sf0.001, and FileSourceScanExec
    // exposes exactly the two facts needed: dataFilters (the
    // planner's post-scan residual, i.e. the query IS selective on
    // this scan) and the PushedFilters metadata (what reached the
    // parquet reader). A scan with a pushable-shaped residual that
    // pushes NOTHING reads every row group at 100 TB.
    val violations = lintTargets.flatMap {
      case (name, df) =>
        collectAll(df.queryExecution.executedPlan)
          .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
          .flatMap { s =>
            val pushed = s.metadata.getOrElse("PushedFilters", "[]")
            if (s.dataFilters.exists(pushableShaped) && pushed == "[]" &&
                !pushdownExempt.contains(name))
              Some(s"$name: unpushed dataFilters ${s.dataFilters.mkString(" && ")}")
            else None
          }
    }
    assert(violations.isEmpty,
      s"pushable-filtered parquet scans with no pushdown (add to pushdownExempt " +
        s"only with a written reason):\n${violations.mkString("\n")}")
  }
}
