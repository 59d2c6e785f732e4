package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall instrument for the ANN lanes — POWERED UP in round 14
  * (VERDICT r13 item 1: 5 queries × k=5 could not support the
  * "recall flat / noise" conclusions it was being quoted for, and
  * sim24's sf0.01 reading was a 3× drop dismissed without the power
  * to do so). Defaults: 128 queries × k=10 → n = 1280 graded
  * ground-truth neighbors per lane, reported as mean recall ± a
  * simple 95% binomial interval (hits within one query are
  * correlated, so the interval is approximate — stated, not hidden).
  *
  * Lanes measured against the exact brute-force top-k (sim01's
  * kernel, parameterized):
  *
  *   - seed PQ (untrained first-PqK codebook, identity layout)
  *   - trained PQ (sim07: Lloyd codebooks, identity layout)
  *   - OPQ PQ (sim24: Lloyd codebooks over the permuted basis)
  *   - IVF (sim04), LSH 1-probe/multi-probe (sim02/sim13's knob),
  *     two-level IVF 1/multi L1-probe (sim06/sim13's knob)
  *
  * plus the quantity the OPQ rotation actually optimizes: the per-
  * subspace variance totals before and after the permutation. The
  * catalog entries stay at the oracle-locked 5×5 — this instrument
  * is the statistical-power lane; results land in SCALE_NOTES.
  *
  * Run: tools/run.sh graft.tools.OpqProbe [sfDir] [nQueries] [k]
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQ = args.lift(1).map(_.toLong).getOrElse(128L)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.muteReviewedWindowWarning()
    graft.Tables.pin(spark)

    import graft.ops.Similarity
    val bf = Similarity.bruteKnn(spark, sfDir, nQ, k)
      .select("query_id", "neighbor_id")
      .cache()
    val nBf = bf.count()

    def recall(lane: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val hits = lane.select("query_id", "neighbor_id")
        .join(bf, Seq("query_id", "neighbor_id")).count()
      val p = hits.toDouble / nBf
      (p, 1.96 * math.sqrt(p * (1 - p) / nBf))
    }

    val lanes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "seed PQ (untrained, identity)" ->
        (() => Similarity.pqAdc(spark, sfDir, trained = false, nQ, k)),
      "trained PQ (sim07, identity)" ->
        (() => Similarity.pqAdc(spark, sfDir, trained = true, nQ, k)),
      "OPQ PQ (sim24, permuted)" ->
        (() => Similarity.pqAdcOver(spark,
          Similarity.opqPermuted(spark, sfDir), trained = true, nQ, k)),
      "IVF (sim04)" -> (() => Similarity.ivfAnn(spark, sfDir, nQ, k)),
      "LSH 1-probe (sim02)" -> (() => Similarity.lshAnn(spark, sfDir, 1, nQ, k)),
      s"LSH ${Similarity.LshMultiProbes}-probe (sim13)" ->
        (() => Similarity.lshAnn(spark, sfDir, Similarity.LshMultiProbes, nQ, k)),
      "IVF2 1-L1-probe (sim06)" -> (() => Similarity.ivf2Ann(spark, sfDir, 1, nQ, k)),
      s"IVF2 ${Similarity.Ivf2L1Probes}-L1-probe (sim13)" ->
        (() => Similarity.ivf2Ann(spark, sfDir, Similarity.Ivf2L1Probes, nQ, k)),
      // the candidate budget scales with k (catalog: 16 cands for
      // k=5) so the funnel's selectivity, not a too-small C, is
      // what the recall number measures
      s"Matryoshka ${Similarity.MatryoshkaPrefix}/${Similarity.Dims}-dim (sim27)" ->
        (() => Similarity.matryoshkaAnn(spark, sfDir, nQ, k,
          cand = math.max(Similarity.MatryoshkaCand, 3 * k))),
      // each lane asked for k candidates, fused top-k graded — the
      // does-fusion-beat-its-lanes question at power
      "RRF IVF+LSH4 (sim25)" ->
        (() => Similarity.rrfFused(spark, sfDir, nQ, k, laneK = k)))

    println(f"recall@$k over $sfDir — $nQ queries, n=$nBf ground-truth " +
      f"neighbors (M=${Similarity.PqM}, K=${Similarity.PqK}, " +
      f"${Similarity.PqTrainIters} Lloyd iters); ±95%% binomial " +
      "(approximate: hits correlate within a query)")
    lanes.foreach { case (name, mk) =>
      val (p, ci) = recall(mk())
      println(f"  $name%-34s $p%6.3f ± $ci%5.3f")
    }

    // per-subspace variance totals: identity layout = contiguous
    // 16-dim slices; OPQ layout = the snake-draft allocation
    val perm = Similarity.opqPermutation(spark, sfDir)
      .collect().map(r => r.getInt(1) -> r.getInt(0) / Similarity.PqSubDims).toMap
    val vars = Similarity.dimVariances(spark, sfDir)
    def balance(sub: Int => Int): Seq[Double] =
      vars.groupBy { case (d, _) => sub(d) }.toSeq.sortBy(_._1)
        .map(_._2.map(_._2).sum)
    val idBal = balance(d => d / Similarity.PqSubDims)
    val opqBal = balance(perm)
    println("  subspace variance totals (identity): " +
      idBal.map(v => f"$v%.4f").mkString(" "))
    println("  subspace variance totals (OPQ):      " +
      opqBal.map(v => f"$v%.4f").mkString(" "))
    println(f"  identity spread ${idBal.max - idBal.min}%.4f -> OPQ spread " +
      f"${opqBal.max - opqBal.min}%.4f")
    spark.stop()
  }
}
