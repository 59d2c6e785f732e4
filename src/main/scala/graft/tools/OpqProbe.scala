package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall instrument for the OPQ-lite rotation (round 13, VERDICT
  * r12 item 6): measures recall@KnnK of three ADC lanes against the
  * exact brute-force top-K (sim01) —
  *
  *   - seed PQ: untrained first-PqK codebook, identity layout
  *   - trained PQ (sim07): Lloyd codebooks, identity layout
  *   - OPQ PQ (sim24): Lloyd codebooks over the variance-balanced
  *     permuted basis
  *
  * plus the quantity the rotation actually optimizes: the per-
  * subspace variance totals before and after the permutation (a
  * balanced allocation is the OPQ objective's eigenvalue-allocation
  * proxy). Same hit-rate shape as IvfTrainProbe; results land in
  * SCALE_NOTES (honest negative documented if the synthetic corpus
  * shows no lift, the sim21 precedent).
  *
  * Run: tools/run.sh graft.tools.OpqProbe [sfDir]
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    val bf = Similarity.queries("sim01_knn")(spark, sfDir)
      .select("query_id", "neighbor_id")
      .cache()
    val nBf = bf.count()

    def recall(adc: org.apache.spark.sql.DataFrame): Double =
      adc.select("query_id", "neighbor_id")
        .join(bf, Seq("query_id", "neighbor_id")).count().toDouble / nBf

    val seed = recall(Similarity.pqAdc(spark, sfDir, trained = false))
    val trained = recall(Similarity.queries("sim07_pq_adc")(spark, sfDir))
    val opq = recall(Similarity.queries("sim24_opq_adc")(spark, sfDir))

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

    println(f"pq recall@${Similarity.KnnK} over $sfDir " +
      f"(M=${Similarity.PqM}, K=${Similarity.PqK}, " +
      f"${Similarity.PqTrainIters} Lloyd iters)")
    println(f"  seed PQ (untrained, identity):  $seed%6.3f")
    println(f"  trained PQ (sim07, identity):   $trained%6.3f")
    println(f"  OPQ PQ (sim24, permuted):       $opq%6.3f")
    println(f"  lift vs sim07: ${opq - trained}%+6.3f")
    println("  subspace variance totals (identity): " +
      idBal.map(v => f"$v%.4f").mkString(" "))
    println("  subspace variance totals (OPQ):      " +
      opqBal.map(v => f"$v%.4f").mkString(" "))
    spark.stop()
  }
}
