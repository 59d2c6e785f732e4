package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall instrument for the trained coarse quantizer (round 12,
  * VERDICT r11 item 5): measures recall@K of the SEED-centroid IVF
  * (sim04 — first-K vectors as centroids, the index family's
  * oracle-parity lane) against the Lloyd-TRAINED quantizer (sim21),
  * both relative to the exact brute-force top-K (sim01) — the same
  * hit-rate shape as the sim11 catalog entry, applied to the
  * quantizer-training question: does bounded Lloyd training of the
  * coarse centroids buy recall at the same nprobe?
  *
  * Run: tools/run.sh graft.tools.IvfTrainProbe [sfDir]
  */
object IvfTrainProbe {
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
    val k = Similarity.LshK

    // exact brute-force top-k per query (sim01 emits KnnK rows; the
    // IVF lanes emit LshK — compare at the common K = LshK)
    val bf = Similarity.queries("sim01_knn")(spark, sfDir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id")
      .cache()
    val nBf = bf.count()

    def recall(name: String): Double = {
      val ann = Similarity.queries(name)(spark, sfDir)
        .select("query_id", "neighbor_id")
      ann.join(bf, Seq("query_id", "neighbor_id")).count().toDouble / nBf
    }

    val seed = recall("sim04_ivf_ann")
    val trained = recall("sim21_trained_ivf")
    println(f"ivf recall@$k over $sfDir (nprobe=${Similarity.IvfNProbe}, " +
      f"K=${Similarity.IvfCentroids} cells, ${Similarity.IvfTrainIters} Lloyd iters)")
    println(f"  seed-centroid IVF (sim04):   $seed%6.3f")
    println(f"  trained quantizer (sim21):   $trained%6.3f")
    println(f"  lift: ${trained - seed}%+6.3f")
    spark.stop()
  }
}
