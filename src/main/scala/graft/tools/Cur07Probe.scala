package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profile of cur07's warm path (round-10 VERDICT
  * item 4): times the catalog entry repeatedly in one session so the
  * memoized `scored` frame's amortized regime — what the bench's
  * min-of-2 reports — is visible, then times the post-memo stages
  * alone. Usage: tools/run.sh graft.tools.Cur07Probe [sfDir]
  */
object Cur07Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.muteReviewedWindowWarning()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries("cur07_perplexity_filter")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
