package graft.tools

import org.apache.spark.sql.SparkSession

/** Deep-iteration PageRank cost curve (round-8 verdict item): times
  * `Dedup.pageRank` at increasing iteration counts, with and without
  * the per-5-rounds localCheckpoint cadence, on the 10× stacked
  * fixture (falls back to sf0.1 if ScaleStress hasn't built it).
  * Evidence that iteration count can grow past g01's constant 5
  * without lineage blowup — run: tools/run.sh graft.tools.PrDeep
  */
object PrDeep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale-x10")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.pin(spark)

    // build just the 10× documents replica if ScaleStress hasn't
    // (same offset-key replication scheme, ScaleStress.replicate)
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      import org.apache.spark.sql.functions._
      val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      base.crossJoin(spark.range(10).select(col("id").as("__copy")))
        .withColumn("doc_id", col("doc_id") + col("__copy") * 10000000L)
        .drop("__copy")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    def time1(iters: Int, every: Int): Double = {
      val t0 = System.nanoTime()
      graft.ops.Dedup.pageRank(spark, dir, iters, every).count()
      (System.nanoTime() - t0) / 1e9
    }
    // min-of-2 (the bench protocol): single runs of deep iterative
    // plans carry GC/JIT one-offs bigger than the signal. The gc()
    // settle between runs matters here more than elsewhere: without
    // it, block-manager churn from the preceding run's checkpoints
    // reads as a fake superlinear iteration curve (first protocol's
    // lesson — ascending iteration order conflated warmup and
    // accumulation with depth).
    def time(iters: Int, every: Int): Double = {
      System.gc()
      val a = time1(iters, every)
      System.gc()
      math.min(a, time1(iters, every))
    }
    // warm: builds + caches the shared edges/deg memo frames so every
    // timed run measures the iterations, not the LSH pipeline
    time1(1, Int.MaxValue)
    time1(20, 5) // JIT the checkpoint path too

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val iterCounts = Seq(5, 10, 15, 20)
    val ck = iterCounts.map(n => n -> time(n, 5))
    val lazyRuns = iterCounts.map(n => n -> time(n, Int.MaxValue))
    println(s"""{"fixture":"$dir","checkpoint_every_5":{${
      ck.map { case (n, t) => s""""$n":${fmt(t)}""" }.mkString(",")
    }},"lazy_chain":{${
      lazyRuns.map { case (n, t) => s""""$n":${fmt(t)}""" }.mkString(",")
    }}}""")
    spark.stop()
  }
}
