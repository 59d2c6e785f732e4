package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

import graft.ops.{BandIndex, Dedup}

/** Day-N maintenance cost curve for the persisted band index
  * (round-9 VERDICT item 1): each append lays down a new file set per
  * bucket, so the probe's per-bucket sort-merge widens with the
  * append history; `BandIndex.compact` rewrites every bucket back to
  * one file. This tool measures the probe on the same index in three
  * states — fresh, after N appends, after compaction — and reports
  * the file counts alongside, so SCALE_NOTES can carry the
  * flat-after-compaction row with numbers.
  *
  * The appended content is the novel batch split into N disjoint
  * day-slices (pmod(hash(doc_id), N) — hash, not raw id: the
  * fixture's novel ids are residue-concentrated, and raw-mod slicing
  * left 9 of 10 slices empty) — the same union as dd16's single
  * append, arriving as N file generations, which is the growth
  * regime compaction exists for.
  *
  * Usage: tools/run.sh graft.tools.CompactBench [sfDir] [nAppends]
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nAppends = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.muteReviewedWindowWarning()

    val path = java.nio.file.Files.createTempDirectory("graft-compactbench").toString
    val prefix = s"graft_compactbench_${Integer.toHexString(sfDir.hashCode)}"

    def timeProbe(reps: Int = 3): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        BandIndex.probe(spark, sfDir, prefix).count()
        (System.nanoTime() - t0) / 1e9
      }.min

    def files(): (Int, Int) = (
      graft.ops.IndexCore.tableFiles(spark, BandIndex.bandsTable(prefix)).size,
      graft.ops.IndexCore.tableFiles(spark, BandIndex.sigsTable(prefix)).size)

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    try {
      BandIndex.persist(spark, sfDir, path, prefix)
      val (bf0, sf0) = files()
      timeProbe(1) // JVM/codegen warmup — not measured
      val tFresh = timeProbe()

      val novel = BandIndex.probe(spark, sfDir, prefix)
        .filter(col("dup_of").isNull)
        .select(col("batch_doc").as("doc_id"))
        .cache()
      novel.count()
      (0 until nAppends).foreach { i =>
        BandIndex.append(spark, sfDir,
          novel.filter(pmod(hash(col("doc_id")), lit(nAppends)) === lit(i)), prefix)
      }
      novel.unpersist()
      val (bfA, sfA) = files()
      val tAppended = timeProbe()

      val t0 = System.nanoTime()
      BandIndex.compact(spark, prefix)
      val tCompact = (System.nanoTime() - t0) / 1e9
      val (bfC, sfC) = files()
      val tCompacted = timeProbe()

      println(s"""{"metric":"bandindex_probe_sec","sf":"$sfDir","appends":$nAppends,""" +
        s""""probe_fresh":${fmt(tFresh)},"probe_after_appends":${fmt(tAppended)},""" +
        s""""probe_after_compact":${fmt(tCompacted)},"compact_sec":${fmt(tCompact)},""" +
        s""""files_bands":[$bf0,$bfA,$bfC],"files_sigs":[$sf0,$sfA,$sfC]}""")
    } finally {
      BandIndex.drop(spark, prefix)
      Dedup.clearMemo(spark)
      // best-effort cleanup of the external files
      try {
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      } catch { case _: Throwable => () }
      spark.stop()
    }
  }
}
