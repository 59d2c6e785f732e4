package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the tx24 claim: the fused merge+reindex pass
  * ([[graft.ops.LexIndex.mergeReindex]]) vs the sequential
  * compact-then-reindexImpact it replaces, on IDENTICAL two-segment
  * index states (dense 3/4 base + appended quarter + one pending
  * tombstone). Both end in the same logical state — the comparison
  * is maintenance wall only; serving equality is Round16OpsSpec's
  * job. min-of-1 per arm (each arm rebuilds its own fixture, so the
  * fixture cost is printed separately and excluded).
  *
  * Run: tools/run.sh graft.tools.MergeBench [sfDir]
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.muteReviewedWindowWarning()
    graft.Tables.pin(spark)
    import graft.ops.LexIndex

    val docs = graft.Tables.documents(spark, sfDir)
    val isNewDense = pmod(col("doc_id"), lit(4)) === lit(0)

    def deleteDir(p: String): Unit = {
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rec)); f.delete(); ()
      }
      rec(new java.io.File(p))
    }
    def fixture(tag: String): (String, String) = {
      val prefix = s"graft_mb_${tag}_${System.nanoTime()}"
      val path = java.nio.file.Files.createTempDirectory(s"graft-mb$tag").toString
      LexIndex.persist(spark, sfDir, path, prefix,
        Some(docs.filter(!isNewDense)))
      LexIndex.append(spark, sfDir, docs.filter(isNewDense), prefix, batch = 1L)
      val victim = LexIndex.segmentProbe(spark, sfDir, prefix)
        .filter(col("query_id") === 0 && col("rk") === 1).select("doc_id")
      LexIndex.retire(spark, prefix, victim)
      (prefix, path)
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // arm A: the sequential pair the fused pass replaces
    val (pa, patha) = fixture("seq")
    val tSeq = time {
      LexIndex.compact(spark, pa)
      LexIndex.reindexImpact(spark, pa)
    }
    LexIndex.drop(spark, pa); deleteDir(patha)

    // arm B: the fused pass
    val (pb, pathb) = fixture("fused")
    val tFused = time { LexIndex.mergeReindex(spark, pb) }
    LexIndex.drop(spark, pb); deleteDir(pathb)

    println(f"maintenance wall over $sfDir (identical two-segment+tombstone states):")
    println(f"  compact + reindexImpact : $tSeq%7.2f s")
    println(f"  mergeReindex (fused)    : $tFused%7.2f s  (${tSeq / tFused}%.2fx)")
    spark.stop()
  }
}
