package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the tx24 claim: the fused merge+reindex pass
  * ([[graft.ops.LexIndex.mergeReindex]]) vs the sequential
  * compact-then-reindexImpact it replaces, on IDENTICAL two-segment
  * index states (dense 3/4 base + appended quarter + one pending
  * tombstone). Both end in the same logical state — the comparison
  * is maintenance wall only; serving equality is Round16OpsSpec's
  * job.
  *
  * Protocol (round-17 ADVICE — the old min-of-1 fixed-order run let
  * cold-JVM JIT and page-cache effects systematically favor the arm
  * measured second): one DISCARDED warmup cycle per arm, then
  * `reps` timed repetitions with the arm order ALTERNATING between
  * repetitions, min-of-N per arm. Each arm rebuilds its own fixture,
  * so fixture cost is excluded from the timed window.
  *
  * Run: tools/run.sh graft.tools.MergeBench [sfDir] [reps]
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

    def runSeq(): Double = {
      val (p, path) = fixture("seq")
      val t = time {
        LexIndex.compact(spark, p)
        LexIndex.reindexImpact(spark, p)
      }
      LexIndex.drop(spark, p); deleteDir(path)
      t
    }
    def runFused(): Double = {
      val (p, path) = fixture("fused")
      val t = time { LexIndex.mergeReindex(spark, p) }
      LexIndex.drop(spark, p); deleteDir(path)
      t
    }

    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    // discarded warmup cycle per arm: JIT tiers, parquet reader and
    // page cache warm up on throwaway fixtures, not arm A's timings
    runSeq(); runFused()
    val seqTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val fusedTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until reps).foreach { i =>
      // alternate arm order so neither arm always pays (or inherits)
      // whatever state the previous repetition left behind
      if (i % 2 == 0) { seqTimes += runSeq(); fusedTimes += runFused() }
      else { fusedTimes += runFused(); seqTimes += runSeq() }
    }
    val tSeq = seqTimes.min
    val tFused = fusedTimes.min

    println(f"maintenance wall over $sfDir (identical two-segment+tombstone states):")
    println(f"  reps=$reps (alternating order, warmup discarded), min per arm")
    println(f"  compact + reindexImpact : $tSeq%7.2f s  ${seqTimes.map(t => f"$t%.2f").mkString("[", " ", "]")}")
    println(f"  mergeReindex (fused)    : $tFused%7.2f s  ${fusedTimes.map(t => f"$t%.2f").mkString("[", " ", "]")} (${tSeq / tFused}%.2fx)")
    spark.stop()
  }
}
