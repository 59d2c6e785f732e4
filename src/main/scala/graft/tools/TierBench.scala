package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two round-17 maintenance-scale claims (VERDICT r16
  * item 2) on the big replicas:
  *
  *   1. **Bucket width**: the fixed `Buckets = 8` capped compaction
  *      at 8-way parallelism regardless of host width. Identical
  *      three-append lexical fixtures are compacted at 8 vs 64
  *      buckets; on a 32-thread host the 64-bucket rewrite should
  *      approach the core count's speedup, and at cluster scale the
  *      knob is the difference between 8 tasks and
  *      executors×cores tasks over the same bytes.
  *   2. **Size-tiered merge**: the bounded fold ([[graft.ops.LexIndex.tieredMerge]])
  *      vs the corpus-sized [[graft.ops.LexIndex.mergeReindex]] on the
  *      same fixture — tiered maintenance I/O is ∝ arrivals, the full
  *      rewrite ∝ corpus, so the gap must WIDEN with replica scale.
  *      Serving equality across the two verbs is asserted in-run
  *      (segmentProbe after the fold == impactProbe after the full
  *      rewrite).
  *
  * Protocol: MergeBench's round-17 discipline — discarded warmup
  * cycle, alternating arm order, min-of-N per arm.
  *
  * Run: tools/run.sh graft.tools.TierBench [sfDir] [reps]
  */
object TierBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-scale-x100")
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(2)
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
    def fixture(tag: String, buckets: Int): (String, String) = {
      val prefix = s"graft_tb_${tag}_${System.nanoTime()}"
      val path = java.nio.file.Files.createTempDirectory(s"graft-tb$tag").toString
      LexIndex.persist(spark, sfDir, path, prefix,
        Some(docs.filter(!isNewDense)), buckets = buckets)
      Seq(0, 4, 8).foreach { r =>
        LexIndex.append(spark, sfDir,
          docs.filter(pmod(col("doc_id"), lit(12)) === lit(r)), prefix,
          batch = r.toLong)
      }
      (prefix, path)
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def run(tag: String, buckets: Int)(verb: String => Unit): Double = {
      val (p, path) = fixture(tag, buckets)
      val t = time(verb(p))
      LexIndex.drop(spark, p); deleteDir(path)
      t
    }

    // ---- 1. compact wall at 8 vs 64 buckets -------------------------
    run("w8", 8)(p => LexIndex.compact(spark, p)) // warmup, discarded
    run("w64", 64)(p => LexIndex.compact(spark, p))
    val c8 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val c64 = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until reps).foreach { i =>
      if (i % 2 == 0) {
        c8 += run("c8", 8)(p => LexIndex.compact(spark, p))
        c64 += run("c64", 64)(p => LexIndex.compact(spark, p))
      } else {
        c64 += run("c64", 64)(p => LexIndex.compact(spark, p))
        c8 += run("c8", 8)(p => LexIndex.compact(spark, p))
      }
    }
    println(f"compact wall over $sfDir (3-append fixture, min of $reps, alternating):")
    println(f"  buckets=8  : ${c8.min}%7.2f s  ${c8.map(t => f"$t%.2f").mkString("[", " ", "]")}")
    println(f"  buckets=64 : ${c64.min}%7.2f s  ${c64.map(t => f"$t%.2f").mkString("[", " ", "]")} (${c8.min / c64.min}%.2fx)")

    // ---- 2. tiered fold vs full merge-reindex ------------------------
    // equality first (once): the fold then segment-serve must answer
    // exactly what the full rewrite then capped-serve answers
    locally {
      val (pt, patht) = fixture("eqT", 64)
      if (!LexIndex.tieredMerge(spark, pt)) sys.error("tiered fold did not run")
      val tiered = LexIndex.segmentProbe(spark, sfDir, pt).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSeq
      LexIndex.drop(spark, pt); deleteDir(patht)
      val (pm, pathm) = fixture("eqM", 64)
      LexIndex.mergeReindex(spark, pm)
      val merged = LexIndex.impactProbe(spark, sfDir, pm).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSeq
      LexIndex.drop(spark, pm); deleteDir(pathm)
      if (tiered != merged)
        sys.error(s"tiered fold serving diverged from the full rewrite at $sfDir")
      println(s"serving equality: tiered fold == full rewrite (${tiered.size} rows) OK")
    }
    run("wT", 64)(p => { LexIndex.tieredMerge(spark, p); () }) // warmups
    run("wM", 64)(p => LexIndex.mergeReindex(spark, p))
    val tT = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tM = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until reps).foreach { i =>
      if (i % 2 == 0) {
        tT += run("tT", 64)(p => { LexIndex.tieredMerge(spark, p); () })
        tM += run("tM", 64)(p => LexIndex.mergeReindex(spark, p))
      } else {
        tM += run("tM", 64)(p => LexIndex.mergeReindex(spark, p))
        tT += run("tT", 64)(p => { LexIndex.tieredMerge(spark, p); () })
      }
    }
    println(f"maintenance wall over $sfDir (same 3-append fixture, min of $reps, alternating):")
    println(f"  tieredMerge (bounded fold) : ${tT.min}%7.2f s  ${tT.map(t => f"$t%.2f").mkString("[", " ", "]")}")
    println(f"  mergeReindex (full rewrite): ${tM.min}%7.2f s  ${tM.map(t => f"$t%.2f").mkString("[", " ", "]")} (fold is ${tM.min / tT.min}%.2fx cheaper)")
    spark.stop()
  }
}
