package graft.ops

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.{SparkEntry, SparkSpec}

/** Concurrent-catalog safety (round-8 VERDICT item 8): `memoFrame`'s
  * TrieMap `getOrElseUpdate` could double-build under racing callers
  * (compute-then-putIfAbsent), silently re-running the CC loop and
  * leaking the loser's cached relation. The memo now serializes
  * builds behind a reentrant lock (`Dedup.memoLock`); this spec
  * proves the two properties that matter under a concurrent session:
  * results identical to serial execution, and each shared frame built
  * exactly as many times as the serial run builds it (no rebuilds).
  *
  * The query set is chosen to maximize memo contention: all of
  * dd07/ds07/cur05 re-derive the dd07 cluster map, g01/g02/g04 the
  * verified edge list, dd03/dd13 the minhash signature stage.
  */
class ConcurrencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("racing catalog queries agree with serial results and never rebuild a memo") {
    val names = Seq("dd07_dup_clusters", "ds07_leakage_safe_split",
      "cur05_keep_best", "g01_pagerank", "g02_bfs_hops", "dd03_lsh_pairs",
      "dd13_incremental_dedup", "g04_link_predict")

    def run(n: String): Seq[String] =
      SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq

    // serial baseline from a cold memo, counting how many frame
    // builds the workload inherently needs
    Relational.clearMemo(spark); Dedup.clearMemo(spark)
    val serialStart = Dedup.memoBuilds.get()
    val serial = names.map(n => n -> run(n)).toMap
    val serialBuilds = Dedup.memoBuilds.get() - serialStart

    // cold again, then race all queries on one session
    Relational.clearMemo(spark); Dedup.clearMemo(spark)
    val raceStart = Dedup.memoBuilds.get()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(names.size)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futs = names.map(n => Future(n -> run(n)))
      val raced = Await.result(Future.sequence(futs), Duration(600, "s")).toMap
      names.foreach { n =>
        assert(raced(n) == serial(n), s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
    val raceBuilds = Dedup.memoBuilds.get() - raceStart
    assert(raceBuilds == serialBuilds,
      s"racing session built $raceBuilds frames vs $serialBuilds serial — " +
        "a memo key was rebuilt under contention")
  }

  test("racing silver-derived queries never rebuild Relational's memo") {
    // Round-9 ADVICE: the Dedup memo was lock-guarded but
    // Relational.frameCache kept the bare getOrElseUpdate — racing
    // silver/enriched consumers could double-build and leak the
    // loser's cached relation. Same proof shape as above, against
    // Relational.memoBuilds.
    val names = Seq("a01_report", "a09_vehicle_agg", "w01_lag",
      "o01_sort", "o04_argmax", "m01_haversine", "d01_dedup",
      "p13_derived_filter")

    def run(n: String): Seq[String] =
      SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq

    Relational.clearMemo(spark)
    val serialStart = Relational.memoBuilds.get()
    val serial = names.map(n => n -> run(n)).toMap
    val serialBuilds = Relational.memoBuilds.get() - serialStart

    Relational.clearMemo(spark)
    val raceStart = Relational.memoBuilds.get()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(names.size)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futs = names.map(n => Future(n -> run(n)))
      val raced = Await.result(Future.sequence(futs), Duration(600, "s")).toMap
      names.foreach { n =>
        assert(raced(n) == serial(n), s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
    val raceBuilds = Relational.memoBuilds.get() - raceStart
    assert(raceBuilds == serialBuilds,
      s"racing session built $raceBuilds silver frames vs $serialBuilds " +
        "serial — a Relational memo key was rebuilt under contention")
  }
}
