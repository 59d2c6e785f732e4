package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** The 100 TB ingest-path proof for incremental dedup: the corpus
  * band index and signature table persisted as bucketed parquet, and
  * the per-batch probe plan shown to contain NO shuffle exchange above
  * either corpus scan — the batch shuffles itself into the corpus
  * layout, never the reverse. Decisions stay row-identical to dd13's
  * derived-frame output.
  */
class BandIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Scans under `p` that read the persisted index (identified by the
    * external path — bucketed-or-not is proven by the exchange check,
    * not assumed from metadata). */
  private def indexScans(p: SparkPlan, path: String): Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(path)) => s
    }

  test("persisted probe plans with no exchange above the corpus scans") {
    val path = Files.createTempDirectory("graft-bandidx").toString
    // Force the SMJ path: broadcasting the (tiny, test-sized) batch
    // side would make the no-exchange property trivially true without
    // exercising the bucketed layout.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BandIndex.persist(spark, sf, path)

      val probe = BandIndex.probe(spark, sf)
      // AQE off for a traversable plan tree (collect() does not
      // descend into AdaptiveSparkPlan/query stages). Set AFTER frame
      // construction: Tables.pin re-enables AQE on every table load,
      // but the physical plan reads the conf at executedPlan time.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = probe.queryExecution.executedPlan
      assert(!plan.toString.contains("AdaptiveSparkPlan"), plan.toString.take(200))

      // both persisted tables are actually read, as BUCKETED scans
      // (a layout the planner declines is stamped "Bucketed: false")
      val corpusScans = indexScans(plan, path)
      assert(corpusScans.size == 2, s"expected 2 index scans:\n$plan")
      corpusScans.foreach { s =>
        assert(s.bucketedScan, s"planner declined the bucket layout:\n$s")
      }

      // THE property: the corpus is never re-shuffled — on the path
      // from each corpus scan up to the join that consumes it there
      // is no exchange (the batch side, by contrast, must shuffle
      // itself into the corpus bucket layout somewhere)
      def pathsToIndexScans(p: SparkPlan,
          above: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
        case s: FileSourceScanExec if indexScans(s, path).nonEmpty => Seq(above)
        case _ => p.children.flatMap(c => pathsToIndexScans(c, p :: above))
      }
      val paths = pathsToIndexScans(plan, Nil)
      assert(paths.size == 2, plan.toString)
      paths.foreach { above =>
        // `above` runs nearest-parent→root; the prefix before the
        // first join node is the scan-to-join segment
        val belowJoin = above.takeWhile(n =>
          !n.nodeName.toLowerCase.contains("join"))
        assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"corpus-side exchange below its join:\n$plan")
      }
      assert(plan.collect { case e: ShuffleExchangeExec => e }.nonEmpty)

      // and the decisions match the derived-frame dd13 exactly
      val viaIndex = probe.collect().map(_.toString)
      val derived = Dedup.queries("dd13_incremental_dedup")(spark, sf)
        .collect().map(_.toString)
      assert(viaIndex.toSeq == derived.toSeq)
    } finally {
      BandIndex.drop(spark)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("dd15 persists the index once per (session, dir) and probes it") {
    val p1 = BandIndex.ensurePersisted(spark, sf)
    val p2 = BandIndex.ensurePersisted(spark, sf)
    assert(p1 == p2, "second call must reuse the persisted index")
    val viaEntry = graft.SparkEntry.queries("dd15_bucketed_probe")(spark, sf)
      .collect().map(_.toString).toSeq
    val derived = Dedup.queries("dd13_incremental_dedup")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(viaEntry == derived)
  }
}
