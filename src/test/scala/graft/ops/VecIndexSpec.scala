package graft.ops

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

import graft.SparkSpec

/** The 100 TB ANN-serving proof: the IVF assignment persists as a
  * cluster-bucketed cell table, and the probe's read path contains no
  * corpus-wide re-scoring pass — the corpus is touched exactly once,
  * through the persisted table; every raw-embeddings scan left in the
  * plan is a bounded (vec_id < K, filter-pushed) centroid or query
  * frame. Decisions stay row-identical to sim04's derived-assignment
  * output (also pinned by the shared DuckDB oracle).
  */
class VecIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("persisted IVF probe equals sim04 and never re-scores the corpus") {
    val prefix = VecIndex.ensurePersisted(spark, sf)
    assert(VecIndex.ensurePersisted(spark, sf) == prefix,
      "second call must reuse the persisted index")

    val viaIndex = VecIndex.probe(spark, sf, prefix)
    val derived = Similarity.queries("sim04_ivf_ann")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(viaIndex.collect().map(_.toString).toSeq == derived,
      "persisted-index decisions diverge from sim04")

    // plan property — AQE off for a traversable tree. Set AFTER frame
    // construction (Tables.pin re-enables AQE on every table load);
    // the physical plan reads the conf at executedPlan time.
    val probeFrame = VecIndex.probe(spark, sf, prefix)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = probeFrame.queryExecution.executedPlan
      val scans = plan.collect { case s: FileSourceScanExec => s }
      val (cellScans, rawScans) = scans.partition(
        _.relation.location.rootPaths.exists(_.toString.contains("graft-bandidx-vecsim14")))
      // the corpus moves through the probe EXACTLY once — one scan of
      // the persisted cell table, zero assignment recompute
      assert(cellScans.size == 1,
        s"expected exactly one persisted-cell scan:\n$plan")
      // every remaining embeddings scan is a bounded frame with its
      // vec_id bound PUSHED to parquet (centroids ×2, query batch)
      assert(rawScans.nonEmpty, s"probe lost its query/centroid scans:\n$plan")
      rawScans.foreach { s =>
        val pushed = s.metadata.getOrElse("PushedFilters", "")
        assert(pushed.contains("LessThan(vec_id"),
          s"unbounded raw-embeddings scan in the probe plan:\n$s")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
