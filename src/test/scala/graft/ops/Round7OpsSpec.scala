package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Invariants for the round-5 closing operators (exact result parity
  * is the DuckDB oracle's job — these guard semantics standalone). */
class Round7OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- dd13 incremental (batch-vs-corpus) dedup ---------------------

  test("dd13: one decision row per batch doc, matches point only into the corpus") {
    val rows = q("dd13_incremental_dedup").collect()
    val batchIds = Tables.documents(spark, sf)
      .filter(col("source") === Dedup.IncBatchSrc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val corpusIds = Tables.documents(spark, sf)
      .filter(col("source") =!= Dedup.IncBatchSrc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("batch_doc")).toSet == batchIds)
    assert(rows.length == batchIds.size, "left join must not fan out")
    rows.filter(!_.isNullAt(1)).foreach { r =>
      assert(corpusIds.contains(r.getAs[Long]("dup_of")),
        s"batch doc ${r.getLong(0)} matched a non-corpus doc ${r.getLong(1)}")
      assert(r.getAs[Double]("est_jaccard") >= 0.5)
    }
  }

  test("dd13: matched pairs are exactly dd03's verified pairs that cross the batch boundary") {
    val batchIds = Tables.documents(spark, sf)
      .filter(col("source") === Dedup.IncBatchSrc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // dd03 orients doc_a < doc_b over the whole corpus; reorient the
    // crossing subset to (batch, corpus)
    val crossing = q("dd03_lsh_pairs").collect().flatMap { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      if (batchIds.contains(a) != batchIds.contains(b))
        Some(if (batchIds.contains(a)) (a, b) else (b, a))
      else None
    }.toSet
    val decided = q("dd13_incremental_dedup").collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getAs[Long]("batch_doc"), r.getAs[Long]("dup_of"))).toSet
    // dd13 keeps only the best match per batch doc — its pairs are a
    // subset, and every decided batch doc must appear in the crossing
    // set with that same best partner admissible
    assert(decided.subsetOf(crossing),
      s"dd13 invented pairs: ${decided.diff(crossing)}")
    val decidedDocs = decided.map(_._1)
    val crossingDocs = crossing.map(_._1)
    assert(decidedDocs == crossingDocs,
      "every batch doc with ≥1 crossing verified pair must receive a dup_of decision")
  }
}
