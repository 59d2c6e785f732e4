package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.Portable

/** Invariants for this round's new operators (exact result parity is
  * the DuckDB oracle's job — these guard semantics standalone). */
class Round5OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- dd10 benchmark decontamination -------------------------------

  test("dd10: flags are train-only, ratio-bounded, and above both thresholds") {
    val rows = q("dd10_decontaminate").collect()
    assert(rows.nonEmpty)
    val evalIds = Tables.documents(spark, sf)
      .filter(expr(s"${Portable.phashExpr("concat('ev:', CAST(doc_id AS STRING))")} % ${Dedup.EvalMod} = 0"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val (id, nHit, nSh) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit"), r.getAs[Long]("n_sh"))
      assert(!evalIds.contains(id), s"eval doc $id flagged as contaminated train doc")
      assert(nHit >= Dedup.DecontamMinOverlap && nHit <= nSh)
      val c = r.getAs[Double]("contamination")
      assert(c >= Dedup.DecontamMinRatio - 1e-9 && c <= 1.0)
    }
  }

  test("dd10: n_hit matches a direct per-doc intersect against the eval shingle union") {
    val flagged = q("dd10_decontaminate").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(flagged.nonEmpty)
    val shs = Tables.documents(spark, sf)
      .withColumn("tokens", expr(TextAnalysis.tokensExpr))
      .withColumn("shingles", expr(TextAnalysis.shinglesExpr))
      .select(col("doc_id"),
        expr(s"array_distinct(transform(shingles, s -> ${Portable.phashExpr("s")}))").as("shs"),
        expr(s"${Portable.phashExpr("concat('ev:', CAST(doc_id AS STRING))")} % ${Dedup.EvalMod} = 0").as("is_eval"))
      .collect()
    val evalUnion = shs.filter(_.getAs[Boolean]("is_eval"))
      .flatMap(_.getAs[scala.collection.Seq[Long]]("shs")).toSet
    val direct = shs.filterNot(_.getAs[Boolean]("is_eval")).map { r =>
      r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Long]]("shs").count(evalUnion.contains).toLong
    }.toMap
    flagged.foreach { case (id, nHit) =>
      assert(direct(id) === nHit, s"doc $id: catalog n_hit $nHit != direct ${direct(id)}")
    }
    // and nothing above both thresholds was missed
    direct.foreach { case (id, hits) =>
      val nSh = shs.find(r => r.getAs[Long]("doc_id") == id).get.getAs[scala.collection.Seq[Long]]("shs").size
      if (hits >= Dedup.DecontamMinOverlap &&
          hits.toDouble / nSh >= Dedup.DecontamMinRatio)
        assert(flagged.contains(id), s"doc $id over threshold but not flagged")
    }
  }
}
