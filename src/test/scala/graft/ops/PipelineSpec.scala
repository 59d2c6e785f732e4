package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.Portable

/** pipe01 — the composed batch curation pipeline. The DuckDB oracle
  * proves value equality end-to-end (recursive CC included); these
  * tests pin the pipeline's STRUCTURAL contract: the stage labels
  * partition the corpus, each stage actually fires at its scale, the
  * holdout matches dd10's eval rule, and — the property the whole
  * pipeline exists for — the surviving set contains no verified
  * near-dup pair and no exact-duplicate text.
  */
class PipelineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val sfL = "/root/testdata/sf0.1"

  private lazy val audit = Pipeline.queries("pipe01_curation_audit")(spark, sf).cache()

  test("stage labels partition the corpus: every doc labeled exactly once") {
    val docs = Tables.documents(spark, sf)
    assert(audit.count() == docs.count())
    assert(audit.select("doc_id").distinct().count() == docs.count())
    val stages = audit.select("stage").distinct().collect().map(_.getString(0)).toSet
    val legal = Set("eval", "quality", "langid", "exact_dup", "near_dup", "contaminated", "kept")
    assert(stages.subsetOf(legal), s"unexpected stage labels: ${stages -- legal}")
  }

  test("each stage fires at sf0.001 (exact_dup needs sf0.1 — no byte-identical texts below)") {
    val counts = audit.groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("eval", "quality", "langid", "near_dup", "contaminated", "kept").foreach { s =>
      assert(counts.getOrElse(s, 0L) > 0, s"stage '$s' never fired: $counts")
    }
    // a pipeline that drops most of the corpus is a misconfigured gate
    assert(counts("kept") > counts.values.sum / 2, s"kept is not the majority: $counts")
  }

  test("eval holdout is dd10's externally-defined rule, independent of curation") {
    val expected = Tables.documents(spark, sf)
      .filter(expr(s"${Portable.phashExpr("concat('ev:', CAST(doc_id AS STRING))")} % ${Dedup.EvalMod} = 0"))
      .select("doc_id")
    val got = audit.filter(col("stage") === "eval").select("doc_id")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("the surviving set contains no verified near-dup pair") {
    val survivors = audit.filter(col("stage").isin("kept", "contaminated")).select("doc_id")
    val pairs = Dedup.verifiedPairs(spark, sf)
      .join(survivors.toDF("doc_a"), "doc_a")
      .join(survivors.toDF("doc_b"), "doc_b")
    assert(pairs.count() == 0, "two stage-5 survivors are verified near-dups of each other")
  }

  test("pipe02: the manifest accounts for exactly the kept set, round-robin balanced") {
    val manifest = Pipeline.queries("pipe02_shard_manifest")(spark, sf).cache()
    val kept = audit.filter(col("stage") === "kept")
    assert(manifest.agg(sum("n_docs")).head.getLong(0) == kept.count())
    // snake-draft round-robin: total docs per shard differ by at most 1
    val perShard = manifest.groupBy("shard").agg(sum("n_docs").as("docs"))
      .select("docs").collect().map(_.getLong(0))
    assert(perShard.length == Curation.ShardCount)
    assert(perShard.max - perShard.min <= 1, s"unbalanced shards: ${perShard.toSeq}")
    // token totals reconcile with the kept docs' own token counts
    val keptTokens = Tables.documents(spark, sf)
      .join(kept.select("doc_id"), "doc_id")
      .agg(sum(expr(s"CAST(size(${TextAnalysis.tokensExpr}) AS BIGINT)"))).head.getLong(0)
    assert(manifest.agg(sum("n_tokens")).head.getLong(0) == keptTokens)
    manifest.unpersist()
  }

  test("pipe03: every arrival surfaces; only non-monotone stages ever flip for old docs") {
    val delta = Pipeline.queries("pipe03_audit_delta")(spark, sf).cache()
    val rows = delta.collect()
    assert(rows.nonEmpty, "empty delta — the ingest batch changed nothing, vacuous fixture")
    // every ingest-batch doc appears with stage_old NULL
    val arrivals = Tables.documents(spark, sf)
      .filter(col("source") === Dedup.IncBatchSrc).count()
    assert(rows.count(_.isNullAt(1)) == arrivals,
      s"expected $arrivals stage_old=NULL arrival rows")
    // quality/langid/eval are row-local: an existing doc can never
    // flip into or out of them — all real flips are the non-monotone
    // stages (canonical steal, component merge, holdout growth)
    val nonMono = Set("exact_dup", "near_dup", "contaminated", "kept")
    rows.filterNot(_.isNullAt(1)).foreach { r =>
      assert(nonMono(r.getString(1)) && nonMono(r.getString(2)),
        s"row-local stage flipped for an existing doc: $r")
    }
    // stage_new agrees with pipe01's audit row for row
    val mismatch = delta.select(col("doc_id"), col("stage_new"))
      .join(audit, "doc_id")
      .filter(col("stage_new") =!= col("stage"))
    assert(mismatch.count() == 0, "delta's stage_new diverges from pipe01")
    delta.unpersist()
  }

  test("sf0.1: exact_dup fires, and each text-digest group keeps exactly one canonical") {
    val auditL = Pipeline.queries("pipe01_curation_audit")(spark, sfL).cache()
    val counts = auditL.groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("exact_dup", 0L) > 0, s"exact_dup never fired at sf0.1: $counts")
    // among docs that reached the exact-dedup stage (everything not
    // dropped earlier), each md5(text) group has exactly one member
    // NOT labeled exact_dup — the canonical survivor
    val staged = Tables.documents(spark, sfL).select(col("doc_id"), md5(col("text")).as("th"))
      .join(auditL, "doc_id")
      .filter(!col("stage").isin("eval", "quality", "langid"))
    val bad = staged.groupBy("th")
      .agg(sum(when(col("stage") =!= "exact_dup", 1L).otherwise(0L)).as("canonicals"))
      .filter(col("canonicals") =!= 1L)
    assert(bad.count() == 0, "a text-digest group kept zero or multiple canonicals")
    auditL.unpersist()
  }
}
