package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-join salting: the manual remedy for hot keys that overwhelm a
  * single reducer (complementing AQE's runtime skew-split, which only
  * kicks in above its partition-size thresholds).
  *
  * The skewed (large) side gets a uniform random-ish salt in
  * [0, buckets); the small side is exploded ×buckets so every salted
  * key finds its match. The join key becomes (key, salt) — the hot
  * key's rows spread over `buckets` reducers. Semantics are identical
  * to the unsalted inner join (proved in SaltingSpec).
  *
  * The salt is derived from a hash of stable row content rather than
  * rand() so plans stay deterministic and retriable — at 100 TB a
  * nondeterministic salt breaks task retry idempotence.
  */
object Salting {

  /** Inner equi-join `large ⋈ small` on `key`, salted to `buckets`. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltSource: String): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Split-join: salt ONLY the known hot keys. Blanket salting
    * replicates the ENTIRE right side ×buckets — measured 6-9× worse
    * than doing nothing on a fact-sized right side (tools/SkewBench,
    * SCALE_NOTES) — while the split form replicates just the hot
    * keys' right rows (|hotKeys| × buckets extra rows total) and
    * leaves the cold majority on the plain equi-join path. Hot keys
    * come from the caller (a prior count or a heavy-hitter sketch);
    * semantics equal the plain inner join (SaltingSpec).
    */
  def skewSplitJoin(large: DataFrame, small: DataFrame, key: String,
      hotKeys: Seq[Long], buckets: Int, saltSource: String): DataFrame = {
    val hot = saltedInnerJoin(
      large.filter(col(key).isin(hotKeys: _*)),
      small.filter(col(key).isin(hotKeys: _*)),
      key, buckets, saltSource)
    val cold = large.filter(!col(key).isin(hotKeys: _*))
      .join(small.filter(!col(key).isin(hotKeys: _*)), Seq(key))
    hot.select(cold.columns.map(col): _*).unionAll(cold)
  }

  /** [[skewSplitJoin]] with the hot-key set supplied IN-PLAN as a
    * (bounded) single-column frame instead of a driver-side Seq — the
    * composition target for a sketch-driven detector (j14: a
    * Misra-Gries pass produces ≤ k candidates, provably a superset of
    * every key above the n/(k+1) threshold, and feeds them here
    * without any collect). The hot set broadcasts as a membership
    * marker onto both sides; marked rows take the salted path, the
    * cold majority the plain equi-join. A FALSE POSITIVE in `hotKeys`
    * only costs `buckets` replicas of that key's small-side rows —
    * semantics are unchanged for any hot set (SaltingSpec), which is
    * what makes sketch candidates (not exact counts) safe to wire in.
    */
  def skewSplitJoinByFrame(large: DataFrame, small: DataFrame, key: String,
      hotKeys: DataFrame, buckets: Int, saltSource: String): DataFrame = {
    val hot = broadcast(hotKeys.select(col(key)).distinct()
      .withColumn("__hot", lit(1)))
    val lm = large.join(hot, Seq(key), "left")
    val sm = small.join(hot, Seq(key), "left")
    val hotPart = saltedInnerJoin(
      lm.filter(col("__hot").isNotNull).drop("__hot"),
      sm.filter(col("__hot").isNotNull).drop("__hot"),
      key, buckets, saltSource)
    val cold = lm.filter(col("__hot").isNull).drop("__hot")
      .join(sm.filter(col("__hot").isNull).drop("__hot"), Seq(key))
    hotPart.select(cold.columns.map(col): _*).unionAll(cold)
  }
}
