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
}
