package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable deterministic hashing.
  *
  * Spark's `hash`/`xxhash64` and DuckDB's `hash` are different
  * algorithms, so LSH/minhash signatures built on them could never be
  * oracle-compared. Instead both sides take the first 15 hex chars of
  * MD5 (a 60-bit value — fits a signed BIGINT with no overflow):
  *
  *   Spark:  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
  *   DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
  *
  * MD5 is identical everywhere; the result is exact integer math from
  * there on. Not a cryptographic use — just a stable fingerprint.
  */
object Portable {

  /** 60-bit md5-prefix hash of a string column. */
  def phash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Spark SQL text form (for use inside `expr` lambdas). */
  def phashExpr(e: String): String =
    s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)"

  /** DuckDB SQL text form. */
  def phashSql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** Deterministic pseudo-random projection planes for LSH: values in
    * [-1, 1), generated once (seeded) and inlined as double literals
    * into BOTH the Spark plan and the oracle SQL — identical by
    * construction, zero per-row hashing cost. */
  def planes(nPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes, dims)(rnd.nextDouble() * 2.0 - 1.0)
  }
}
