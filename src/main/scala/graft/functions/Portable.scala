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

  /** SECOND independent 60-bit lane: the LAST 15 hex chars of the
    * same MD5 (chars 18-32 — char 16/17 deliberately skipped so the
    * two lanes share no hex digit). For DESTRUCTIVE decisions keyed
    * by hash equality (cur08 strips text chunks), one 60-bit lane
    * inherits birthday collisions around 2^30 distinct keys —
    * expected false merges at the 100 TB chunk count (~1e10-1e11).
    * Keying by BOTH lanes is a 120-bit match (collision odds ~1e-14
    * even at 1e11 keys) while the exchange stays two fixed-width
    * longs — the reason this beats verifying on the chunk string,
    * which would put variable-width text back into the shuffle the
    * hash exists to avoid. */
  def phash2Expr(e: String): String =
    s"CAST(conv(substring(md5($e), 18, 15), 16, 10) AS BIGINT)"

  /** DuckDB form of [[phash2Expr]]. */
  def phash2Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 18, 15)) AS BIGINT)"

  /** Deterministic pseudo-random projection planes for LSH: values in
    * [-1, 1), generated once (seeded) and inlined as double literals
    * into BOTH the Spark plan and the oracle SQL — identical by
    * construction, zero per-row hashing cost. */
  def planes(nPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes, dims)(rnd.nextDouble() * 2.0 - 1.0)
  }
}
