package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the `spark.sql.extensions` integration path: a session
  * built with `withExtensions(new GraftExtensions)` resolves the
  * custom codegen functions with NO imperative register call. */
class ExtensionsSpec extends AnyFunSuite {

  test("cosine_sim / dot_product / minhash_mix resolve via GraftExtensions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // same master as SparkSpec: if this spec runs first, the JVM-wide
    // SparkContext it creates must not pin later suites to fewer cores
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT
          |  cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c,
          |  dot_product(array(CAST(2.0 AS DOUBLE)), array(CAST(3.0 AS DOUBLE))) AS d,
          |  minhash_mix(array(CAST(5 AS BIGINT), CAST(9 AS BIGINT))) AS m
          |""".stripMargin).collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getDouble(1) === 6.0)
      assert(r.getSeq[Long](2).length === graft.ops.Dedup.MinhashK)
    } finally {
      // restore the suite-shared session for subsequent specs; if none
      // existed, CLEAR ours so later suites build their own default
      // (else they would silently inherit the extensions-injected
      // session and stop exercising the imperative register path)
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
