package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the catalog itself — guards
  * against drift as operators are added: every `queries` entry must
  * carry a DuckDB oracle (the t2 correctness gate) unless it is on
  * the explicit, justified exception list.
  */
class ContractSpec extends AnyFunSuite {

  /** Catalog entries deliberately without an oracle, each with the
    * reason recorded here so the exception is auditable. */
  private val noOracleByDesign = Map(
    "a15_approx_distinct" ->
      "HLL sketches are engine-specific by design; error bound is spec-proven in BreadthSpec/OpsSpec")

  test("every catalog query has an oracle or a recorded exception") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = q -- o -- noOracleByDesign.keySet
    assert(missing.isEmpty,
      s"catalog entries without oracle or recorded exception: ${missing.toSeq.sorted.mkString(", ")}")
    val stale = o -- q
    assert(stale.isEmpty,
      s"oracle entries with no catalog query: ${stale.toSeq.sorted.mkString(", ")}")
    val obsoleteExceptions = noOracleByDesign.keySet -- q
    assert(obsoleteExceptions.isEmpty,
      s"exception list names absent queries: ${obsoleteExceptions.mkString(", ")}")
  }

  test("catalog names follow the family_slug convention and are unique per family ordinal") {
    val re = "^[a-z]+[0-9]+[a-z0-9]*(_[a-z0-9]+)*$".r
    val bad = SparkEntry.queries.keySet.filterNot(n => re.matches(n))
    assert(bad.isEmpty, s"non-conforming names: ${bad.toSeq.sorted.mkString(", ")}")
  }
}
