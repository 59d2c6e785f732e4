package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The library's `SparkSessionExtensions` entry point: ship the
  * custom codegen expressions (`cosine_sim`, `dot_product`,
  * `minhash_mix`) into every session of a cluster via
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or programmatically with
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * The imperative `VectorExprs.register(spark)` path stays for
  * embedded/test use; both share one function-description list.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.VectorExprs.injectInto(ext)
}
