package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** sim24's OPQ-lite rotation: the variance-balanced dimension
  * permutation must BE a permutation (the orthonormality argument
  * rests on it), must achieve its allocation objective, and must
  * leave exact distances — and therefore the ground-truth kNN —
  * invariant.
  */
class OpqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("opq permutation is a bijection on 0..Dims-1 with balanced subspaces") {
    val perm = Similarity.opqPermutation(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getInt(1))
    assert(perm.length == Similarity.Dims)
    assert(perm.map(_._1).sorted.toSeq == (0 until Similarity.Dims),
      "newpos is not a permutation of 0..Dims-1")
    assert(perm.map(_._2).sorted.toSeq == (0 until Similarity.Dims),
      "orig is not a permutation of 0..Dims-1")
    // snake draft: each subspace receives exactly PqSubDims dims, and
    // the per-subspace variance totals are tighter than the identity
    // layout's (the allocation objective)
    val vars = Similarity.dimVariances(spark, sf).toMap
    val bySub = perm.groupBy(_._1 / Similarity.PqSubDims)
      .map { case (s, ds) => s -> ds.map(d => vars(d._2)) }
    assert(bySub.values.forall(_.length == Similarity.PqSubDims))
    def spread(tot: Iterable[Double]): Double = tot.max - tot.min
    val opqSpread = spread(bySub.values.map(_.sum))
    val idSpread = spread((0 until Similarity.Dims)
      .groupBy(_ / Similarity.PqSubDims).values
      .map(_.map(d => vars(d)).sum))
    assert(opqSpread <= idSpread + 1e-12,
      s"snake draft failed to tighten the variance allocation: " +
        s"$opqSpread vs identity $idSpread")
  }

  test("permuted basis preserves exact distances (orthonormality in effect)") {
    import spark.implicits._
    val orig = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    val perm = Similarity.opqPermuted(spark, sf)
      .filter(col("vec_id") < 10)
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- orig.keys; j <- orig.keys if i < j) {
      val before = d2(orig(i), orig(j))
      val after = d2(perm(i), perm(j))
      assert(math.abs(before - after) < 1e-9,
        s"distance moved under the permutation: ($i,$j) $before -> $after")
    }
  }

  test("sim24 output shape matches sim07's and ranks by permuted-space ADC") {
    val rows = graft.SparkEntry.queries("sim24_opq_adc")(spark, sf)
    assert(rows.columns.toSeq == Seq("query_id", "neighbor_id", "adc_dist"))
    val collected = rows.collect()
    assert(collected.nonEmpty)
    val perQuery = collected.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length <= Similarity.KnnK))
  }
}
