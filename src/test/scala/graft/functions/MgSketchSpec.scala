package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Invariants for the Misra-Gries heavy-hitter sketch behind
  * hh01: the candidate-superset guarantee (count > n/(k+1) ⇒
  * present) must hold under arbitrary partitioning and merge order,
  * the serialized form must round-trip, and the catalog entry must
  * equal the naive global groupBy it replaces. */
class MgSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Reference fold: split `stream` into `parts` chunks, MG-fold each
    * chunk, then merge the buffers (optionally through a serialize
    * round-trip) in the given order. */
  private def sketch(stream: Seq[String], k: Int, parts: Int,
      viaBytes: Boolean, mergeOrder: Seq[Int]): MgBuffer = {
    val agg = MisraGries(org.apache.spark.sql.catalyst.expressions.Literal("x"), k)
    val chunks = stream.grouped(math.max(1, (stream.size + parts - 1) / parts)).toSeq
    val bufs = chunks.map { c =>
      val b = new MgBuffer(k)
      c.foreach(b.offer)
      if (viaBytes) agg.deserialize(agg.serialize(b)) else b
    }
    val acc = new MgBuffer(k)
    mergeOrder.filter(_ < bufs.size).foreach(i => acc.mergeFrom(bufs(i)))
    acc
  }

  test("mg: candidate set ⊇ exact heavy hitters under any partitioning/merge order") {
    val rnd = new scala.util.Random(7)
    // adversarial mix: 3 genuinely heavy keys buried in a long tail of
    // ~400 distinct light keys, shuffled
    val heavy = Seq.fill(300)("h1") ++ Seq.fill(220)("h2") ++ Seq.fill(150)("h3")
    val tail = Seq.fill(1400)(s"t${rnd.nextInt(400)}")
    val stream = rnd.shuffle(heavy ++ tail)
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    for (k <- Seq(3, 7, 15); parts <- Seq(1, 4, 13); rev <- Seq(false, true)) {
      val order = if (rev) (0 until parts).reverse else 0 until parts
      val buf = sketch(stream, k, parts, viaBytes = true, order)
      assert(buf.n == n)
      val qualifying = exact.collect { case (key, c) if c.toLong * (k + 1) > n => key }
      val cands = buf.counts.keySet()
      qualifying.foreach { key =>
        assert(cands.contains(key),
          s"k=$k parts=$parts rev=$rev: heavy key $key (count ${exact(key)}) evicted")
      }
      assert(buf.counts.size <= k, s"k=$k: ${buf.counts.size} counters retained")
    }
  }

  test("mg: undercount is bounded by n/(k+1) on every retained counter") {
    val rnd = new scala.util.Random(11)
    val stream = rnd.shuffle(
      Seq.fill(500)("a") ++ Seq.fill(100)("b") ++ Seq.fill(900)(s"z${rnd.nextInt(300)}"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(3, 10); parts <- Seq(1, 8)) {
      val buf = sketch(stream, k, parts, viaBytes = false, 0 until parts)
      val bound = stream.size.toDouble / (k + 1)
      buf.counts.forEach { (key, est) =>
        assert(est <= exact(key), s"overcount on $key")
        assert(exact(key) - est <= bound + 1e-9,
          s"k=$k parts=$parts: undercount ${exact(key) - est} > n/(k+1)=$bound on $key")
      }
    }
  }

  test("mg: serialize round-trips keys, counts, and the exact total") {
    val b = new MgBuffer(5)
    Seq("α", "β", "β", "", "long " * 40, "α").foreach(b.offer)
    val agg = MisraGries(org.apache.spark.sql.catalyst.expressions.Literal("x"), 5)
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.k == b.k && rt.n == b.n && rt.counts == b.counts)
  }

  test("hh01 equals the naive exact groupBy at the fixture scale") {
    import scala.jdk.CollectionConverters._
    val got = SparkEntry.queries("hh01_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val n = e.count()
    val want = e.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (graft.ops.Analytics.HeavyK + 1L) > lit(n))
      .orderBy(col("cnt").desc, col("user_id").asc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "fixture should produce a non-degenerate heavy-hitter set")
  }
}
