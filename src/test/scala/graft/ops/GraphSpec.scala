package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** Invariants for the graph family's round-4 continuation (bounded
  * BFS, triangle counting) — exact result parity is the DuckDB
  * oracle's job; these re-derive the graph-theoretic properties from
  * independently collected edge sets. */
class GraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** The near-dup edge set g02 runs on, collected independently. */
  private lazy val dupEdges: Set[(Long, Long)] = {
    val pairs = Dedup.lshVerifiedPairs(Dedup.minhashSignatures(spark, sf))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs ++ pairs.map { case (a, b) => (b, a) }
  }

  // --- g02_bfs_hops --------------------------------------------------

  test("bfs: hop levels are exactly the frontier distances from the seed set") {
    val rows = q("g02_bfs_hops").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hops")).toMap
    assert(rows.nonEmpty, "the sf0.001 near-dup graph contains seeds")
    // reference BFS over the collected edge set
    val adj = dupEdges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = adj.keySet.filter { id =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"g2:$id".getBytes("UTF-8"))
      val h = md5.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) >>> 4
      h % Graph.SeedMod == 0
    }
    var level = seeds
    var seen = seeds.map(_ -> 0L).toMap
    var k = 1L
    while (level.nonEmpty && k <= Graph.MaxHops) {
      level = level.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(seen.contains)
      seen = seen ++ level.map(_ -> k)
      k += 1
    }
    assert(rows === seen, "operator hop labels equal reference BFS distances")
  }

  test("bfs: every positive-hop node has a neighbor one level closer") {
    val rows = q("g02_bfs_hops").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hops")).toMap
    rows.filter(_._2 > 0).foreach { case (n, h) =>
      val closer = dupEdges.collect { case (a, b) if a == n => b }
        .exists(nb => rows.get(nb).contains(h - 1))
      assert(closer, s"node $n at hops $h lacks a level-${h - 1} neighbor")
    }
    assert(rows.values.forall(h => h >= 0 && h <= Graph.MaxHops))
  }

  // --- g03_triangles -------------------------------------------------

  test("triangles: per-node counts equal a brute-force recount of the co-purchase graph") {
    // mirror the operator's one-year shipdate window; the brute-force
    // recount below is orientation-free, so it also certifies that the
    // degree-oriented enumeration is count-invariant
    val (lo, hi) = Graph.CopurchaseWindow
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf(lo)) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf(hi)))
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val parts = basket.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val nbrs = (edges ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- nbrs(a).intersect(nbrs(b)) if b < c) {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    val got = q("g03_triangles").collect()
      .map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("n_triangles")).toMap
    assert(got.nonEmpty, "sf0.001 co-purchase graph contains triangles")
    assert(got === counts.toMap, "operator counts equal brute-force recount")
  }

  // --- g04_link_predict ----------------------------------------------

  test("link prediction: top-K equals a brute-force neighborhood-Jaccard recount, no edges leak in") {
    // mirror the operator's one-year shipdate window
    val (lo, hi) = Graph.CopurchaseWindow
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf(lo)) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf(hi)))
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val parts = basket.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val nbrs = (edges ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cands = (for {
      (x, nx) <- nbrs.toSeq; (y, ny) <- nbrs.toSeq if x < y
      if !edges.contains((x, y))
      common = nx.intersect(ny).size if common > 0
    } yield {
      val score = common.toDouble / (nx.size + ny.size - common)
      (x, y, common.toLong, math.round(score * 1e6) / 1e6)
    }).sortBy(t => (-t._4, t._1, t._2)).take(Graph.LinkTopK)
    val got = q("g04_link_predict").collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("common"), r.getAs[Double]("score")))
      .sortBy(t => (-t._4, t._1, t._2))
    assert(got.nonEmpty)
    got.foreach { case (a, b, _, _) =>
      assert(!edges.contains((a, b)), s"existing edge ($a,$b) reported as prediction")
    }
    assert(got.toSeq === cands)
  }
}
