package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Graph-analytics operators — the family dd07 (connected components)
  * and g01 (PageRank) opened, extended with the two other primitives
  * a data-curation pipeline reaches for:
  *
  *   - g02: bounded multi-source BFS over the near-dup graph —
  *     "quarantine propagation": given a seed set of flagged docs,
  *     find every doc within k near-dup hops and how far out it sits
  *     (the blast radius of a contamination / takedown event);
  *   - g03: per-node triangle counting over the part co-purchase
  *     graph — the local-clustering signal (recommendation strength,
  *     community density) on a graph that is NOT the planted near-dup
  *     blobs but an organically dense co-occurrence structure.
  *
  * Scale posture: both are pure join dataflows on hash-partitioned
  * edge frames — the Pregel shape dd07/g01 established. BFS does one
  * join + distinct per round (frontier-driven: work is proportional
  * to the frontier, not the graph) with `localCheckpoint` lineage
  * hygiene per round and a scalar-only driver loop. Triangles do one
  * self-join to enumerate wedges and one hash probe to close them,
  * with the edges DEGREE-ORIENTED first (toward the higher-(degree,
  * id) endpoint), which bounds the wedge intermediate by Σ outdeg² —
  * O(m^1.5) total on any graph — instead of Σ deg², which is
  * unbounded under degree skew.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** g02: 1-in-SeedMod nodes (hash-chosen, salted apart from every
    * other hash domain) are BFS seeds; expansion stops at MaxHops —
    * the bound that keeps the recursive oracle finite on cyclic
    * graphs and mirrors how a real quarantine sweep is depth-capped. */
  val SeedMod = 8
  val MaxHops = 6

  /** g04: result cap — the top-K strongest unlinked pairs. The
    * LIMIT cut is deterministic across engines only because both
    * sides order by the ROUNDED score (identical doubles by the
    * exact-rational construction) then (part_a, part_b) — a total
    * order with no ties left to the engine. */
  val LinkTopK = 100

  private def seedPred(c: String): String =
    s"${Portable.phashExpr(s"concat('g2:', CAST($c AS STRING))")} % $SeedMod = 0"

  /** g03/g04: one-year shipdate window on the co-purchase graph.
    * Both queries read a signal that decays with time (clustering,
    * recommendation), and the window is the knob that keeps the edge
    * set bounded as the fact table grows — measured on g04 at sf0.1:
    * 34.2 s full-history vs 4.0 s windowed (8.5×). */
  val CopurchaseWindow: (String, String) =
    ("1996-01-01 00:00:00", "1997-01-01 00:00:00")

  /** Distinct canonical co-purchase edges (pa < pb): parts sharing an
    * order. Shared by g03 (triangles) and g04 (link prediction), both
    * shipdate-windowed to [[CopurchaseWindow]]. */
  private def copurchaseEdges(s: SparkSession, d: String,
      window: Option[(String, String)] = None): DataFrame = {
    val li0 = Tables.lineitem(s, d)
    val li = window.fold(li0) { case (lo, hi) =>
      li0.filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf(lo)) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf(hi)))
    }.select(col("l_orderkey"), col("l_partkey"))
    li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .distinct()
  }

  /** Cached co-purchase edges, one frame per session+dir+window —
    * g03 and g04 previously each cached the identical plan (the
    * second call only emitted an "already cached" warning). */
  private def copurchaseCached(s: SparkSession, d: String,
      window: Option[(String, String)]): DataFrame =
    Dedup.memoFrame(s, d, s"copurchase:${window.fold("all")(_._1)}")(
      copurchaseEdges(s, d, window).cache())

  private def copurchaseEdgesSql(window: Option[(String, String)] = None): String = {
    val pred = window.fold("") { case (lo, hi) =>
      s"\n  WHERE a.l_shipdate >= TIMESTAMP '$lo' AND a.l_shipdate < TIMESTAMP '$hi'" +
        s"\n    AND b.l_shipdate >= TIMESTAMP '$lo' AND b.l_shipdate < TIMESTAMP '$hi'"
    }
    s"""SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey$pred""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    // Bounded multi-source BFS (min-hop labels), frontier-DELTA form
    // (round 5): round k joins ONLY the round-(k-1) frontier against
    // the edge frame, anti-joins the reached set against the
    // discovered-so-far frame, and keeps just the round's DELTA
    // `(doc_id, hops=k)` — the full label frame is never rewritten
    // (the round-4 shape re-materialized ALL node labels every
    // round, so k rounds cost k full label passes). Discovered-so-far
    // is a lazy union of per-round localCheckpoint'ed deltas: each
    // anti-join scans only already-materialized output-sized frames,
    // and the final result is that same union, ordered — per-round
    // work tracks the frontier and the discovered set, never the
    // graph. First discovery = minimum hop count on an unweighted
    // graph, so no re-labeling pass exists. The driver sees one
    // scalar (delta size) per round.
    // Edges come from Dedup's shared memo (g01 builds the identical
    // plan; one cached frame serves both, and one clearMemo frees it).
    "g02_bfs_hops" -> ((s, d) => Dedup.memoFrame(s, d, "g02_bfs") {
      val edges = Dedup.verifiedEdges(s, d)
      var frontier = edges.select(col("src").as("doc_id")).distinct()
        .filter(expr(seedPred("doc_id")))
        .withColumn("hops", lit(0L))
        .localCheckpoint()
      var discovered = frontier
      var k = 1L
      var more = frontier.count() > 0
      while (more && k <= MaxHops) {
        val reached = frontier.join(edges, frontier("doc_id") === edges("src"))
          .select(col("dst").as("doc_id")).distinct()
        val delta = reached
          .join(discovered, Seq("doc_id"), "left_anti")
          .withColumn("hops", lit(k))
          .localCheckpoint()
        more = delta.count() > 0
        discovered = discovered.union(delta)
        frontier = delta
        k += 1
      }
      val result = discovered.orderBy("doc_id").localCheckpoint()
      result
    }),

    // Per-node triangle counts on the part co-purchase graph (parts
    // sharing an order). Edge build: the within-order pair join is
    // quadratic in basket size — bounded by TPC-H's ≤7-line orders;
    // a marketplace with 10⁴-item baskets caps or samples baskets
    // first. Enumeration is DEGREE-ORIENTED (Chiba–Nishizeki / the
    // "forward" algorithm): orient every undirected edge toward the
    // higher-(degree, id) endpoint, enumerate wedges as out-neighbor
    // pairs of the lower-rank corner, and close each with one hash
    // probe against the oriented list. The wedge intermediate is then
    // Σ outdeg(v)² with outdeg bounded by O(√m) on any graph (vs
    // Σ deg(v)² under arbitrary orientation, unbounded under skew) —
    // the refinement that keeps the join bounded when one blockbuster
    // part co-occurs with everything. Each triangle surfaces exactly
    // once (its corners are rank-ordered), then is credited to all
    // three corners with an in-plan explode. The graph is windowed to
    // one year of shipments like g04 — clustering is a recency
    // signal, and the window caps edge-set densification as history
    // accumulates. Counts are orientation-invariant, so the oracle
    // mirrors the same oriented enumeration only to stay cheap, not
    // to force agreement.
    "g03_triangles" -> ((s, d) => Dedup.memoFrame(s, d, "g03_triangles") {
      val e = copurchaseCached(s, d, Some(CopurchaseWindow))
      val deg = e.select(col("pa").as("v")).union(e.select(col("pb").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      // Orient toward the higher rank, rank = (deg, id). Edges arrive
      // canonical (pa < pb), so the tie on degree keeps pa → pb.
      val oriented = e
        .join(deg.toDF("pa", "deg_a"), "pa")
        .join(deg.toDF("pb", "deg_b"), "pb")
        .select(
          when(col("deg_a") <= col("deg_b"), col("pa")).otherwise(col("pb")).as("src"),
          when(col("deg_a") <= col("deg_b"), col("pb")).otherwise(col("pa")).as("dst"))
      // Carry the dst rank so the wedge join can order the two outer
      // corners without a third join back to the degree frame.
      val out = oriented
        .join(deg.toDF("dst", "ddeg"), "dst")
        .select("src", "dst", "ddeg")
        .cache()
      val tri = out.as("e1")
        .join(out.as("e2"),
          col("e1.src") === col("e2.src") &&
            (col("e1.ddeg") < col("e2.ddeg") ||
              (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
        .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
        .join(out.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("l_partkey"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_triangles"))
        .orderBy("l_partkey")
    }),

    // Common-neighbor link prediction on the co-purchase graph — the
    // recommendation primitive: score every UNLINKED part pair by the
    // Jaccard of their neighborhoods ("bought alongside the same
    // partners, never together"). Same wedge shape as g03 but over
    // the undirected list (both orientations of every wedge are
    // needed to score its endpoints; g03's degree-orientation trick
    // applies only when each wedge may be counted once), closed by an
    // anti-join against the edge set instead of a closing probe;
    // candidate scores collapse map-side per (x, y) before the
    // exchange, and the top-K cut is TakeOrdered (never a full sort
    // of the candidate space). Scores are exact rationals from
    // degree/common counts — no float accumulation.
    //
    // The graph is WINDOWED to one year of shipments: recommendation
    // signals decay, and the wedge volume Σ deg² grows quadratically
    // in per-node degree as history accumulates — the time window is
    // the knob that keeps the candidate space bounded as the fact
    // table grows (measured: the full-history graph at sf0.1 cost
    // 34.2 s vs 4.0 s windowed — 8.5× — on this query alone).
    "g04_link_predict" -> ((s, d) => Dedup.memoFrame(s, d, "g04_links") {
      val e = copurchaseCached(s, d, Some(CopurchaseWindow))
      val und = e.select(col("pa").as("a"), col("pb").as("b"))
        .union(e.select(col("pb").as("a"), col("pa").as("b")))
      val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
      val cn = und.toDF("x", "m").join(und.toDF("y", "m"), "m")
        .filter(col("x") < col("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("common"))
      cn.join(e.toDF("x", "y"), Seq("x", "y"), "left_anti")
        .join(deg.toDF("x", "deg_x"), "x")
        .join(deg.toDF("y", "deg_y"), "y")
        .withColumn("score", round(col("common").cast("double") /
          (col("deg_x") + col("deg_y") - col("common")).cast("double"), 6))
        .orderBy(col("score").desc, col("x"), col("y"))
        .limit(LinkTopK)
        .select(col("x").as("part_a"), col("y").as("part_b"),
          col("common"), col("score"))
    })
  )

  val oracle: Map[String, String] = Map(
    // min-hop as a depth-bounded recursive CTE: UNION dedups
    // (doc_id, hops) states and hops is capped at MaxHops, so the
    // fixpoint is finite even on cycles; min(hops) per node is the
    // BFS distance.
    "g02_bfs_hops" ->
      s"""WITH RECURSIVE ${Dedup.lshPairsCte},
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM p
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM p
         |),
         |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
         |bfs(doc_id, hops) AS (
         |  SELECT doc_id, 0 FROM nodes
         |  WHERE ${Portable.phashSql("'g2:' || CAST(doc_id AS VARCHAR)")} % $SeedMod = 0
         |  UNION
         |  SELECT e.dst, b.hops + 1
         |  FROM bfs b JOIN edges e ON b.doc_id = e.src
         |  WHERE b.hops < $MaxHops
         |)
         |SELECT doc_id, CAST(min(hops) AS BIGINT) AS hops
         |FROM bfs GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Oriented enumeration mirrored from the operator: per-node
    // triangle counts are orientation-invariant, so this mirror is a
    // cost choice (bounded wedge set in DuckDB too), not a parity
    // requirement.
    "g03_triangles" ->
      s"""WITH e AS (
        |  ${copurchaseEdgesSql(Some(CopurchaseWindow))}
        |),
        |deg AS (
        |  SELECT v, count(*) AS deg FROM (
        |    SELECT pa AS v FROM e UNION ALL SELECT pb FROM e
        |  ) GROUP BY v
        |),
        |o AS (
        |  SELECT CASE WHEN da.deg <= db.deg THEN e.pa ELSE e.pb END AS src,
        |         CASE WHEN da.deg <= db.deg THEN e.pb ELSE e.pa END AS dst
        |  FROM e JOIN deg da ON da.v = e.pa JOIN deg db ON db.v = e.pb
        |),
        |oo AS (
        |  SELECT o.src, o.dst, d.deg AS ddeg FROM o JOIN deg d ON d.v = o.dst
        |),
        |t AS (
        |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |  FROM oo e1 JOIN oo e2 ON e1.src = e2.src
        |   AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
        |  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
        |),
        |r AS (
        |  SELECT a AS l_partkey FROM t
        |  UNION ALL SELECT b FROM t
        |  UNION ALL SELECT c FROM t
        |)
        |SELECT l_partkey, count(*) AS n_triangles
        |FROM r GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,

    "g04_link_predict" ->
      s"""WITH e AS (
         |  ${copurchaseEdgesSql(Some(CopurchaseWindow))}
         |),
         |und AS (
         |  SELECT pa AS a, pb AS b FROM e
         |  UNION ALL
         |  SELECT pb, pa FROM e
         |),
         |deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a),
         |cn AS (
         |  SELECT n1.a AS x, n2.a AS y, count(*) AS common
         |  FROM und n1 JOIN und n2 ON n1.b = n2.b AND n1.a < n2.a
         |  GROUP BY 1, 2
         |),
         |ne AS (
         |  SELECT cn.* FROM cn LEFT JOIN e ON e.pa = cn.x AND e.pb = cn.y
         |  WHERE e.pa IS NULL
         |)
         |SELECT x AS part_a, y AS part_b, common,
         |       round(CAST(common AS DOUBLE)
         |             / CAST(dx.deg + dy.deg - common AS DOUBLE), 6) AS score
         |FROM ne JOIN deg dx ON dx.a = x JOIN deg dy ON dy.a = y
         |ORDER BY score DESC, part_a, part_b LIMIT $LinkTopK""".stripMargin
  )
}
