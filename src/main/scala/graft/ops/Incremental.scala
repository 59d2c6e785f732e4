package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Incremental-maintenance operators — the warehouse surface a
  * pipeline needs once tables stop being immutable: SCD2 dimension
  * versioning (MERGE-shaped upsert) and CDC-style snapshot diffing.
  *
  * Both are ONE hash-shuffle on the merge key — the update/diff
  * stream joins the base exactly once, and every derived row is
  * emitted in that single pass (no second scan per change class). At
  * cluster scale the base table would be bucketed on the key, making
  * the join exchange-free on the big side; the update batch is
  * typically small enough to broadcast outright.
  *
  * The "update batches" are hash-derived slices of the base tables
  * (`Portable` md5 domains, salted apart) so the operators are
  * deterministic and oracle-checkable without writable state.
  */
object Incremental {
  type Q = (SparkSession, String) => DataFrame

  /** u01: 3-in-10 customers re-segmented + balance-adjusted; 1-in-100
    * appears as a brand-new key (insert). */
  val UpdateMod = 10
  val UpdateKeep = 3
  val InsertMod = 100
  val InsertKeyOffset = 10000000L
  val DimValidFrom = "2024-01-01"
  val MergeEffective = "2024-06-01"

  /** cdc01: snapshots A/B each drop a different 1-in-20 key slice;
    * 1-in-10 of the surviving keys carry a changed payload in B. */
  val SnapMod = 20
  val ChangeMod = 10
  val PriceDelta = 10.0

  /** u02: the two point-in-time probes — one before the merge
    * effective date (old versions answer), one at it (closed versions
    * excluded, new versions + inserts answer). */
  val AsOfEarly = "2024-03-01"

  /** ivm02: 1-in-10 orders form the arriving batch (ΔA inserts);
    * 1-in-25 of the standing orders are retracted; re-segmented
    * customers (the u01 3-in-10 slice, salted apart) form ΔB as
    * retract/assert pairs. */
  val DeltaJoinInsMod = 10
  val DeltaJoinDelMod = 25

  /** u03: 1-in-20 EXISTING dimension keys arrive as tombstones (the
    * predicate is dim-side — a tombstone for an unknown key is a
    * MERGE no-op, so the insert stream is never affected); a key both
    * updated and deleted is a DELETE (the CDC convention: the
    * tombstone is the final word). */
  val DeleteMod = 20

  private def slice(salt: String, key: Column): Column =
    expr(s"${Portable.phashExpr(s"concat('$salt', CAST(${key.toString} AS STRING))")}")

  private def sliceSql(salt: String, key: String): String =
    Portable.phashSql(s"'$salt' || CAST($key AS VARCHAR)")

  /** The deterministic u01 update batch: re-segmentations (+100.0 to
    * the balance, 'R-' segment prefix) plus synthetic new keys. */
  private def updateBatch(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val upd = c
      .filter(slice("u1:", col("c_custkey")) % UpdateMod < UpdateKeep)
      .select(col("c_custkey"),
        concat(lit("R-"), col("c_mktsegment")).as("c_mktsegment"),
        (col("c_acctbal") + 100.0).as("c_acctbal"))
    val ins = c
      .filter(slice("i1:", col("c_custkey")) % InsertMod === 0)
      .select((col("c_custkey") + InsertKeyOffset).as("c_custkey"),
        col("c_mktsegment"), col("c_acctbal"))
    upd.unionByName(ins)
  }

  /** The shared SCD2 merge dataflow: one full-outer join of
    * dim × update batch, one pass emitting 0-2 versioned rows per key
    * via an in-plan array explode — never one scan per change class.
    * Unchanged keys stay current; changed keys close the old version
    * at the effective date and open a new current one; new keys open
    * at the effective date; change detection compares the tracked
    * attributes (not row identity), so a no-op update collapses.
    * With `withDeletes`, tombstones target EXISTING dimension keys
    * (the predicate is on the dim side — a tombstone for an unknown
    * key is a no-op, the MERGE convention): a deleted key's current
    * version closes with NO successor, and a key both updated and
    * deleted is a delete — the tombstone is the final word (CDC
    * compaction). */
  private def scd2Merge(s: SparkSession, d: String, withDeletes: Boolean): DataFrame = {
    val dim = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val upd = updateBatch(s, d)
    val j = dim.as("d").join(upd.as("u"),
      col("d.c_custkey") === col("u.c_custkey"), "full_outer")
    val deleted =
      if (withDeletes)
        col("d.c_custkey").isNotNull &&
          slice("d1:", col("d.c_custkey")) % DeleteMod === 0
      else lit(false)
    val changed = col("d.c_custkey").isNotNull && col("u.c_custkey").isNotNull &&
      (col("d.c_mktsegment") =!= col("u.c_mktsegment") ||
        col("d.c_acctbal") =!= col("u.c_acctbal"))
    val oldRow = when(col("d.c_custkey").isNotNull, struct(
      col("d.c_custkey").as("c_custkey"),
      col("d.c_mktsegment").as("c_mktsegment"),
      col("d.c_acctbal").as("c_acctbal"),
      lit(DimValidFrom).cast("date").as("valid_from"),
      when(deleted || changed, lit(MergeEffective).cast("date"))
        .otherwise(lit(null).cast("date")).as("valid_to"),
      when(deleted || changed, 0).otherwise(1).as("is_current")))
    val newRow = when(!deleted && col("u.c_custkey").isNotNull &&
        (col("d.c_custkey").isNull || changed), struct(
      col("u.c_custkey").as("c_custkey"),
      col("u.c_mktsegment").as("c_mktsegment"),
      col("u.c_acctbal").as("c_acctbal"),
      lit(MergeEffective).cast("date").as("valid_from"),
      lit(null).cast("date").as("valid_to"),
      lit(1).as("is_current")))
    j.select(explode(filter(array(oldRow, newRow), _.isNotNull)).as("r"))
      .select(col("r.*"))
      .orderBy("c_custkey", "valid_from")
  }

  val queries: Map[String, Q] = Map(
    // SCD2 MERGE (updates + inserts) — see [[scd2Merge]]
    "u01_scd2_merge" -> ((s, d) => scd2Merge(s, d, withDeletes = false)),

    // SCD2 MERGE with DELETES — u01 completed to the full CRUD
    // triangle in the same single-shuffle dataflow; see [[scd2Merge]]
    "u03_merge_delete" -> ((s, d) => scd2Merge(s, d, withDeletes = true)),

    // Point-in-time (as-of) lookup over the SCD2 dimension — the read
    // side of u01's write side, and the reason SCD2 exists: "what did
    // the dimension say on date D". A version is active at D when
    // valid_from <= D < coalesce(valid_to, ∞); probing two dates that
    // straddle the merge shows the same keys answering with different
    // attribute versions. The probe-date frame is a 2-row broadcast
    // against the dimension scan — ONE narrow pass however many
    // as-of dates are probed at once (the batch-backfill shape: a
    // feature-store rebuild probes thousands of training timestamps
    // in one such pass instead of one dimension scan per date). At
    // 100 TB the dimension would additionally be partitioned by
    // valid_from range so a point-in-time probe prunes closed
    // versions at the file level.
    "u02_scd2_asof" -> ((s, d) => {
      val dim2 = queries("u01_scd2_merge")(s, d)
      val asof = dim2.sparkSession.range(1)
        .select(explode(array(
          lit(AsOfEarly).cast("date"),
          lit(MergeEffective).cast("date"))).as("as_of"))
      dim2.crossJoin(broadcast(asof))
        .filter(col("valid_from") <= col("as_of") &&
          (col("valid_to").isNull || col("valid_to") > col("as_of")))
        .groupBy("as_of")
        .agg(count(lit(1)).as("n_customers"),
          Tables.dsum(col("c_acctbal"), 2).as("total_bal"))
        .orderBy("as_of")
    }),

    // CDC snapshot diff: classify every key of two table snapshots as
    // added / removed / updated in ONE full-outer join (unchanged
    // rows drop out). The payload compare is on the tracked column,
    // so a re-written-but-identical row is not a change.
    "cdc01_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val snapA = o.filter(slice("a:", col("o_orderkey")) % SnapMod =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val snapB = o.filter(slice("b:", col("o_orderkey")) % SnapMod =!= 0)
        .select(col("o_orderkey"),
          when(slice("m:", col("o_orderkey")) % ChangeMod === 0,
            col("o_totalprice") + PriceDelta)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      val j = snapA.as("a").join(snapB.as("b"),
        col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
      j.select(
          coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("o_orderkey"),
          when(col("a.o_orderkey").isNull, "added")
            .when(col("b.o_orderkey").isNull, "removed")
            .when(col("a.o_totalprice") =!= col("b.o_totalprice"), "updated")
            .as("change_type"),
          col("a.o_totalprice").as("old_price"),
          col("b.o_totalprice").as("new_price"))
        .filter(col("change_type").isNotNull)
        .orderBy("o_orderkey")
    }),

    // Incremental view maintenance: refresh a materialized aggregate
    // by folding the CDC delta into it — V' = V ⊕ γ(Δ) — instead of
    // rescanning the base. The delta contributions (+new/+1 for adds,
    // −old/−1 for removes, new−old/0 for updates) union with the
    // standing view and one re-aggregate absorbs them; all sums stay
    // DECIMAL until the final projection, so the incremental path is
    // EXACTLY equal to the full recompute over snapshot B (the
    // oracle — that equality is the IVM correctness property). At
    // 100 TB the standing view is a stored table of group cardinality
    // and only γ(Δ) touches data proportional to the change stream.
    "ivm01_delta_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dec = (c: Column) => c.cast(org.apache.spark.sql.types.DecimalType(18, 2))
      val snapA = o.filter(slice("a:", col("o_orderkey")) % SnapMod =!= 0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val snapB = o.filter(slice("b:", col("o_orderkey")) % SnapMod =!= 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(slice("m:", col("o_orderkey")) % ChangeMod === 0,
            col("o_totalprice") + PriceDelta)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      // the standing view γ(A) — at scale this is a READ of the
      // stored materialization, not a scan of A
      val view = snapA.groupBy(col("o_orderpriority"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"),
          count(lit(1)).as("n"))
      // γ(Δ): contributions from the same one-pass diff as cdc01
      val j = snapA.as("a").join(snapB.as("b"),
        col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
      val delta = j.select(
          coalesce(col("b.o_orderpriority"), col("a.o_orderpriority")).as("o_orderpriority"),
          when(col("a.o_orderkey").isNull, dec(col("b.o_totalprice")))
            .when(col("b.o_orderkey").isNull, -dec(col("a.o_totalprice")))
            .otherwise(dec(col("b.o_totalprice")) - dec(col("a.o_totalprice"))).as("rev"),
          when(col("a.o_orderkey").isNull, 1L)
            .when(col("b.o_orderkey").isNull, -1L)
            .otherwise(0L).as("n"))
        .filter(col("rev") =!= dec(lit(0)) || col("n") =!= 0)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("rev")).as("rev"), sum(col("n")).as("n"))
      view.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("rev")).cast("double").as("priority_revenue"),
          sum(col("n")).as("order_cnt"))
        .orderBy("o_orderpriority")
    }),

    // Incremental maintenance of a JOIN view (ivm01's delta-agg
    // lifted to the binary operator) — the signed-multiplicity
    // (z-relation) form differential dataflow / DBSP make canonical.
    // V = γ_segment(orders ⋈ customer); when BOTH sides receive
    // deltas (ΔA: day-N order arrivals +1 / retractions −1; ΔB: a
    // re-segmented customer is retract-old + assert-new), the view
    // updates by join bilinearity
    //   ΔV = γ(ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB)
    // — the base-side A⋈B is NEVER recomputed. Each delta term joins
    // a change-stream-sized side against one standing table (the
    // deltas broadcast at scale; the standing view is a stored
    // read), so maintenance cost is proportional to the change
    // stream, not the view. Measures stay DECIMAL until the final
    // projection, making the incremental result EXACTLY equal to the
    // full recompute over the updated snapshots — the oracle IS that
    // recompute (the IVM correctness property).
    "ivm02_delta_join" -> ((s, d) => {
      val dec = (c: Column) => c.cast(org.apache.spark.sql.types.DecimalType(18, 2))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val aBase = o.filter(slice("ja:", col("o_orderkey")) % DeltaJoinInsMod =!= 0)
      val dA = o.filter(slice("ja:", col("o_orderkey")) % DeltaJoinInsMod === 0)
          .withColumn("m", lit(1L))
        .unionByName(
          aBase.filter(slice("jd:", col("o_orderkey")) % DeltaJoinDelMod === 0)
            .withColumn("m", lit(-1L)))
      val changed = cust.filter(slice("jb:", col("c_custkey")) % UpdateMod < UpdateKeep)
      val dB = changed.withColumn("m", lit(-1L))
        .unionByName(changed
          .withColumn("c_mktsegment", concat(lit("R-"), col("c_mktsegment")))
          .withColumn("m", lit(1L)))
      // the standing view γ(A⋈B) — at scale a READ of the stored
      // materialization, not a recomputation
      val view = aBase.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"), count(lit(1)).as("n"))
      def signed(df: DataFrame, m: Column): DataFrame = df.select(
        col("c_mktsegment"),
        when(m > 0, dec(col("o_totalprice")))
          .otherwise(-dec(col("o_totalprice"))).as("rev"),
        m.as("n"))
      val t1 = signed(dA.join(cust, col("o_custkey") === col("c_custkey")), col("m"))
      val t2 = signed(aBase.join(dB, col("o_custkey") === col("c_custkey")), col("m"))
      val t3 = signed(
        dA.as("a").join(dB.as("b"), col("o_custkey") === col("c_custkey")),
        col("a.m") * col("b.m"))
      val delta = t1.unionByName(t2).unionByName(t3)
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("rev")).as("rev"), sum(col("n")).as("n"))
      view.unionByName(delta)
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("rev")).cast("double").as("seg_revenue"),
          sum(col("n")).as("order_cnt"))
        // a fully-retracted group leaves the view (z-relation support)
        .filter(col("order_cnt") =!= 0L)
        .orderBy("c_mktsegment")
    })
  )

  /** The shared update-batch + full-outer-join CTE chain ending in
    * `j(dk, dseg, dbal, uk, useg, ubal)` — one textual source for
    * u01's, u02's, and u03's oracles. */
  private lazy val mergeCte: String =
    s"""upd AS (
       |  SELECT c_custkey, 'R-' || c_mktsegment AS c_mktsegment,
       |         c_acctbal + 100.0 AS c_acctbal
       |  FROM customer
       |  WHERE ${sliceSql("u1:", "c_custkey")} % $UpdateMod < $UpdateKeep
       |  UNION ALL
       |  SELECT c_custkey + $InsertKeyOffset, c_mktsegment, c_acctbal
       |  FROM customer
       |  WHERE ${sliceSql("i1:", "c_custkey")} % $InsertMod = 0
       |),
       |j AS (
       |  SELECT d.c_custkey AS dk, d.c_mktsegment AS dseg, d.c_acctbal AS dbal,
       |         u.c_custkey AS uk, u.c_mktsegment AS useg, u.c_acctbal AS ubal
       |  FROM customer d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey
       |)""".stripMargin

  private val changedSql: String =
    "dk IS NOT NULL AND uk IS NOT NULL AND (dseg <> useg OR dbal <> ubal)"

  /** u01's oracle text, shared so u02's point-in-time oracle probes
    * the exact same versioned relation. */
  private lazy val u01Sql: String =
    s"""WITH $mergeCte,
         |cls AS (
         |  SELECT *, $changedSql AS changed
         |  FROM j
         |)
         |SELECT dk AS c_custkey, dseg AS c_mktsegment, dbal AS c_acctbal,
         |       DATE '$DimValidFrom' AS valid_from,
         |       CASE WHEN changed THEN DATE '$MergeEffective' END AS valid_to,
         |       CASE WHEN changed THEN 0 ELSE 1 END AS is_current
         |FROM cls WHERE dk IS NOT NULL
         |UNION ALL
         |SELECT uk, useg, ubal, DATE '$MergeEffective', NULL, 1
         |FROM cls WHERE uk IS NOT NULL AND (dk IS NULL OR changed)
         |ORDER BY c_custkey, valid_from""".stripMargin

  val oracle: Map[String, String] = Map(
    "u01_scd2_merge" -> u01Sql,

    "u03_merge_delete" ->
      s"""WITH $mergeCte,
         |cls AS (
         |  SELECT *, $changedSql AS changed,
         |         dk IS NOT NULL
         |           AND ${sliceSql("d1:", "dk")} % $DeleteMod = 0 AS deleted
         |  FROM j
         |)
         |SELECT dk AS c_custkey, dseg AS c_mktsegment, dbal AS c_acctbal,
         |       DATE '$DimValidFrom' AS valid_from,
         |       CASE WHEN deleted OR changed THEN DATE '$MergeEffective' END AS valid_to,
         |       CASE WHEN deleted OR changed THEN 0 ELSE 1 END AS is_current
         |FROM cls WHERE dk IS NOT NULL
         |UNION ALL
         |SELECT uk, useg, ubal, DATE '$MergeEffective', NULL, 1
         |FROM cls WHERE NOT deleted AND uk IS NOT NULL AND (dk IS NULL OR changed)
         |ORDER BY c_custkey, valid_from""".stripMargin,

    "u02_scd2_asof" ->
      s"""WITH dim2 AS (
         |  SELECT * FROM ( $u01Sql ) t
         |),
         |d AS (
         |  SELECT unnest([DATE '$AsOfEarly', DATE '$MergeEffective']) AS as_of
         |)
         |SELECT as_of, count(*) AS n_customers,
         |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         |FROM dim2 CROSS JOIN d
         |WHERE valid_from <= as_of AND (valid_to IS NULL OR valid_to > as_of)
         |GROUP BY as_of ORDER BY as_of""".stripMargin,

    "cdc01_snapshot_diff" ->
      s"""WITH a AS (
         |  SELECT o_orderkey, o_totalprice FROM orders
         |  WHERE ${sliceSql("a:", "o_orderkey")} % $SnapMod <> 0
         |),
         |b AS (
         |  SELECT o_orderkey,
         |         CASE WHEN ${sliceSql("m:", "o_orderkey")} % $ChangeMod = 0
         |              THEN o_totalprice + $PriceDelta ELSE o_totalprice END AS o_totalprice
         |  FROM orders
         |  WHERE ${sliceSql("b:", "o_orderkey")} % $SnapMod <> 0
         |),
         |j AS (
         |  SELECT a.o_orderkey AS ak, a.o_totalprice AS ap,
         |         b.o_orderkey AS bk, b.o_totalprice AS bp
         |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
         |)
         |SELECT coalesce(ak, bk) AS o_orderkey,
         |       CASE WHEN ak IS NULL THEN 'added'
         |            WHEN bk IS NULL THEN 'removed'
         |            WHEN ap <> bp THEN 'updated' END AS change_type,
         |       ap AS old_price, bp AS new_price
         |FROM j
         |WHERE CASE WHEN ak IS NULL THEN 'added'
         |           WHEN bk IS NULL THEN 'removed'
         |           WHEN ap <> bp THEN 'updated' END IS NOT NULL
         |ORDER BY o_orderkey""".stripMargin,

    // the IVM correctness property: the delta-folded view equals the
    // full recompute over snapshot B
    "ivm01_delta_agg" ->
      s"""WITH b AS (
         |  SELECT o_orderkey, o_orderpriority,
         |         CASE WHEN ${sliceSql("m:", "o_orderkey")} % $ChangeMod = 0
         |              THEN o_totalprice + $PriceDelta ELSE o_totalprice END AS o_totalprice
         |  FROM orders
         |  WHERE ${sliceSql("b:", "o_orderkey")} % $SnapMod <> 0
         |)
         |SELECT o_orderpriority,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS priority_revenue,
         |       count(*) AS order_cnt
         |FROM b GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    // full recompute over the updated snapshots — the incremental
    // dataflow must equal this exactly (IVM correctness property)
    "ivm02_delta_join" ->
      s"""WITH a_new AS (
         |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |  WHERE ${sliceSql("ja:", "o_orderkey")} % $DeltaJoinInsMod = 0
         |     OR ${sliceSql("jd:", "o_orderkey")} % $DeltaJoinDelMod <> 0
         |),
         |b_new AS (
         |  SELECT c_custkey,
         |         CASE WHEN ${sliceSql("jb:", "c_custkey")} % $UpdateMod < $UpdateKeep
         |              THEN 'R-' || c_mktsegment ELSE c_mktsegment END AS c_mktsegment
         |  FROM customer
         |)
         |SELECT c_mktsegment,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS seg_revenue,
         |       count(*) AS order_cnt
         |FROM a_new JOIN b_new ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
