package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Geo

/** The reference pipeline's operator inventory (SURVEY.md §2) re-keyed
  * to the driver's `events` testdata table, per SURVEY.md §7.2:
  * `user_id`≈VehicleNumber, `event_type`≈Lines, `ts`≈Time, and
  * synthetic coordinates derived from `value` (pure arithmetic, so the
  * DuckDB oracle reproduces them bit-exactly):
  *
  *   lat = 52.0 + value/1000  ∈ [52.0, 52.4]   (Warsaw bbox analog,
  *   lon = 20.5 + value/500   ∈ [20.5, 21.3]    gtfstransformerSilver.py:42)
  *
  * Pipeline stages mirror /root/reference exactly:
  *   silver   — explode/trim/cast/dropna/bbox/nonempty/dedup/sort
  *              (gtfstransformerSilver.py:28-46)
  *   enriched — lag×2, haversine, fuel, cost, Δt, speed, speed≤70
  *              (gtfsGold.py:36-85)
  *   report   — groupBy(line) with the 8 aggregates + cost_of_1km
  *              (gtfsGold.py:94-105)
  *
  * Dedup is the deterministic row_number form (SURVEY.md §7.5 item 3),
  * not raw dropDuplicates, so oracle comparison is reproducible.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Fuel constants from the reference config (.env.example:7-8). */
  val FuelLPer100Km = 30.0
  val FuelPricePln = 6.5
  val MaxSpeedKmh = 70.0

  private val tsFmt = "yyyy-MM-dd HH:mm:ss"
  private val tsFmtSql = "%Y-%m-%d %H:%M:%S"

  // ------------------------------------------------------------------
  // Shared pipeline stages (Spark side)
  // ------------------------------------------------------------------

  /** Session-scoped memo of shared stage frames: many catalog queries
    * consume silver/enriched — materialize each once per
    * (session, dir) instead of recomputing the upstream pipeline per
    * query (the C1 cache pattern, main.py:65, applied engine-wide). */
  private val frameCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Diagnostic mirror of Dedup.memoBuilds: builds executed (not memo
    * hits), so ConcurrencySpec can assert exactly-once construction
    * for silver/enriched under racing callers too. */
  private[graft] val memoBuilds = new java.util.concurrent.atomic.AtomicLong(0)

  // Same double-build race guard as Dedup.memoFrame:
  // TrieMap.getOrElseUpdate is compute-then-putIfAbsent, so two racing
  // callers could both build — and the loser's .cache()d relation
  // would leak unpersisted. Fast-path lock-free get for hits; a single
  // reentrant lock serializes builds (enriched → silver re-enters
  // fine). Stopped-session entries are swept inside the lock.
  private val memoLock = new Object

  private def memo(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    val k = (spark, dir, key)
    frameCache.get(k) match {
      case Some(df) => df
      case None => memoLock.synchronized {
        // drop entries of stopped sessions so long-lived JVMs that
        // cycle sessions (test suites, repeated benches) don't
        // accumulate them
        frameCache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
        frameCache.getOrElseUpdate(k,
          { memoBuilds.incrementAndGet(); build.cache() })
      }
    }
  }

  /** Drop this session's memoized stage frames (bench/stress hook —
    * lets a harness re-measure cold builds instead of cache reads). */
  def clearMemo(spark: SparkSession): Unit =
    frameCache.keys.filter(_._1 eq spark).foreach { k =>
      frameCache.remove(k).foreach(_.unpersist())
    }

  /** Silver analog: project/trim/cast → dropna → bbox-analog → nonempty
    * → deterministic dedup. gtfstransformerSilver.py:28-46. */
  def silver(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "silver")(buildSilver(spark, dir))

  private def buildSilver(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val projected = ev
      .select(
        trim(col("event_type")).as("line"), // P3
        col("user_id").as("vehicle"),
        col("value"),
        col("ts"),
        to_date(col("ts")).as("date")) // P5
      .na.drop("any") // P6
      .filter(col("value").between(0.0, 400.0)) // P7 bbox analog
      .filter(col("line") =!= "") // P8
    // D1, deterministic form: one row per (vehicle, ts), full-row order
    val w = Window.partitionBy("vehicle", "ts").orderBy("line", "value")
    projected
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Enriched per-ping analog: lag window, haversine segment, fuel,
    * cost, Δt, speed, anomaly cut. gtfsGold.py:36-85. */
  def enriched(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "enriched")(buildEnriched(spark, dir))

  private def buildEnriched(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("vehicle").orderBy("ts") // W1
    val lagged = silver(spark, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w)) // W2
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
    val lat1 = lit(52.0) + col("prev_value") / 1000.0
    val lon1 = lit(20.5) + col("prev_value") / 500.0
    val lat2 = lit(52.0) + col("value") / 1000.0
    val lon2 = lit(20.5) + col("value") / 500.0
    lagged
      // M1 + P11: null on first ping per vehicle → 0.0. Derived
      // metrics are computed from the UNROUNDED distance: rounding
      // first would give downstream products exact low-decimal
      // structure, creating decimal-cast ties where engines' rounding
      // rules diverge (HALF_UP on true expansion vs FP-scaled round).
      .withColumn("dist_km_raw", coalesce(Geo.haversineKm(lat1, lon1, lat2, lon2), lit(0.0)))
      .withColumn("dist_km", round(col("dist_km_raw"), 6))
      // M2: unix-second difference (floor), long
      .withColumn("diff_time_sec",
        unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
      // M3: constant arithmetic (gtfsGold.py:59-65)
      .withColumn("fuel_l", col("dist_km_raw") / 100.0 * FuelLPer100Km)
      .withColumn("cost_pln", col("fuel_l") * FuelPricePln)
      // P10: guarded speed
      .withColumn("speed_kmh",
        when(col("diff_time_sec") > 0,
          col("dist_km_raw") / col("diff_time_sec") * 3600.0).otherwise(0.0))
      // P13: anomaly cut (gtfsGold.py:83)
      .filter(col("speed_kmh") <= MaxSpeedKmh)
  }

  /** Daily report analog: 8 aggregates + cost_of_1km. gtfsGold.py:94-105. */
  def report(spark: SparkSession, dir: String): DataFrame =
    reportFrom(enriched(spark, dir))

  /** Report from an already-built enriched frame (lets callers cache
    * and reuse the enrichment — fixes the reference's C2 recompute,
    * gtfsGold.py:119). */
  def reportFrom(enrichedDf: DataFrame): DataFrame = {
    enrichedDf
      .groupBy("line") // A1
      .agg(
        Tables.dsum(col("dist_km_raw"), 6).as("total_distance_km"), // A2
        Tables.dsum(col("cost_pln"), 6).as("total_cost_pln"), // A2
        max(col("dist_km")).as("max_segment_km"), // A3
        count(col("vehicle")).as("data_points_count"), // A4
        (Tables.dsum(col("speed_kmh"), 6) / count(col("speed_kmh")).cast(DoubleType)).as("avg_speed"), // A5
        round(max(col("speed_kmh")), 6).as("max_recorded_speed"), // A3
        countDistinct(col("vehicle")).as("unique_vehicles_count"), // A6
        (Tables.dsum(col("dist_km_raw"), 6) / countDistinct(col("vehicle")).cast(DoubleType)).as("avg_dist_per_vehicle")) // A7
      // A8 + P12: derived post-agg column with div-by-zero guard
      .withColumn("cost_of_1km",
        expr("total_cost_pln / nullif(total_distance_km, 0.0)"))
  }

  /** The argmax drill-down shared by o05/o06: top line by total cost
    * (tie-break line asc), then its hardest-working vehicle by summed
    * distance (tie-break vehicle asc) — all rank-and-filter, no
    * driver round-trip. One definition so a tie-break change can
    * never desynchronize the two series. */
  private def topVehicle(e: DataFrame): DataFrame = {
    val top = reportFrom(e)
      .orderBy(col("total_cost_pln").desc, col("line").asc).limit(1)
      .select("line")
    e.join(broadcast(top), "line")
      .groupBy("line", "vehicle")
      .agg(Tables.dsum(col("dist_km"), 6).as("total_v_dist"))
      .orderBy(col("total_v_dist").desc, col("vehicle").asc).limit(1)
      .select("line", "vehicle")
  }

  // ------------------------------------------------------------------
  // Shared pipeline stages (DuckDB oracle side) — textually parallel
  // expression trees; see Geo.haversineSql for the determinism rules.
  // ------------------------------------------------------------------

  /** top_line/top_vehicle CTE pair — the oracle mirror of
    * [[topVehicle]], shared by the o05/o06 oracles. */
  private val topVehicleCte: String =
    """top_line AS (
      |  SELECT line FROM report2 ORDER BY total_cost_pln DESC, line ASC LIMIT 1
      |),
      |top_vehicle AS (
      |  SELECT e.line, e.vehicle
      |  FROM enriched e JOIN top_line t ON e.line = t.line
      |  GROUP BY e.line, e.vehicle
      |  ORDER BY CAST(sum(CAST(e.dist_km AS DECIMAL(18,6))) AS DOUBLE) DESC, e.vehicle ASC
      |  LIMIT 1
      |)""".stripMargin

  val silverCte: String =
    """silver AS (
      |  SELECT line, vehicle, value, ts, date FROM (
      |    SELECT trim(event_type) AS line, user_id AS vehicle, value, ts,
      |           CAST(ts AS DATE) AS date,
      |           row_number() OVER (PARTITION BY user_id, ts
      |                              ORDER BY trim(event_type), value) AS rn
      |    FROM events
      |    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      |      AND value IS NOT NULL AND ts IS NOT NULL
      |      AND value BETWEEN 0.0 AND 400.0 AND trim(event_type) <> ''
      |  ) t WHERE rn = 1
      |)""".stripMargin

  private val hav = Geo.haversineSql("lat1", "lon1", "lat2", "lon2")

  val enrichedCte: String =
    s"""$silverCte,
       |lagged AS (
       |  SELECT line, vehicle, value, ts, date,
       |         lag(value) OVER w AS prev_value,
       |         lag(ts) OVER w AS prev_ts
       |  FROM silver
       |  WINDOW w AS (PARTITION BY vehicle ORDER BY ts)
       |),
       |coords AS (
       |  SELECT *,
       |         52.0 + prev_value / 1000.0 AS lat1, 20.5 + prev_value / 500.0 AS lon1,
       |         52.0 + value / 1000.0 AS lat2, 20.5 + value / 500.0 AS lon2
       |  FROM lagged
       |),
       |seg AS (
       |  SELECT *, COALESCE($hav, 0.0) AS dist_km_raw,
       |         round(COALESCE($hav, 0.0), 6) AS dist_km,
       |         CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) AS diff_time_sec
       |  FROM coords
       |),
       |seg2 AS (
       |  SELECT *, dist_km_raw / 100.0 * 30.0 AS fuel_l FROM seg
       |),
       |enriched0 AS (
       |  SELECT *, fuel_l * 6.5 AS cost_pln,
       |         CASE WHEN diff_time_sec > 0 THEN dist_km_raw / diff_time_sec * 3600.0 ELSE 0.0 END AS speed_kmh
       |  FROM seg2
       |),
       |enriched AS (
       |  SELECT * FROM enriched0 WHERE speed_kmh <= 70.0
       |)""".stripMargin

  val reportCte: String =
    s"""$enrichedCte,
       |report AS (
       |  SELECT line,
       |    CAST(sum(CAST(dist_km_raw AS DECIMAL(18,6))) AS DOUBLE) AS total_distance_km,
       |    CAST(sum(CAST(cost_pln AS DECIMAL(18,6))) AS DOUBLE) AS total_cost_pln,
       |    max(dist_km) AS max_segment_km,
       |    count(vehicle) AS data_points_count,
       |    CAST(sum(CAST(speed_kmh AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(speed_kmh) AS DOUBLE) AS avg_speed,
       |    round(max(speed_kmh), 6) AS max_recorded_speed,
       |    count(DISTINCT vehicle) AS unique_vehicles_count,
       |    CAST(sum(CAST(dist_km_raw AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(DISTINCT vehicle) AS DOUBLE) AS avg_dist_per_vehicle
       |  FROM enriched GROUP BY line
       |),
       |report2 AS (
       |  SELECT *, total_cost_pln / nullif(total_distance_km, 0.0) AS cost_of_1km FROM report
       |)""".stripMargin

  // ------------------------------------------------------------------
  // Catalog entries
  // ------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    // P1: explode / UNNEST (gtfstransformerSilver.py:28)
    "p01_explode" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(sequence(lit(1), col("l_linenumber"))).as("seg0"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("seg0").cast(LongType).as("seg"))),

    // P2: nested-struct projection (gtfstransformerSilver.py:34-39)
    "p02_struct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(struct(col("l_orderkey").as("k"), col("l_quantity").as("q")).as("sdata"))
        .select(col("sdata.k").as("k"), col("sdata.q").as("q"))),

    // P3: trim
    "p03_trim" -> ((s, d) =>
      Tables.events(s, d)
        .select(trim(concat(lit("  "), col("event_type"), lit(" "))).as("line"))
        .distinct().orderBy("line")),

    // P4: casts incl. malformed-input → null under pre-ANSI semantics
    // bad_cast uses try_cast: IDENTICAL to cast under the pre-ANSI pin
    // (malformed → null, the reference's gtfstransformerSilver
    // semantics) and keeps that contract when the session runs the
    // ANSI lane, where a plain cast of 'error' → DOUBLE throws
    "p04_cast" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        col("user_id").cast(StringType).as("uid_str"),
        floor(col("value")).cast(IntegerType).as("value_int"),
        expr("try_cast(event_type AS DOUBLE)").as("bad_cast"))
        .orderBy("event_id")),

    // P5: to_date
    "p05_to_date" -> ((s, d) =>
      Tables.events(s, d)
        .select(to_date(col("ts")).cast(StringType).as("event_date"))
        .distinct().orderBy("event_date")),

    // P6: dropna
    "p06_dropna" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), expr("nullif(event_type, 'error')").as("etype"))
        .na.drop("any").orderBy("event_id")),

    // P7: inclusive range predicate
    "p07_between" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"), col("value"))
        .filter(col("value").between(100.0, 200.0)).orderBy("event_id")),

    // P8: equality predicates (date ==, nonempty string)
    "p08_filter_eq" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        to_date(col("ts")).cast(StringType).as("event_date"),
        trim(col("event_type")).as("line"))
        .filter(col("event_date") === "2024-01-15")
        .filter(col("line") =!= "").orderBy("event_id")),

    // P9: null predicates + OR (data-quality count, gtfsGold.py:17-21)
    "p09_nullcount" -> ((s, d) =>
      Tables.events(s, d).select(
        sum(when(col("event_type").isNull || col("user_id").isNull, 1L).otherwise(0L)).as("null_rows"),
        count(lit(1)).as("total_rows"))),

    // P10: when/otherwise
    "p10_when" -> ((s, d) =>
      Tables.events(s, d)
        .select(when(col("value") > 300.0, "high")
          .when(col("value") > 100.0, "mid").otherwise("low").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n")).orderBy("bucket")),

    // P11: coalesce
    "p11_coalesce" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          coalesce(expr("nullif(event_type, 'click')"), lit("was_click")).as("etype"))
        .orderBy("event_id")),

    // P12: nullif div-by-zero guard
    "p12_nullif" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(trim(col("event_type")).as("line"))
        .agg(Tables.dsum(col("value"), 2).as("total_value"),
          countDistinct(col("user_id")).as("users"))
        .withColumn("value_per_user", expr("total_value / nullif(CAST(users AS DOUBLE), 0.0)"))
        .withColumn("div0_guard", expr("total_value / nullif(total_value - total_value, 0.0)"))
        .orderBy("line")),

    // P13: filter on derived column
    "p13_derived_filter" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), round(col("value") * 3.6, 6).as("v36"))
        .filter(col("v36") <= 900.0).orderBy("event_id")),

    // M1: haversine segments
    "m01_haversine" -> ((s, d) =>
      enriched(s, d).select(col("vehicle"),
        date_format(col("ts"), tsFmt).as("ts_s"), col("dist_km"))
        .orderBy("vehicle", "ts_s")),

    // M2: unix-timestamp diff
    "m02_timediff" -> ((s, d) =>
      enriched(s, d).select(col("vehicle"),
        date_format(col("ts"), tsFmt).as("ts_s"), col("diff_time_sec"))
        .orderBy("vehicle", "ts_s")),

    // M3: constant arithmetic (fuel/cost)
    "m03_fuel_cost" -> ((s, d) =>
      enriched(s, d).select(col("vehicle"),
        date_format(col("ts"), tsFmt).as("ts_s"),
        round(col("fuel_l"), 6).as("fuel_l"), round(col("cost_pln"), 6).as("cost_pln"))
        .orderBy("vehicle", "ts_s")),

    // D1: deterministic dedup over artificially doubled input
    "d01_dedup" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val doubled = ev.unionAll(ev)
      val w = Window.partitionBy("user_id", "ts").orderBy("event_id", "event_type", "value")
      doubled.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), tsFmt).as("ts_s"))
        .orderBy("event_id")
    }),

    // O1: global multi-column sort (gtfstransformerSilver.py:46)
    "o01_sort" -> ((s, d) =>
      silver(s, d).select(col("line"), col("vehicle"), col("value"),
        date_format(col("ts"), tsFmt).as("ts_s"), col("date").cast(StringType).as("date_s"))
        .orderBy("line", "vehicle", "ts_s")),

    // O2+O3: desc sort + top-k with total order (tie-break on line)
    "o02_topk" -> ((s, d) =>
      report(s, d).orderBy(col("total_cost_pln").desc, col("line").asc)
        .limit(10).select(col("line"), col("total_cost_pln"))),

    // O4: argmax without driver round-trips (SURVEY §7.6): most
    // expensive line → its hardest-working vehicle (gtfsGold.py:110-126)
    "o04_argmax" -> ((s, d) => {
      val e = enriched(s, d) // memoized: one enrichment feeds report + drill-down
      val top = reportFrom(e)
        .orderBy(col("total_cost_pln").desc, col("line").asc).limit(1)
        .select(col("line"), col("total_cost_pln"))
      val perVehicle = e
        .join(broadcast(top), "line")
        .groupBy("line", "total_cost_pln", "vehicle")
        .agg(Tables.dsum(col("dist_km"), 6).as("total_v_dist"))
      perVehicle.orderBy(col("total_v_dist").desc, col("vehicle").asc).limit(1)
        .select(col("line"), col("total_cost_pln"), col("vehicle"), col("total_v_dist"))
    }),

    // A1-A8: the daily report
    "a01_report" -> ((s, d) => report(s, d).orderBy("line")),

    // A9: secondary per-vehicle aggregate within one line
    "a09_vehicle_agg" -> ((s, d) =>
      enriched(s, d).filter(col("line") === "click")
        .groupBy("vehicle").agg(Tables.dsum(col("dist_km"), 6).as("total_v_dist"))
        .orderBy("vehicle")),

    // A10: drop-rate diagnostics as a single distributed query (no
    // eager count() actions — SURVEY §7.6)
    "a10_counts" -> ((s, d) => {
      val raw = Tables.events(s, d).select(count(lit(1)).as("raw_rows"))
      val kept = silver(s, d).select(count(lit(1)).as("silver_rows"))
      raw.crossJoin(kept)
        .withColumn("dropped", col("raw_rows") - col("silver_rows"))
        .withColumn("drop_pct",
          round(col("dropped").cast(DoubleType) / col("raw_rows").cast(DoubleType) * 100.0, 4))
    }),

    // Ranking + running-frame windows (engine extension beyond the
    // reference's lag-only window surface, SURVEY §2.6)
    "w02_ranking" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id").asc)
      val wt = Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("value_rank", rank().over(w))
        .withColumn("value_dense_rank", dense_rank().over(w))
        .withColumn("rn", row_number().over(w))
        .withColumn("running_value",
          sum(col("value").cast(DecimalType(18, 2))).over(wt).cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("value_rank"),
          col("value_dense_rank"), col("rn"), col("running_value"))
        .orderBy("event_id")
    }),

    // TPC-H Q17 shape: per-part average gate (join against an
    // aggregate of the same fact table), global scalar result
    "q17_small_qty" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val avgQty = li.groupBy(col("l_partkey").as("p_key"))
        .agg((Tables.dsum(col("l_quantity"), 2) / count(col("l_quantity")).cast(DoubleType))
          .as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg(Tables.dsum(col("l_extendedprice"), 2).as("total_price"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q18 shape: HAVING gate on a grouped fact, re-joined to
    // its dimensions, top-k
    "q18_big_orders" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val big = li.groupBy("l_orderkey")
        .agg(Tables.dsum(col("l_quantity"), 2).as("order_qty"))
        .filter(col("order_qty") > 180.0)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("l_orderkey"), col("c_name"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
          col("order_qty"))
        .orderBy(col("order_qty").desc, col("l_orderkey").asc)
        .limit(20)
    }),

    // TPC-H Q3 shape: segment-filtered 3-table join, grouped revenue,
    // top-k by revenue (the shipping-priority query). Dimension side
    // broadcasts (segment filter cuts it 5×); fact⋈fact stays a
    // shuffle join that AQE sizes. Revenue uses dsum at scale 4
    // (price·(1−disc) of 2-dp inputs has exact 4-decimal structure —
    // the q1_pricing rule).
    "q3_shipping_priority" -> ((s, d) => {
      val cutoff = lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"))
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
          col("o_orderpriority"))
        .agg(Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q6 shape: the forecasting-revenue-change scan — a pure
    // filter+aggregate with NO join, the canonical pushdown/codegen
    // showcase (every predicate reaches the parquet scan; one
    // whole-stage-codegen span; map-side partial sum). Revenue =
    // price·discount of 2-dp inputs → exact 4-decimal structure, the
    // q1/q3 dsum rule.
    "q6_forecast_revenue" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(Tables.dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q14 shape: promotion-revenue share — fact⋈dimension with
    // a conditional aggregate on the dimension attribute. Part
    // broadcasts; both decimal sums stay exact until the final
    // division (two exact-decimal doubles → IEEE-identical quotient,
    // rounded at the projection boundary per the parity rules).
    "q14_promo_share" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-03-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      val p = Tables.part(s, d).select("p_partkey", "p_type")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          Tables.dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(lit(0.0)), 4).as("promo_revenue"),
          Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("total_revenue"))
        .select(
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
            .as("promo_share_pct"),
          col("promo_revenue"), col("total_revenue"))
    }),

    // TPC-H Q5 shape: the 6-table snowflake join (region → nation →
    // {customer, supplier} → orders → lineitem) with the
    // local-supplier correlation c_nationkey = s_nationkey. Join
    // strategy by size class: nation/supplier broadcast (dimension
    // side, region filter cuts nations 5×); lineitem⋈orders is the
    // fact-fact shuffle pair AQE sizes; customer is deliberately NOT
    // hinted — at TPC-H scale it is 10⁵ rows/SF, the classic
    // "too big to hint blindly, small enough for AQE's runtime
    // broadcast promotion" middle class, and the date filter on
    // orders prunes before the join. Revenue uses the q1/q3 dsum-at-
    // scale-4 rule.
    "q5_local_supplier" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val n = Tables.nation(s, d)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val su = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // TPC-H Q10 shape: the returned-item report — which customers
    // returned the most revenue in a quarter. lineitem filters on
    // returnflag BEFORE the join (the R slice is ~25% of the fact),
    // orders prunes to the quarter, customer joins on the shuffled
    // key, nation broadcasts. Group keys carry the customer
    // attributes (TPC-H's layout) so the aggregate is one exchange on
    // c_custkey-equivalent keys; top-20 via TakeOrdered.
    "q10_returned_items" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val n = Tables.nation(s, d).select("n_nationkey", "n_name")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q2 shape: min-cost supplier — the correlated-MIN
    // subquery. The driver testdata carries no partsupp table, so the
    // supply relation is derived from lineitem (unit cost =
    // price/qty; IEEE double division, bit-identical in both
    // engines). The correlated `cost = (SELECT min(...) WHERE
    // ps_partkey = p_partkey AND region)` decorrelates into one
    // aggregate over the region-filtered supply frame joined back on
    // (part, cost) — the same plan Catalyst produces for the SQL
    // form, built explicitly. Supplier/nation/region broadcast
    // (dimension class); the supply aggregate shuffles once on
    // (part, supplier) and its min reuses that partitioning.
    "q2_min_cost_supp" -> ((s, d) => {
      val ps = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      val eur = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
      val supply = ps.join(broadcast(eur), col("ps_suppkey") === col("s_suppkey"))
      val minCost = supply.groupBy(col("ps_partkey").as("mc_partkey"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      val p = Tables.part(s, d)
        .filter(col("p_size") <= 10 && col("p_type") === "LARGE")
        .select("p_partkey", "p_name")
      supply
        .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
        .join(minCost, col("ps_partkey") === col("mc_partkey") &&
          col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_name"), round(col("ps_supplycost"), 6).as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
          col("p_partkey").asc)
        .limit(100)
    }),

    // TPC-H Q4 shape: EXISTS decorrelation — order-priority checking.
    // The correlated EXISTS ("some line of this order shipped late")
    // is a LEFT SEMI join on the order key carrying the lateness
    // predicate as a join condition; the semi join stops at the first
    // match per order, never materializing the multiplicity. No
    // commitdate/receiptdate in the driver schema, so "late" =
    // shipped > 30 days after the order date.
    "q4_order_priority" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q20 shape: nested-IN chain — suppliers whose recent-year
    // shipments of pattern-matched parts exceed half their all-time
    // shipments (availqty analog; the testdata has no partsupp). The
    // IN chain is three semi joins: parts-by-name prunes the supply
    // frame (broadcast — the LIKE cuts the part dim), the correlated
    // scalar subquery decorrelates into an aggregate joined on the
    // same (part, supplier) grouping keys (one shuffle feeds both
    // aggregates), and the outer IN is a semi join into supplier.
    "q20_excess_suppliers" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val li = Tables.lineitem(s, d)
      val recent = li.filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(Tables.dsum(col("l_quantity"), 2).as("recent_qty"))
      val alltime = li
        .groupBy(col("l_partkey").as("at_partkey"), col("l_suppkey").as("at_suppkey"))
        .agg(Tables.dsum(col("l_quantity"), 2).as("all_qty"))
      val smallParts = Tables.part(s, d)
        .filter(col("p_name").like("small%")).select("p_partkey")
      val excess = recent
        .join(broadcast(smallParts), col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(alltime, col("ps_partkey") === col("at_partkey") &&
          col("ps_suppkey") === col("at_suppkey"))
        .filter(col("recent_qty") > col("all_qty") * 0.5)
        .select("ps_suppkey").distinct()
      val natKeys = Tables.nation(s, d)
        .filter(col("n_regionkey") === 0).select("n_nationkey")
      Tables.supplier(s, d)
        .join(broadcast(natKeys), col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q21 shape: multi-EXISTS — suppliers who kept finished
    // orders waiting. EXISTS ("another supplier contributed to the
    // order") is a LEFT SEMI join on the order key with the
    // inequality as a join condition; NOT EXISTS ("no OTHER supplier
    // was late on it") is the matching LEFT ANTI. Both probe sides
    // are distinct (order, supplier) pairs, so the semi/anti joins
    // scan deduplicated frames instead of raw lineitem multiplicity;
    // lateness reuses the Q4 predicate (shipped > 60 days after the
    // order date).
    "q21_waiting_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderstatus")
      val lateLines = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val late = lateLines
        .select(col("l_orderkey").as("lt_orderkey"), col("l_suppkey").as("lt_suppkey"))
        .distinct()
      val pairs = li
        .select(col("l_orderkey").as("pr_orderkey"), col("l_suppkey").as("pr_suppkey"))
        .distinct()
      lateLines.filter(col("o_orderstatus") === "F")
        .join(pairs, col("pr_orderkey") === col("l_orderkey") &&
          col("pr_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(late, col("lt_orderkey") === col("l_orderkey") &&
          col("lt_suppkey") =!= col("l_suppkey"), "left_anti")
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(10)
    }),

    // TPC-H Q7 shape: volume shipping between a nation PAIR — the
    // symmetric-disjunction join. Both nation dims are pre-filtered
    // to the two named nations and broadcast, so the disjunctive
    // pair predicate evaluates over an already-tiny candidate space;
    // the fact-side joins stay equi-joins on their natural keys.
    // Revenue addends are exact 4-dec decimals (2-dec price × 2-dec
    // discount complement), summed order-independently.
    "q7_volume_shipping" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      val nats = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
      val cn = Tables.customer(s, d)
        .join(broadcast(nats), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val sn = Tables.supplier(s, d)
        .join(broadcast(nats), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cn, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 shape: market share — a ratio of two conditional sums
    // per year. Both numerator and denominator are exact decimal
    // sums; the final division is one double op on identical inputs,
    // rounded at the projection boundary.
    "q8_market_share" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      val amCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(amCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          Tables.dsum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0.0)), 4) /
            Tables.dsum(rev, 4), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 shape: product-type profit — the five-way join with a
    // computed cost term. Supply cost derives from lineitem as in Q2
    // (no partsupp in the driver schema). The profit addend mixes an
    // exact 4-dec revenue with a division-derived cost — an arbitrary
    // double — so it is rounded to 6 dp at the projection (identical
    // doubles in, identical 6-dec out) and THEN summed exactly at
    // scale 6; summing raw doubles would drift with grouping order,
    // and casting unrounded doubles to decimal would gamble on
    // rounding ties.
    "q9_product_profit" -> ((s, d) => {
      val ps = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val profit = round(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("ps_supplycost") * col("l_quantity"), 6)
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%bolt%"))
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(ps, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(Tables.dsum(profit, 6).as("sum_profit"))
        .orderBy(col("nation").asc, col("o_year").desc)
    }),

    // TPC-H Q11 shape: important stock — a grouped value sum compared
    // against a scalar fraction of the global total. The per-pair
    // value (unit cost × shipped qty, both engine-identical doubles)
    // is rounded to 4 dp, so the per-part sums AND the grand total
    // are exact decimals; the 0.1% threshold compares two identical
    // doubles. The total is a 1-row broadcast, not a re-aggregation
    // per part.
    "q11_important_stock" -> ((s, d) => {
      val supply = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"),
          Tables.dsum(col("l_quantity"), 2).as("qty"))
      val natSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val partValue = supply
        .join(broadcast(natSupp), col("ps_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("ps_partkey")
        .agg(Tables.dsum(round(col("cost") * col("qty"), 4), 4).as("value"))
      val total = partValue.agg(Tables.dsum(col("value"), 4).as("total_value"))
      partValue.crossJoin(broadcast(total))
        .filter(col("value") > col("total_value") * 0.001)
        .select("ps_partkey", "value")
        .orderBy(col("value").desc, col("ps_partkey").asc)
    }),

    // TPC-H Q12 shape: conditional counts over a late-shipment join —
    // CASE aggregation split by priority class. No shipmode in the
    // driver schema; l_linestatus is the two-valued grouping stand-in
    // and Q4's lateness predicate (shipped > 45 days after the order
    // date) replaces commit/receipt dates.
    "q12_late_priority" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"))
        .groupBy(col("l_linestatus").as("ship_class"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("ship_class")
    }),

    // TPC-H Q13 shape: customer order-count distribution — the outer
    // join whose NULL side must survive into the aggregate (customers
    // with zero qualifying orders are the point of the query), then a
    // second aggregation over the first's result. count(o_orderkey)
    // counts non-null matches only, exactly the SQL semantics. The
    // qualifying predicate is urgent-orders-only: the synthetic data
    // gives every customer orders of most priorities, and a filter
    // that excludes nobody would leave the zero bucket — the query's
    // point — empty (Round8TpchSpec pins that the bucket is hit).
    "q13_customer_distribution" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_custkey")
      Tables.customer(s, d).select("c_custkey")
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 shape: top supplier — the view-plus-correlated-MAX.
    // The revenue "view" aggregates once; its max is a 1-row
    // broadcast joined back by exact equality (both sides are the
    // same exact decimal-sum doubles, so the tie set is
    // engine-identical).
    "q15_top_supplier" -> ((s, d) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .groupBy(col("l_suppkey"))
        .agg(Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 shape: supplier count by part attribute — the NOT-IN
    // exclusion as a LEFT ANTI join (negative-balance suppliers stand
    // in for the complaints predicate; the testdata has no comments),
    // over the distinct supply pairs derived from lineitem.
    "q16_part_supplier_cnt" -> ((s, d) => {
      val pairs = Tables.lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
      val badSupp = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      pairs
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)
    }),

    // TPC-H Q19 shape: the three-arm disjunctive predicate — each arm
    // pairs a part attribute set with a lineitem quantity band, so
    // neither side's filter alone is selective; the OR evaluates
    // inside the (broadcast) join. Catalyst extracts the common
    // p_partkey equi-key and pushes the p_brand/p_size arms down to
    // the part scan as an OR filter.
    "q19_disjunctive_revenue" -> ((s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      val arms =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey") && arms)
        .agg(Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
    }),

    // TPC-H Q22 shape: global sales opportunity — a scalar-average
    // subquery (1-row broadcast) gating an anti join. Country code =
    // c_nationkey % 5 stands in for the phone prefix the driver
    // schema lacks, and "no orders" becomes "no RECENT orders"
    // (every synthetic customer has lifetime orders — the unwindowed
    // anti join is provably empty, a degenerate check). The average
    // is the exact dsum/count double, so > is engine-identical.
    "q22_global_sales" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .withColumn("cntrycode", col("c_nationkey") % 5)
        .filter(col("cntrycode").isin(0, 1, 2))
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(Tables.davg(col("c_acctbal"), 2).as("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
        .select("o_custkey")
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"), Tables.dsum(col("c_acctbal"), 2).as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // W5: ratio-rank family — percent_rank and cume_dist (exact
    // rationals over a unique total order, so the doubles are
    // engine-identical before the display rounding)
    "w05_rank_ratios" -> ((s, d) => {
      // asc_nulls_last pins the NULL placement to DuckDB's ASC
      // default (NULLS LAST) — Spark's ASC default is NULLS FIRST,
      // a latent parity break the moment a NULL value appears
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").asc_nulls_last, col("event_id").asc)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume_d"))
        .orderBy("event_id")
    }),

    // W6: ABC/Pareto analysis — parts ranked by revenue, cumulative
    // revenue share, classed A (first 80% of revenue) / B (next 15%)
    // / C (tail). The global cumulative sum uses ds04/ds05's
    // two-phase distributed prefix pattern, transposed to a SUM:
    // bucket = -floor(rev/100) (monotone in DESC revenue, so bucket
    // order == rank order), per-bucket revenue totals prefix-summed
    // across the tiny bucket frame, within-bucket running sum over
    // only that bucket's rows — no window sees the full table where
    // the oracle's naive global ORDER BY cumsum runs on one reducer
    // (the ds05 stance: the engine plan is the scalable variant, the
    // oracle the readable one). All accumulation stays DECIMAL to the
    // final share division; the class test compares the same two
    // doubles in both engines, so the 0.80/0.95 boundaries cannot
    // flake.
    "w06_abc_pareto" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val rev = Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
          .as("rev"))
        .withColumn("bucket",
          expr("CAST(-floor(CAST(rev AS DOUBLE) / 100.0) AS BIGINT)"))
      val buckets = rev.groupBy("bucket").agg(sum(col("rev")).as("btot"))
        .withColumn("boff",
          sum(col("btot")).over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("total",
          sum(col("btot")).over(Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .select("bucket", "boff", "total")
      val wIn = Window.partitionBy("bucket")
        .orderBy(col("rev").desc, col("l_partkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.join(broadcast(buckets), "bucket")
        .withColumn("cum", expr("coalesce(boff, 0)") + sum(col("rev")).over(wIn))
        .withColumn("share", col("cum").cast("double") / col("total").cast("double"))
        .select(col("l_partkey"), col("rev").cast("double").as("revenue"),
          round(col("share"), 6).as("cum_share"),
          when(col("share") <= 0.80, "A")
            .when(col("share") <= 0.95, "B").otherwise("C").as("abc_class"))
        .orderBy(col("revenue").desc, col("l_partkey").asc)
    }),

    // W1+W2: lag window ×3
    "w01_lag" -> ((s, d) => {
      val w = Window.partitionBy("vehicle").orderBy("ts")
      silver(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("prev_ts_s", date_format(lag(col("ts"), 1).over(w), tsFmt))
        .withColumn("prev_line", lag(col("line"), 1).over(w))
        .select(col("vehicle"), date_format(col("ts"), tsFmt).as("ts_s"),
          col("prev_value"), col("prev_ts_s"), col("prev_line"))
        .orderBy("vehicle", "ts_s")
    }),

    // C1: cache() before multiple consumers (main.py:65). The memo
    // behind silver() IS that cache — calling .cache() again here
    // only provoked a CacheManager warning per invocation.
    "c01_cache" -> ((s, d) => {
      val cached = silver(s, d)
      cached.groupBy("line")
        .agg(count(lit(1)).as("n"), Tables.dsum(col("value"), 2).as("total_value"))
        .orderBy("line")
    }),

    // Rollup (hierarchical grouping sets) with grouping flags —
    // engine extension; the reference has no grouping sets (§2.5)
    "a11_rollup" -> ((s, d) =>
      Tables.events(s, d)
        .select(trim(col("event_type")).as("line"),
          to_date(col("ts")).cast(StringType).as("d"))
        .rollup("line", "d")
        .agg(count(lit(1)).as("n"),
          grouping(col("line")).cast(IntegerType).as("g_line"),
          grouping(col("d")).cast(IntegerType).as("g_d"))
        .select(col("line"), col("d"), col("n"), col("g_line"), col("g_d"))
        // isnull() before the coalesce tiebreak: a NULL data group and
        // an ''-valued data group would otherwise share a sort key,
        // leaving their order engine-dependent (oracle-hash flake)
        .orderBy(col("g_line"), col("g_d"),
          col("line").isNull, coalesce(col("line"), lit("")),
          col("d").isNull, coalesce(col("d"), lit("")))),

    // Pivot (event_type → columns) — engine extension
    "a12_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.events(s, d)
        .select(to_date(col("ts")).cast(StringType).as("d"), col("event_type"))
        .groupBy("d").pivot("event_type", types).agg(count(lit(1)))
      types.foldLeft(pivoted) { (df, t) => // absent combos: null → 0
        df.withColumn(t, coalesce(col(t), lit(0L)))
      }.orderBy("d")
    }),

    // Unpivot (wide metrics → long) — a12's inverse, completing the
    // reshape pair: per-day wide aggregates melted to (day, metric,
    // value) via stack(). All metrics are cast to DOUBLE up front so
    // the stacked value column has one type; the oracle is the
    // engine-portable UNION ALL form.
    "a19_unpivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).cast(StringType).as("day"))
        .agg(count(lit(1)).cast(DoubleType).as("n_events"),
          countDistinct(col("user_id")).cast(DoubleType).as("n_users"),
          Tables.dsum(col("value"), 4).as("sum_value"))
        .select(col("day"),
          expr("stack(3, 'n_events', n_events, 'n_users', n_users, 'sum_value', sum_value) AS (metric, value_d)"))
        .orderBy("day", "metric")
    }),

    // A20: explicit GROUPING SETS ((line), (d)) — the non-
    // hierarchical member that completes the grouping-set family
    // (a11 rollup, a16 cube): two independent one-dimension reports
    // in ONE scan. A naive plan unions two groupBys (two full scans
    // + two shuffles); Spark expands the named sets with a single
    // Expand node feeding one map-side-combinable hash aggregate, so
    // at 100 TB the cost is one pass + one shuffle of the (tiny)
    // expanded key space no matter how many sets are requested.
    "a20_grouping_sets" -> ((s, d) =>
      Tables.events(s, d)
        .select(trim(col("event_type")).as("line"),
          to_date(col("ts")).cast(StringType).as("d"),
          col("value"))
        .groupingSets(Seq(Seq(col("line")), Seq(col("d"))), col("line"), col("d"))
        .agg(count(lit(1)).as("n"),
          Tables.dsum(col("value"), 2).as("total_value"),
          grouping(col("line")).cast(IntegerType).as("g_line"),
          grouping(col("d")).cast(IntegerType).as("g_d"))
        .select(col("line"), col("d"), col("n"), col("total_value"),
          col("g_line"), col("g_d"))
        // isnull-before-coalesce tiebreak as in a11/a16: each set
        // nulls the other set's column, and a NULL group key must not
        // share a sort key with an ''-valued data group
        .orderBy(col("g_line"), col("g_d"),
          col("line").isNull, coalesce(col("line"), lit("")),
          col("d").isNull, coalesce(col("d"), lit("")))),

    // SQL text interface: the same engine surface through spark.sql
    // over registered views (the reference exposes only the DataFrame
    // DSL — SURVEY §1.1 — this is the free Spark extension)
    "sql01_text_interface" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_v")
      s.sql("""
        SELECT trim(event_type) AS line,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               count(DISTINCT user_id) AS users
        FROM events_v
        WHERE value BETWEEN 0.0 AND 400.0
        GROUP BY trim(event_type)
        ORDER BY line""")
    }),

    // Correlated subqueries through the SQL surface: a correlated
    // scalar subquery + a correlated EXISTS. Catalyst DECORRELATES
    // both into aggregate-and-join plans (RewriteCorrelatedScalarSubquery
    // / RewritePredicateSubquery → left outer + left semi join), so
    // what reads as a per-row nested loop executes as two hash joins —
    // the plan a 100 TB engine needs
    "sql02_correlated_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders_v o
        WHERE o.o_totalprice > 2 * (
                SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*)
                FROM lineitem_v l WHERE l.l_orderkey = o.o_orderkey)
          AND EXISTS (
                SELECT 1 FROM lineitem_v l2
                WHERE l2.l_orderkey = o.o_orderkey AND l2.l_quantity >= 45)
        ORDER BY o.o_orderkey""")
    }),

    // Recursive CTE through the SQL surface (Spark 4's WITH
    // RECURSIVE → UnionLoop): walk each document's doubling-chain
    // ancestry (edges d → 2d over the corpus id space) up to its odd
    // root. The edge relation is a strictly-increasing DAG, so the
    // UNION ALL recursion terminates by construction; depth ∝ log₂ n
    // (9 levels at 500 docs, 40 at a trillion — recursion depth is
    // the one dimension that does NOT grow linearly with the corpus).
    // Identical SQL text runs on DuckDB as the oracle.
    "sql03_recursive_cte" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("documents_v")
      s.sql("""
        WITH RECURSIVE anc(doc_id, root, depth) AS (
          SELECT doc_id, doc_id, 0
          FROM documents_v
          WHERE doc_id % 2 = 1 OR doc_id = 0
          UNION ALL
          SELECT d.doc_id, a.root, a.depth + 1
          FROM anc a
          JOIN documents_v d ON d.doc_id = a.doc_id * 2 AND d.doc_id > 0
        )
        SELECT doc_id, root, CAST(depth AS INT) AS depth
        FROM anc
        ORDER BY doc_id""")
    }),

    // LATERAL correlated subquery in FROM (Spark 4 / SQL:1999): per
    // customer, its top-2 orders by price — the "top-N per group
    // through the SQL surface" idiom. What reads as a per-row nested
    // loop DECORRELATES (DecorrelateInnerQuery) into a ranked window
    // over one join — the same shape a17_topk_group builds with the
    // DataFrame API, so the SQL surface costs nothing extra at scale.
    // Identical SQL text runs on DuckDB as the oracle.
    "sql04_lateral_topn" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_v c,
        LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM orders_v o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 2
        ) t
        ORDER BY c.c_custkey, t.o_orderkey""")
    }),

    // O5: speed-vs-time series for the argmax vehicle — Figure_2's
    // data series (main.py:104-110) as an oracle-checked catalog
    // entry; the drill-down chain is all rank-and-filter, no driver
    // round-trip
    "o05_speed_series" -> ((s, d) => {
      val e = enriched(s, d)
      e.join(broadcast(topVehicle(e)), Seq("line", "vehicle"))
        .select(col("vehicle"), date_format(col("ts"), tsFmt).as("ts_s"),
          round(col("speed_kmh"), 6).as("speed_kmh"))
        .orderBy("ts_s")
    }),

    // O6: ordered (lat, lon) trajectory polyline for the same argmax
    // vehicle — the Folium map's data (mapping.py:12-21)
    "o06_trajectory" -> ((s, d) => {
      val e = enriched(s, d)
      e.join(broadcast(topVehicle(e)), Seq("line", "vehicle"))
        .select(col("vehicle"), date_format(col("ts"), tsFmt).as("ts_s"),
          round(lit(52.0) + col("value") / 1000.0, 6).as("lat"),
          round(lit(20.5) + col("value") / 500.0, 6).as("lon"))
        .orderBy("ts_s")
    }),

    // W3: window-function breadth beyond lag/rank — lead, first_value
    // with IGNORE NULLS, last_value / nth_value over the full
    // partition frame, and a RANGE frame (trailing-hour sum keyed on
    // event-time seconds, not row counts)
    "w03_window_breadth" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wRange = Window.partitionBy("user_id").orderBy(col("epoch_s"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .withColumn("first_nonclick",
          first(expr("nullif(event_type, 'click')"), ignoreNulls = true).over(w))
        .withColumn("last_value_all", last(col("value")).over(wFull))
        .withColumn("second_value", nth_value(col("value"), 2).over(wFull))
        .withColumn("hour_sum",
          sum(col("value").cast(DecimalType(18, 2))).over(wRange).cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("next_value"),
          col("first_nonclick"), col("last_value_all"), col("second_value"),
          col("hour_sum"))
        .orderBy("event_id")
    }),

    // A16: full cube over (line, day) with grouping flags — completes
    // the grouping-set family next to a11's rollup
    "a16_cube" -> ((s, d) =>
      Tables.events(s, d)
        .select(trim(col("event_type")).as("line"),
          to_date(col("ts")).cast(StringType).as("d"))
        .cube("line", "d")
        .agg(count(lit(1)).as("n"),
          grouping(col("line")).cast(IntegerType).as("g_line"),
          grouping(col("d")).cast(IntegerType).as("g_d"))
        .select(col("line"), col("d"), col("n"), col("g_line"), col("g_d"))
        // isnull() before the coalesce tiebreak — same rationale as
        // a11_rollup above
        .orderBy(col("g_line"), col("g_d"),
          col("line").isNull, coalesce(col("line"), lit("")),
          col("d").isNull, coalesce(col("d"), lit("")))),

    // A17: top-k per group through the typed Aggregator API with a
    // BOUNDED (≤ k entries) buffer — map-side partials shrink every
    // partition to k rows per group before the exchange, unlike the
    // row_number form that shuffles everything (the oracle IS that
    // row_number form, proving the semantics equal)
    "a17_topk_group" -> ((s, d) => {
      val topk = udaf(new graft.functions.TopKByValue(5),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[graft.functions.TopKByValue.Entry]())
      Tables.events(s, d)
        .groupBy(trim(col("event_type")).as("line"))
        .agg(topk(col("event_id"), col("value")).as("tk"))
        .select(col("line"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("line"), (col("pos") + 1).cast(IntegerType).as("rk"),
          col("e.event_id").as("event_id"), col("e.value").as("value"))
        .orderBy("line", "rk")
    }),

    // Flagship TPC-H-style pricing summary over lineitem (bench
    // headline; exercises A1-A7 at the largest table)
    "q1_pricing" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Tables.dsum(col("l_quantity"), 2).as("sum_qty"),
          Tables.dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          // scale 6, not 4: price·(1−disc)·(1+tax) of 2-dp inputs has
          // exact 6-decimal structure — a 4-dp decimal cast would tie
          Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          (Tables.dsum(col("l_quantity"), 2) / count(col("l_quantity")).cast(DoubleType)).as("avg_qty"),
          (Tables.dsum(col("l_extendedprice"), 2) / count(col("l_extendedprice")).cast(DoubleType)).as("avg_price"),
          (Tables.dsum(col("l_discount"), 4) / count(col("l_discount")).cast(DoubleType)).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  val oracle: Map[String, String] = Map(
    "p01_explode" ->
      "SELECT l_orderkey, l_linenumber, CAST(unnest(generate_series(1, l_linenumber)) AS BIGINT) AS seg FROM lineitem",

    "p02_struct" ->
      "SELECT l_orderkey AS k, l_quantity AS q FROM lineitem",

    "p03_trim" ->
      "SELECT DISTINCT trim(concat('  ', event_type, ' ')) AS line FROM events ORDER BY line",

    "p04_cast" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS uid_str,
        |       CAST(floor(value) AS INT) AS value_int,
        |       TRY_CAST(event_type AS DOUBLE) AS bad_cast
        |FROM events ORDER BY event_id""".stripMargin,

    "p05_to_date" ->
      "SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date FROM events ORDER BY event_date",

    "p06_dropna" ->
      """SELECT event_id, nullif(event_type, 'error') AS etype FROM events
        |WHERE nullif(event_type, 'error') IS NOT NULL ORDER BY event_id""".stripMargin,

    "p07_between" ->
      "SELECT event_id, value FROM events WHERE value BETWEEN 100.0 AND 200.0 ORDER BY event_id",

    "p08_filter_eq" ->
      """SELECT event_id, user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
        |       trim(event_type) AS line
        |FROM events
        |WHERE CAST(CAST(ts AS DATE) AS VARCHAR) = '2024-01-15' AND trim(event_type) <> ''
        |ORDER BY event_id""".stripMargin,

    "p09_nullcount" ->
      """SELECT CAST(sum(CASE WHEN event_type IS NULL OR user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rows,
        |       count(*) AS total_rows FROM events""".stripMargin,

    "p10_when" ->
      """SELECT CASE WHEN value > 300.0 THEN 'high' WHEN value > 100.0 THEN 'mid' ELSE 'low' END AS bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "p11_coalesce" ->
      """SELECT event_id, COALESCE(nullif(event_type, 'click'), 'was_click') AS etype
        |FROM events ORDER BY event_id""".stripMargin,

    "p12_nullif" ->
      """SELECT trim(event_type) AS line,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       count(DISTINCT user_id) AS users,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / nullif(CAST(count(DISTINCT user_id) AS DOUBLE), 0.0) AS value_per_user,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / nullif(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS div0_guard
        |FROM events GROUP BY 1 ORDER BY line""".stripMargin,

    "p13_derived_filter" ->
      """SELECT event_id, round(value * 3.6, 6) AS v36 FROM events
        |WHERE round(value * 3.6, 6) <= 900.0 ORDER BY event_id""".stripMargin,

    "m01_haversine" ->
      s"""WITH $enrichedCte
         |SELECT vehicle, strftime(ts, '$tsFmtSql') AS ts_s, dist_km
         |FROM enriched ORDER BY vehicle, ts_s""".stripMargin,

    "m02_timediff" ->
      s"""WITH $enrichedCte
         |SELECT vehicle, strftime(ts, '$tsFmtSql') AS ts_s, diff_time_sec
         |FROM enriched ORDER BY vehicle, ts_s""".stripMargin,

    "m03_fuel_cost" ->
      s"""WITH $enrichedCte
         |SELECT vehicle, strftime(ts, '$tsFmtSql') AS ts_s,
         |       round(fuel_l, 6) AS fuel_l, round(cost_pln, 6) AS cost_pln
         |FROM enriched ORDER BY vehicle, ts_s""".stripMargin,

    "d01_dedup" ->
      """WITH doubled AS (SELECT * FROM events UNION ALL SELECT * FROM events)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |                               ORDER BY event_id, event_type, value) AS rn
        |  FROM doubled) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "o01_sort" ->
      s"""WITH $silverCte
         |SELECT line, vehicle, value, strftime(ts, '$tsFmtSql') AS ts_s,
         |       CAST(date AS VARCHAR) AS date_s
         |FROM silver ORDER BY line, vehicle, ts_s""".stripMargin,

    "o02_topk" ->
      s"""WITH $reportCte
         |SELECT line, total_cost_pln FROM report2
         |ORDER BY total_cost_pln DESC, line ASC LIMIT 10""".stripMargin,

    "o04_argmax" ->
      s"""WITH $reportCte,
         |top_line AS (
         |  SELECT line, total_cost_pln FROM report2
         |  ORDER BY total_cost_pln DESC, line ASC LIMIT 1
         |),
         |per_vehicle AS (
         |  SELECT e.line, t.total_cost_pln, e.vehicle,
         |         CAST(sum(CAST(e.dist_km AS DECIMAL(18,6))) AS DOUBLE) AS total_v_dist
         |  FROM enriched e JOIN top_line t ON e.line = t.line
         |  GROUP BY e.line, t.total_cost_pln, e.vehicle
         |)
         |SELECT line, total_cost_pln, vehicle, total_v_dist FROM per_vehicle
         |ORDER BY total_v_dist DESC, vehicle ASC LIMIT 1""".stripMargin,

    "a01_report" ->
      s"""WITH $reportCte
         |SELECT * FROM report2 ORDER BY line""".stripMargin,

    "a09_vehicle_agg" ->
      s"""WITH $enrichedCte
         |SELECT vehicle, CAST(sum(CAST(dist_km AS DECIMAL(18,6))) AS DOUBLE) AS total_v_dist
         |FROM enriched WHERE line = 'click' GROUP BY vehicle ORDER BY vehicle""".stripMargin,

    "a10_counts" ->
      s"""WITH $silverCte
         |SELECT raw_rows, silver_rows, raw_rows - silver_rows AS dropped,
         |       round(CAST(raw_rows - silver_rows AS DOUBLE) / CAST(raw_rows AS DOUBLE) * 100.0, 4) AS drop_pct
         |FROM (SELECT count(*) AS raw_rows FROM events) a,
         |     (SELECT count(*) AS silver_rows FROM silver) b""".stripMargin,

    "w01_lag" ->
      s"""WITH $silverCte
         |SELECT vehicle, strftime(ts, '$tsFmtSql') AS ts_s,
         |       lag(value) OVER w AS prev_value,
         |       strftime(lag(ts) OVER w, '$tsFmtSql') AS prev_ts_s,
         |       lag(line) OVER w AS prev_line
         |FROM silver
         |WINDOW w AS (PARTITION BY vehicle ORDER BY ts)
         |ORDER BY vehicle, ts_s""".stripMargin,

    "c01_cache" ->
      s"""WITH $silverCte
         |SELECT line, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM silver GROUP BY line ORDER BY line""".stripMargin,

    "a11_rollup" ->
      """SELECT trim(event_type) AS line, CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
        |       count(*) AS n,
        |       CAST(GROUPING(trim(event_type)) AS INT) AS g_line,
        |       CAST(GROUPING(CAST(CAST(ts AS DATE) AS VARCHAR)) AS INT) AS g_d
        |FROM events
        |GROUP BY ROLLUP(line, d)
        |ORDER BY g_line, g_d, (line IS NULL), COALESCE(line, ''),
        |         (d IS NULL), COALESCE(d, '')""".stripMargin,

    "a12_pivot" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin,

    "a19_unpivot" ->
      """WITH wide AS (
        |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |         CAST(count(*) AS DOUBLE) AS n_events,
        |         CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users,
        |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1
        |)
        |SELECT day, metric, value_d FROM (
        |  SELECT day, 'n_events' AS metric, n_events AS value_d FROM wide
        |  UNION ALL SELECT day, 'n_users', n_users FROM wide
        |  UNION ALL SELECT day, 'sum_value', sum_value FROM wide)
        |ORDER BY day, metric""".stripMargin,

    "a20_grouping_sets" ->
      """SELECT trim(event_type) AS line, CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       CAST(GROUPING(trim(event_type)) AS INT) AS g_line,
        |       CAST(GROUPING(CAST(CAST(ts AS DATE) AS VARCHAR)) AS INT) AS g_d
        |FROM events
        |GROUP BY GROUPING SETS ((line), (d))
        |ORDER BY g_line, g_d, (line IS NULL), COALESCE(line, ''),
        |         (d IS NULL), COALESCE(d, '')""".stripMargin,

    "sql01_text_interface" ->
      """SELECT trim(event_type) AS line, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       count(DISTINCT user_id) AS users
        |FROM events
        |WHERE value BETWEEN 0.0 AND 400.0
        |GROUP BY trim(event_type) ORDER BY line""".stripMargin,

    "sql02_correlated_subquery" ->
      """SELECT o.o_orderkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > 2 * (
        |        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |               / count(*)
        |        FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |  AND EXISTS (
        |        SELECT 1 FROM lineitem l2
        |        WHERE l2.l_orderkey = o.o_orderkey AND l2.l_quantity >= 45)
        |ORDER BY o.o_orderkey""".stripMargin,

    "sql03_recursive_cte" ->
      """WITH RECURSIVE anc(doc_id, root, depth) AS (
        |  SELECT doc_id, doc_id, 0
        |  FROM documents
        |  WHERE doc_id % 2 = 1 OR doc_id = 0
        |  UNION ALL
        |  SELECT d.doc_id, a.root, a.depth + 1
        |  FROM anc a
        |  JOIN documents d ON d.doc_id = a.doc_id * 2 AND d.doc_id > 0
        |)
        |SELECT doc_id, root, CAST(depth AS INT) AS depth
        |FROM anc
        |ORDER BY doc_id""".stripMargin,

    "sql04_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o.o_orderkey, o.o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey
        |  LIMIT 2
        |) t
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin,

    "w02_ranking" ->
      """SELECT event_id, user_id,
        |       rank() OVER w AS value_rank,
        |       dense_rank() OVER w AS value_dense_rank,
        |       row_number() OVER w AS rn,
        |       CAST(sum(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
        |ORDER BY event_id""".stripMargin,

    "q17_small_qty" ->
      """WITH avg_qty AS (
        |  SELECT l_partkey AS p_key,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey
        |)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |       count(*) AS n_lines
        |FROM lineitem JOIN avg_qty ON l_partkey = p_key
        |WHERE l_quantity < avg_qty * 0.5""".stripMargin,

    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS order_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 180.0
        |)
        |SELECT l_orderkey, c_name, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, order_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY order_qty DESC, l_orderkey ASC LIMIT 20""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        |       o_orderpriority,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,

    "q14_promo_share" ->
      """WITH s AS (
        |  SELECT
        |    CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |                       THEN l_extendedprice * (1.0 - l_discount)
        |                       ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |)
        |SELECT round(100.0 * promo_revenue / total_revenue, 6) AS promo_share_pct,
        |       promo_revenue, total_revenue
        |FROM s""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q2_min_cost_supp" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice / l_quantity) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |       round(ps_supplycost, 6) AS supply_cost
        |FROM part, ps, supplier, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size <= 10 AND p_type = 'LARGE'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost)
        |    FROM ps ps2, supplier s2, nation n2, region r2
        |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q20_excess_suppliers" ->
      """WITH recent AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS recent_qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1, 2
        |)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |    SELECT ps_suppkey FROM recent
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |      AND recent_qty > 0.5 * (
        |        SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |        FROM lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey))
        |  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  GROUP BY 1, 2
        |),
        |pairs AS (SELECT l_orderkey, l_suppkey FROM lineitem GROUP BY 1, 2)
        |SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM pairs p
        |              WHERE p.l_orderkey = l1.l_orderkey
        |                AND p.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INT) AS l_year,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer, supplier, nation ns, nation nc
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = ns.n_nationkey AND c_nationkey = nc.n_nationkey
        |  AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2') OR
        |       (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |       round(
        |         CAST(sum(CAST(CASE WHEN ns.n_name = 'NATION_3'
        |           THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) /
        |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
        |         6) AS mkt_share
        |FROM lineitem, part, orders, customer, supplier, nation ns, nation nc, region
        |WHERE l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = ns.n_nationkey
        |  AND c_nationkey = nc.n_nationkey AND nc.n_regionkey = r_regionkey
        |  AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_product_profit" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice / l_quantity) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |             - ps_supplycost * l_quantity, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem, part, ps, supplier, nation, orders
        |WHERE l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |  AND l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q11_important_stock" ->
      """WITH supply AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice / l_quantity) AS cost,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1, 2
        |),
        |part_value AS (
        |  SELECT ps_partkey,
        |         CAST(sum(CAST(round(cost * qty, 4) AS DECIMAL(18,4))) AS DOUBLE) AS value
        |  FROM supply
        |  WHERE ps_suppkey IN (
        |    SELECT s_suppkey FROM supplier, nation
        |    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_5')
        |  GROUP BY 1
        |)
        |SELECT ps_partkey, value FROM part_value
        |WHERE value > 0.001 * (
        |  SELECT CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) FROM part_value)
        |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q12_late_priority" ->
      """SELECT l_linestatus AS ship_class,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 45 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |  GROUP BY c_custkey
        |) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |           AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1
        |)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_part_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT l_partkey, l_suppkey FROM lineitem GROUP BY 1, 2) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |         AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |         AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q22_global_sales" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_acctbal, c_nationkey % 5 AS cntrycode
        |  FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)
        |)
        |SELECT cntrycode, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cust
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal)
        |    FROM cust WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the naive one-reducer global cumsum IS the oracle form (ds05's
    // stance: the engine plan is the scalable two-phase variant)
    "w06_abc_pareto" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |         sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS rev
        |  FROM lineitem GROUP BY 1
        |),
        |c AS (
        |  SELECT l_partkey, rev,
        |         sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |                        ROWS UNBOUNDED PRECEDING) AS cum,
        |         sum(rev) OVER () AS total
        |  FROM rev
        |)
        |SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue,
        |       round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share,
        |       CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.80 THEN 'A'
        |            WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95 THEN 'B'
        |            ELSE 'C' END AS abc_class
        |FROM c ORDER BY revenue DESC, l_partkey ASC""".stripMargin,

    "w05_rank_ratios" ->
      """SELECT event_id, user_id,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume_d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,

    "o05_speed_series" ->
      s"""WITH $reportCte,
         |$topVehicleCte
         |SELECT e.vehicle, strftime(e.ts, '$tsFmtSql') AS ts_s,
         |       round(e.speed_kmh, 6) AS speed_kmh
         |FROM enriched e JOIN top_vehicle v ON e.line = v.line AND e.vehicle = v.vehicle
         |ORDER BY ts_s""".stripMargin,

    "o06_trajectory" ->
      s"""WITH $reportCte,
         |$topVehicleCte
         |SELECT e.vehicle, strftime(e.ts, '$tsFmtSql') AS ts_s,
         |       round(lat2, 6) AS lat, round(lon2, 6) AS lon
         |FROM enriched e JOIN top_vehicle v ON e.line = v.line AND e.vehicle = v.vehicle
         |ORDER BY ts_s""".stripMargin,

    "w03_window_breadth" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, value, ts,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        |  FROM events
        |)
        |SELECT event_id, user_id,
        |       lead(value) OVER wo AS next_value,
        |       first_value(nullif(event_type, 'click') IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nonclick,
        |       last_value(value) OVER wf AS last_value_all,
        |       nth_value(value, 2) OVER wf AS second_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY epoch_s
        |                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM ev
        |WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
        |       wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "a16_cube" ->
      """SELECT trim(event_type) AS line, CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
        |       count(*) AS n,
        |       CAST(GROUPING(trim(event_type)) AS INT) AS g_line,
        |       CAST(GROUPING(CAST(CAST(ts AS DATE) AS VARCHAR)) AS INT) AS g_d
        |FROM events
        |GROUP BY CUBE(line, d)
        |ORDER BY g_line, g_d, (line IS NULL), COALESCE(line, ''),
        |         (d IS NULL), COALESCE(d, '')""".stripMargin,

    "a17_topk_group" ->
      """SELECT line, rk, event_id, value FROM (
        |  SELECT trim(event_type) AS line,
        |         CAST(row_number() OVER (PARTITION BY trim(event_type)
        |              ORDER BY value DESC, event_id ASC) AS INT) AS rk,
        |         event_id, value
        |  FROM events) t
        |WHERE rk <= 5 ORDER BY line, rk""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
