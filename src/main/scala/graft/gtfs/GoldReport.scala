package graft.gtfs

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Silver → Gold: per-ping enrichment (haversine segment distance,
  * fuel, cost, speed), the daily per-line report, and the
  * most-expensive-line / hardest-working-vehicle drill-down.
  * Reference: /root/reference/gtfsGold.py.
  *
  * Scale-posture deviations, semantics preserved (SURVEY.md §7.6):
  * the argmax drill-downs replace the reference's sort + `first()`
  * driver round-trips (gtfsGold.py:110-126) with rank-and-filter
  * plans that stay distributed, and the analysis slice reuses one
  * enriched frame instead of re-enriching (C2, gtfsGold.py:119).
  */
object GoldReport {

  /** Fuel defaults from the reference config (.env.example:7-8). */
  val DefaultFuelLPer100Km = 30.0
  val DefaultFuelPricePln = 6.5

  /** GPS-glitch anomaly cut (gtfsGold.py:83; Readme.md:146). */
  val MaxSpeedKmh = 70.0

  /** Data-quality check (gtfsGold.py:17-21): count of rows with null
    * Lines or VehicleNumber. The reference's version is annotated
    * `-> DataFrame` but returns None; here it really returns the
    * one-row count frame. */
  def checkDataQuality(silver: DataFrame): DataFrame =
    silver.select(
      sum(when(col("Lines").isNull || col("VehicleNumber").isNull, 1L)
        .otherwise(0L)).as("null_key_rows"),
      count(lit(1)).as("total_rows"))

  /** Per-ping enrichment (gtfsGold.py:36-85): window lag ×3 →
    * haversine (null → 0.0 on first ping) → fuel/cost → Δt →
    * guarded speed → speed ≤ 70 anomaly cut. */
  def enrichWithMetrics(
      silver: DataFrame,
      fuelLPer100Km: Double = DefaultFuelLPer100Km,
      fuelPricePln: Double = DefaultFuelPricePln): DataFrame =
    metricsFromPrevs(attachPrevs(silver), fuelLPer100Km, fuelPricePln)

  /** Batch prev-ping attachment: window lag ×3 (W1+W2). The
    * streaming path attaches the same three columns from GroupState
    * instead (streaming/Streams.enrichedStream) so segments survive
    * micro-batch boundaries; both feed [[metricsFromPrevs]]. */
  def attachPrevs(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy("VehicleNumber").orderBy("Time") // W1
    silver
      .withColumn("prev_lat", lag(col("Lat"), 1).over(w)) // W2
      .withColumn("prev_lon", lag(col("Lon"), 1).over(w))
      .withColumn("prev_time", lag(col("Time"), 1).over(w))
  }

  /** Metric derivation from attached prev columns — the single code
    * path for batch and streaming enrichment. */
  def metricsFromPrevs(
      withPrevs: DataFrame,
      fuelLPer100Km: Double = DefaultFuelLPer100Km,
      fuelPricePln: Double = DefaultFuelPricePln): DataFrame =
    withPrevs
      .withColumn("dist_km", coalesce( // M1 + P11
        Geo.haversineKm(col("prev_lat"), col("prev_lon"), col("Lat"), col("Lon")),
        lit(0.0)))
      .withColumn("fuel_l", col("dist_km") / 100.0 * fuelLPer100Km) // M3
      .withColumn("cost_pln", col("fuel_l") * fuelPricePln)
      .withColumn("diff_time_sec", // M2
        unix_timestamp(col("Time")) - unix_timestamp(col("prev_time")))
      .withColumn("speed_kmh", // P10
        when(col("diff_time_sec") > 0,
          col("dist_km") / col("diff_time_sec") * 3600.0).otherwise(0.0))
      .filter(col("speed_kmh") <= MaxSpeedKmh) // P13

  /** Daily per-line report (gtfsGold.py:89-108): quality gate +
    * enrich + groupBy(Lines) with 8 aggregates, desc-cost order,
    * cost_of_1km derived column. */
  def createDailyReport(
      silver: DataFrame,
      fuelLPer100Km: Double = DefaultFuelLPer100Km,
      fuelPricePln: Double = DefaultFuelPricePln): DataFrame =
    reportFromEnriched(enrichWithMetrics(silver, fuelLPer100Km, fuelPricePln))
      .orderBy(col("total_cost_pln").desc) // O2 (gtfsGold.py:103)

  /** The report aggregation over an already-enriched frame, with
    * configurable grouping keys. No ordering — the reference's desc
    * sort belongs to the batch report consumer (createDailyReport);
    * embedding it here would cost the streaming hot path a discarded
    * range shuffle every micro-batch. */
  def reportFromEnriched(
      enriched: DataFrame,
      groupKeys: Seq[String] = Seq("Lines")): DataFrame = {
    enriched
      .groupBy(groupKeys.map(col): _*) // A1
      .agg(
        sum(col("dist_km")).as("total_distance_km"), // A2
        sum(col("cost_pln")).as("total_cost_pln"),
        max(col("dist_km")).as("max_segment_km"), // A3
        count(col("VehicleNumber")).as("data_points_count"), // A4
        avg(col("speed_kmh")).as("avg_speed"), // A5 (keeps 0.0 first pings)
        max(col("speed_kmh")).as("max_recorded_speed"),
        countDistinct(col("VehicleNumber")).as("unique_vehicles_count"), // A6
        (sum(col("dist_km")) / countDistinct(col("VehicleNumber")))
          .as("avg_dist_per_vehicle")) // A7
      .withColumn("cost_of_1km", // A8 + P12
        expr("total_cost_pln / nullif(total_distance_km, 0.0)"))
  }

  /** MERGEABLE per-group partial aggregates for incremental (per
    * micro-batch) gold: only columns a reader can fold across
    * partials — sums and counts add, maxes take max; derive
    * avg_speed = sum_speed_kmh / data_points_count and cost_of_1km =
    * total_cost_pln / total_distance_km AFTER folding. Exact distinct
    * vehicle counts are deliberately absent: they are not mergeable
    * without a sketch, and emitting them per batch invites silent
    * double counting. */
  def partialReportFromEnriched(
      enriched: DataFrame,
      groupKeys: Seq[String]): DataFrame =
    enriched
      .groupBy(groupKeys.map(col): _*)
      .agg(
        sum(col("dist_km")).as("total_distance_km"),
        sum(col("cost_pln")).as("total_cost_pln"),
        max(col("dist_km")).as("max_segment_km"),
        count(col("VehicleNumber")).as("data_points_count"),
        sum(col("speed_kmh")).as("sum_speed_kmh"),
        max(col("speed_kmh")).as("max_recorded_speed"))

  /** The most expensive line of the report (gtfsGold.py:110-117),
    * as a 1-row frame — no driver `first()` round-trip; total order
    * with a tie-break on Lines. */
  def mostExpensiveLine(report: DataFrame): DataFrame =
    report.orderBy(col("total_cost_pln").desc, col("Lines").asc).limit(1)

  /** Enriched analysis slice for one line (gtfsGold.py:115-119) —
    * reuses an already-enriched frame via a broadcast semi join
    * rather than re-running the enrichment (fixes C2). */
  def lineSlice(enriched: DataFrame, topLine: DataFrame): DataFrame =
    enriched.join(broadcast(topLine.select("Lines")), Seq("Lines"), "left_semi")

  /** Hardest-working vehicle within a line slice (gtfsGold.py:120-126):
    * per-vehicle total distance, argmax with vehicle tie-break. */
  def hardestWorkingVehicle(lineSlice: DataFrame): DataFrame =
    lineSlice
      .groupBy("VehicleNumber") // A9
      .agg(sum(col("dist_km")).as("total_v_dist"))
      .orderBy(col("total_v_dist").desc, col("VehicleNumber").asc) // O4
      .limit(1)

  /** Speed-vs-time series for one vehicle — the data behind the
    * reference's seaborn line chart (Figure_2; main.py:104-110).
    * Chart rendering is presentation-layer and out of engine scope
    * (SURVEY §2.1 S9); this emits the exact series it plots. */
  def vehicleSpeedSeries(enriched: DataFrame, vehicle: DataFrame): DataFrame =
    enriched
      .join(broadcast(vehicle.select("VehicleNumber")), Seq("VehicleNumber"), "left_semi")
      .select(col("VehicleNumber"), col("Time"), col("speed_kmh"))
      .orderBy("Time")

  /** Ordered (Lat, Lon) trajectory for one vehicle — the polyline the
    * reference's Folium map draws (mapping.py:12-21). */
  def vehicleTrajectory(enriched: DataFrame, vehicle: DataFrame): DataFrame =
    enriched
      .join(broadcast(vehicle.select("VehicleNumber")), Seq("VehicleNumber"), "left_semi")
      .select(col("VehicleNumber"), col("Time"), col("Lat"), col("Lon"))
      .orderBy("Time")

  /** Parquet sink for Gold (S7). The reference's `save_gold` would
    * throw — it partitions by a `date` column the report doesn't
    * carry (gtfsGold.py:136-137, latent bug; never called from
    * main.py). Fixed per SURVEY.md §7.7: carry a report_date column
    * and partition by it. */
  def saveGold(report: DataFrame, path: String, reportDate: java.time.LocalDate): Unit =
    report
      .withColumn("date", lit(java.sql.Date.valueOf(reportDate)))
      .write.mode(SaveMode.Overwrite).partitionBy("date").parquet(path)
}
