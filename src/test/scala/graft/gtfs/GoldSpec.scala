package graft.gtfs

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Geo

/** Ports of the reference's Gold unit tests
  * (/root/reference/tests/test_gold.py) plus haversine property
  * checks from the FIXTURES.md plan. */
class GoldSpec extends SparkSpec {

  import spark.implicits._

  /** make_silver_df analog (tests/test_gold.py:26-42). */
  private def silverDf(rows: Schemas.SilverRecord*): DataFrame =
    spark.createDataFrame(rows)

  private def rec(lines: String, vehicle: String, lat: Double, lon: Double,
      time: String): Schemas.SilverRecord =
    Schemas.SilverRecord(lines, vehicle, lat, lon,
      Timestamp.valueOf(time), Date.valueOf(time.substring(0, 10)))

  test("haversine sanity: Centrum→Praga in (1, 10) km") { // test_gold.py:51-69
    val df = silverDf(
      rec("102", "1000", 52.2297, 21.0122, "2026-02-23 12:00:00"),
      rec("102", "1000", 52.2480, 21.0450, "2026-02-23 12:05:00"))
    val enriched = GoldReport.enrichWithMetrics(df)
    val dist = enriched.orderBy(desc("Time")).select("dist_km").head().getDouble(0)
    assert(dist > 1.0 && dist < 10.0, s"dist=$dist")
  }

  test("report schema contract") { // test_gold.py:77-100
    val df = silverDf(
      rec("102", "1000", 52.2297, 21.0122, "2026-02-23 12:00:00"),
      rec("102", "1000", 52.2480, 21.0450, "2026-02-23 12:05:00"),
      rec("219", "2000", 52.2000, 21.0000, "2026-02-23 12:00:00"))
    val report = GoldReport.createDailyReport(df)
    val expected = Set("Lines", "total_distance_km", "total_cost_pln",
      "avg_speed", "max_recorded_speed", "unique_vehicles_count", "cost_of_1km")
    assert(expected.subsetOf(report.columns.toSet))
    assert(report.count() === 2)
  }

  test("no negative speeds") { // test_gold.py:108-128
    val df = silverDf(
      rec("102", "1000", 52.2297, 21.0122, "2026-02-23 12:00:00"),
      rec("102", "1000", 52.2480, 21.0450, "2026-02-23 12:05:00"),
      rec("102", "1000", 52.2500, 21.0500, "2026-02-23 12:10:00"))
    val enriched = GoldReport.enrichWithMetrics(df)
    assert(enriched.filter(col("speed_kmh") < 0).count() === 0)
  }

  test("speed anomaly cut removes > 70 km/h rows") { // gtfsGold.py:83
    val df = silverDf(
      rec("102", "1000", 52.0, 20.5, "2026-02-23 12:00:00"),
      // ~58 km in 60 s → far above 70 km/h
      rec("102", "1000", 52.4, 21.2, "2026-02-23 12:01:00"))
    val enriched = GoldReport.enrichWithMetrics(df)
    assert(enriched.count() === 1) // only the first (0-speed) ping survives
  }

  test("first ping per vehicle: dist 0, speed 0, null prevs") { // gtfsGold.py:50-54,75-82
    val df = silverDf(rec("102", "1000", 52.2, 21.0, "2026-02-23 12:00:00"))
    val row = GoldReport.enrichWithMetrics(df).head()
    assert(row.getAs[Double]("dist_km") === 0.0)
    assert(row.getAs[Double]("speed_kmh") === 0.0)
    assert(row.getAs[Any]("prev_time") === null)
  }

  test("cost_of_1km guards division by zero") { // gtfsGold.py:103-105
    val df = silverDf(rec("102", "1000", 52.2, 21.0, "2026-02-23 12:00:00"))
    val report = GoldReport.createDailyReport(df)
    assert(report.head().getAs[Any]("cost_of_1km") === null) // 0-distance line
  }

  test("haversine properties: non-negative, symmetric, zero at identity, ≤ πR") {
    val rnd = new scala.util.Random(42)
    val quads = Seq.fill(500)((
      rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180,
      rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180))
    val df = quads.toDF("lat1", "lon1", "lat2", "lon2")
      .withColumn("d", Geo.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .withColumn("dRev", Geo.haversineKm(col("lat2"), col("lon2"), col("lat1"), col("lon1")))
      .withColumn("dSelf", Geo.haversineKm(col("lat1"), col("lon1"), col("lat1"), col("lon1")))
    val rows = df.collect()
    val halfCircumference = math.Pi * 6371.0
    rows.foreach { r =>
      val d = r.getAs[Double]("d")
      assert(d >= 0.0 && d <= halfCircumference + 1e-6)
      assert(math.abs(d - r.getAs[Double]("dRev")) < 1e-9)
      assert(r.getAs[Double]("dSelf") === 0.0)
    }
  }
}
