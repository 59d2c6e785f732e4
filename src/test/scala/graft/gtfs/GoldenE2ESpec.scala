package graft.gtfs

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end golden test over the reference's bundled flagship-day
  * capture (read-only at /root/reference/WAW/year=2026/month=02/day=23:
  * 49 poll files). Asserts the published results the reference's
  * Readme.md:12-16 and docs/images/Figure_1.png pin down, with the
  * measured intermediates from BASELINE.md.
  *
  * Tolerance: the reference's dropDuplicates is nondeterministic for
  * 3 conflicting (VehicleNumber, Time) keys (SURVEY.md §1.4); our
  * deterministic dedup can keep a different payload, perturbing
  * aggregates at ~1e-4 relative → float compares at ≤0.1%.
  */
class GoldenE2ESpec extends SparkSpec {

  private val day23 = "/root/reference/WAW/year=2026/month=02/day=23"
  private val D = LocalDate.of(2026, 2, 23)

  private lazy val available = new java.io.File(day23).isDirectory

  private lazy val silver = {
    val raw = SilverTransform.readBronze(spark, day23)
    SilverTransform.transform(raw, D).cache()
  }
  private lazy val report = GoldReport.createDailyReport(silver).cache()

  private def relErr(got: Double, want: Double) = math.abs(got - want) / want

  test("silver yield matches measured baseline (54,768 rows)") {
    assume(available)
    assert(silver.count() === 54768L)
  }

  test("enriched row count after speed cut (54,667)") {
    assume(available)
    assert(GoldReport.enrichWithMetrics(silver).count() === 54667L)
  }

  test("gold report has 238 line groups") {
    assume(available)
    assert(report.count() === 238L)
  }

  test("most expensive line is 189 at ~135.32 PLN, 30 vehicles") {
    assume(available)
    val top = GoldReport.mostExpensiveLine(report).head()
    assert(top.getAs[String]("Lines") === "189")
    assert(relErr(top.getAs[Double]("total_cost_pln"), 135.32) < 0.001)
    assert(relErr(top.getAs[Double]("total_distance_km"), 69.40) < 0.001)
    assert(top.getAs[Long]("unique_vehicles_count") === 30L)
  }

  test("top-10 lines by cost match Figure_1.png bar-for-bar") {
    assume(available)
    val got = report
      .orderBy(col("total_cost_pln").desc, col("Lines").asc).limit(10)
      .select("Lines", "total_cost_pln").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val want = Seq("189" -> 135.3, "509" -> 102.1, "523" -> 99.8,
      "116" -> 97.8, "186" -> 91.2, "190" -> 86.4, "114" -> 79.3,
      "503" -> 75.6, "136" -> 74.4, "112" -> 73.6)
    assert(got.map(_._1).toSeq === want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 0.05 + w * 0.001, s"cost $g vs $w")
    }
  }

  test("vehicle speed series and trajectory (chart/map data) are well-formed") {
    assume(available)
    val enriched = GoldReport.enrichWithMetrics(silver)
    val top = GoldReport.mostExpensiveLine(report)
    val vehicle = GoldReport.hardestWorkingVehicle(
      GoldReport.lineSlice(enriched, top))
    val series = GoldReport.vehicleSpeedSeries(enriched, vehicle).collect()
    val traj = GoldReport.vehicleTrajectory(enriched, vehicle).collect()
    assert(series.nonEmpty && traj.length === series.length)
    assert(series.forall(r => r.getAs[Double]("speed_kmh") >= 0.0 &&
      r.getAs[Double]("speed_kmh") <= 70.0))
    // trajectory stays inside the silver bbox
    assert(traj.forall { r =>
      val lat = r.getAs[Double]("Lat"); val lon = r.getAs[Double]("Lon")
      lat >= 52.0 && lat <= 52.4 && lon >= 20.5 && lon <= 21.5
    })
  }

  test("hardest-working vehicle on line 189 is #8349 (~5.20 km)") {
    assume(available)
    val enriched = GoldReport.enrichWithMetrics(silver)
    val top = GoldReport.mostExpensiveLine(report)
    val slice = GoldReport.lineSlice(enriched, top)
    val vehicle = GoldReport.hardestWorkingVehicle(slice).head()
    assert(vehicle.getAs[String]("VehicleNumber") === "8349")
    assert(relErr(vehicle.getAs[Double]("total_v_dist"), 5.20) < 0.01)
  }
}
