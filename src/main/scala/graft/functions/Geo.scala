package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic helpers as native Catalyst column-expression builders (no
  * UDFs), mirroring the reference's `_haversine_distance` — a function
  * `Column×4 → Column` building an expression tree, not a UDF
  * (/root/reference/gtfsGold.py:23-34). Everything here stays inside
  * whole-stage codegen.
  *
  * Determinism note (SURVEY.md §7.3): we expand `radians(x)` to
  * `x * (π/180)` with an explicit double literal and `pow(s,2)` to
  * `s*s`, because `java.lang.Math.toRadians` computes `x/180*π` while
  * other engines (e.g. the DuckDB oracle) compute `x*(π/180)` — a
  * last-ulp difference that would leak through rounding. With
  * identical expression shapes, only the libm `sin/cos/atan2` calls
  * can differ, by ≤1 ulp, which a 6-dp round absorbs.
  */
object Geo {

  /** Closest double to π/180 (== Math.PI / 180.0). */
  val DegToRad = 0.017453292519943295

  /** 2 × mean Earth radius (6371.0 km) — reference R at gtfsGold.py:24. */
  val EarthDiameterKm = 12742.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * inputs in degrees. Null if any input is null (first ping per
    * vehicle after a window lag — callers coalesce to 0.0, P11).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = (lat2 - lat1) * DegToRad
    val dLon = (lon2 - lon1) * DegToRad
    val sLat = sin(dLat / 2)
    val sLon = sin(dLon / 2)
    val a = sLat * sLat + cos(lat1 * DegToRad) * cos(lat2 * DegToRad) * (sLon * sLon)
    lit(EarthDiameterKm) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** The same formula as ANSI SQL text (DuckDB-compatible), kept
    * textually parallel to [[haversineKm]] so both engines build the
    * same IEEE expression tree. Arguments are SQL sub-expressions.
    */
  def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val dLat = s"(($lat2 - $lat1) * 0.017453292519943295)"
    val dLon = s"(($lon2 - $lon1) * 0.017453292519943295)"
    val sLat = s"sin($dLat / 2)"
    val sLon = s"sin($dLon / 2)"
    val a = s"($sLat * $sLat + cos($lat1 * 0.017453292519943295) * cos($lat2 * 0.017453292519943295) * ($sLon * $sLon))"
    s"(12742.0 * atan2(sqrt($a), sqrt(1.0 - $a)))"
  }
}
