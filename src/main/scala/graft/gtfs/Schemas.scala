package graft.gtfs

import org.apache.spark.sql.types._

/** Bronze/Silver schema contracts for the Warsaw GTFS-RT feed.
  *
  * The Bronze read schema is fixed and explicitly declared — no
  * inference — matching /root/reference/gtfstransformerSilver.py:12-25.
  * The live feed carries a 6th field `Brigade` in every record which
  * the declared schema intentionally projects away at the scan
  * (schema-on-read column pruning, SURVEY.md §1.3).
  */
object Schemas {

  /** One vehicle position record inside the `result` envelope. */
  val busSchema: StructType = StructType(Seq(
    StructField("Lines", StringType), // "102".."523", "L-8", "L31", ...
    StructField("VehicleNumber", StringType), // e.g. "1000", "8349"
    StructField("Lat", DoubleType),
    StructField("Lon", DoubleType),
    StructField("Time", StringType))) // "yyyy-MM-dd HH:mm:ss", zone-less

  /** Layout-evolution variant: the live feed's 6th field `Brigade`
    * (SURVEY.md §1.3) declared instead of projected away. Old
    * 5-field files read under this schema yield null Brigade —
    * JSON schema-on-read absorbs the layout drift, so one scan
    * spans both generations of bronze files. */
  val busSchemaV2: StructType =
    busSchema.add(StructField("Brigade", StringType))

  /** Envelope for [[busSchemaV2]]. */
  val bronzeSchemaV2: StructType = StructType(Seq(
    StructField("result", ArrayType(busSchemaV2))))

  /** Poll-file envelope: {"result": [ {bus}, ... ]}
    * (gtfstransformerSilver.py:20-22). */
  val bronzeSchema: StructType = StructType(Seq(
    StructField("result", ArrayType(busSchema))))

  /** Silver contract (tests/test_silver.py:142-144; types per
    * tests/test_gold.py:34-41). */
  val silverColumns: Seq[String] =
    Seq("Lines", "VehicleNumber", "Lat", "Lon", "Time", "date")

  /** Typed Silver row for Dataset[SilverRecord] consumers. */
  final case class SilverRecord(
      Lines: String,
      VehicleNumber: String,
      Lat: Double,
      Lon: Double,
      Time: java.sql.Timestamp,
      date: java.sql.Date)

  /** Warsaw bounding box (gtfstransformerSilver.py:42; Readme.md:147). */
  val LatMin = 52.0
  val LatMax = 52.4
  val LonMin = 20.5
  val LonMax = 21.5
}
