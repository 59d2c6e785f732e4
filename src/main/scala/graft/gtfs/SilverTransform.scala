package graft.gtfs

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze → Silver: read the raw poll files, explode the envelope,
  * project/clean/filter/dedup into the flat typed Silver table.
  * Reference: /root/reference/gtfstransformerSilver.py.
  *
  * Scale-posture deviations from the reference, semantics preserved
  * (SURVEY.md §7.6):
  *   - drop-rate diagnostics ride along as `Dataset.observe` metrics
  *     instead of two eager `count()` actions that each re-scan the
  *     JSON (gtfstransformerSilver.py:29,49);
  *   - deduplication is the deterministic `row_number` form rather
  *     than arbitrary-row `dropDuplicates` (3 conflicting keys exist
  *     in the real feed, SURVEY.md §1.4);
  *   - the cosmetic global sort (gtfstransformerSilver.py:46) is
  *     off by default — a full range-shuffle that nothing downstream
  *     needs (windows re-sort per partition); enable via `sorted=true`
  *     for byte-parity with the reference's output order.
  */
object SilverTransform {

  /** JSON batch scan with the fixed nested schema, multiline (S5).
    * Spark globs natively — pass a directory, a glob, or a
    * Hive-partitioned root (year=/month=/day=); reading the partition
    * root lets partition pruning replace the reference's manual
    * `glob.glob` path construction (main.py:50-53, SURVEY.md §4).
    */
  def readBronze(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType = Schemas.bronzeSchema): DataFrame = {
    graft.Tables.pin(spark)
    spark.read
      .option("multiline", "true")
      .schema(schema)
      .json(path)
  }

  /** Layout-evolution scan: declares the live feed's 6th field
    * `Brigade` ([[Schemas.bronzeSchemaV2]]) so one read spans old
    * 5-field and new 6-field bronze files — old files surface a null
    * Brigade (JSON schema-on-read), new files carry the value. Pair
    * with `transform(..., carryCols = Seq("Brigade"))` to keep the
    * column through silver without widening the contract's null
    * gate. */
  def readBronzeEvolved(spark: SparkSession, path: String): DataFrame =
    readBronze(spark, path, Schemas.bronzeSchemaV2)

  /** The Silver transform (gtfstransformerSilver.py:28-46):
    * explode → project/trim/cast/to_date → dropna → bbox → date ==
    * processingDate → Lines ≠ "" → dedup(VehicleNumber, Time) → sort.
    *
    * @param processingDate the reference uses `current_date()`
    *        (gtfstransformerSilver.py:43) — parameterized here so
    *        historical captures are processable; defaults to today in
    *        UTC (the pinned session zone — a JVM-local-zone default
    *        would silently mismatch `to_date` near midnight).
    * @param carryCols extra envelope fields carried through silver
    *        as nullable strings (layout evolution, e.g. `Brigade`).
    *        Carried columns are OUTSIDE the contract's null gate —
    *        an old-layout row with a null carried value survives —
    *        and are appended to the dedup tiebreak so the surviving
    *        duplicate stays deterministic.
    */
  def transform(
      raw: DataFrame,
      processingDate: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC),
      sorted: Boolean = false,
      carryCols: Seq[String] = Nil): DataFrame = {
    val exploded = raw.select(explode(col("result")).as("v")) // P1
    val projected = exploded.select(Seq( // P2-P5
      trim(col("v.Lines")).as("Lines"),
      trim(col("v.VehicleNumber")).as("VehicleNumber"),
      col("v.Lat").cast(DoubleType).as("Lat"),
      col("v.Lon").cast(DoubleType).as("Lon"),
      // try_cast ≡ the reference's pre-ANSI cast (malformed → null,
      // swept by dropna) in BOTH lanes — a plain cast throws under
      // the ANSI lane (AnsiLaneSpec); date derives from the same
      // parsed timestamp (to_date of a TIMESTAMP never throws),
      // identical to to_date(string) wherever the string parses
      expr("try_cast(v.Time AS TIMESTAMP)").as("Time"),
      to_date(expr("try_cast(v.Time AS TIMESTAMP)")).as("date")) ++
      carryCols.map(c => col(s"v.$c").cast(StringType).as(c)): _*)
    val cleaned = projected
      // P6 — sweeps failed casts; restricted to the contract columns
      // so a null CARRIED value (old-layout file) is not a drop
      .na.drop("any", Schemas.silverColumns)
      .filter(col("Lat").between(Schemas.LatMin, Schemas.LatMax) &&
        col("Lon").between(Schemas.LonMin, Schemas.LonMax)) // P7
      .filter(col("date") === lit(java.sql.Date.valueOf(processingDate))) // P8
      .filter(col("Lines") =!= "") // P8
    // D1, deterministic form (SURVEY.md §7.5 item 3)
    val w = Window.partitionBy("VehicleNumber", "Time")
      .orderBy(("Lines" +: "Lat" +: "Lon" +: carryCols).map(col): _*)
    val deduped = cleaned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val out = if (sorted) deduped.orderBy("Lines", "VehicleNumber", "Time") // O1
    else deduped
    // A10 as streaming-friendly observe metrics, not eager counts
    out.observe("silver_metrics", count(lit(1)).as("rows_kept"))
  }

  /** Parquet sink, overwrite, partitioned by date (S6,
    * gtfstransformerSilver.py:59-60). */
  def saveSilver(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy("date").parquet(path)
}
