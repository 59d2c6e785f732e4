package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Drives the Structured Streaming GTFS variant end to end: bronze
  * JSON files appear in a directory, `readStream` picks them up, the
  * silver stream cleans + watermark-dedups, and a windowed aggregate
  * emits per-line stats — all through a real StreamingQuery
  * (memory sink, processAllAvailable).
  */
class StreamingSpec extends SparkSpec {

  private def writeBronze(dir: String, name: String, records: String*): Unit = {
    val body = s"""{"result": [${records.mkString(", ")}]}"""
    Files.write(Paths.get(dir, name), body.getBytes(StandardCharsets.UTF_8))
  }

  private def rec(lines: String, vehicle: String, lat: Double, lon: Double,
      time: String): String =
    s"""{"Lines": "$lines", "VehicleNumber": "$vehicle", "Lat": $lat, "Lon": $lon, "Time": "$time", "Brigade": "1"}"""

  test("streaming silver dedups across micro-batches and filters bbox") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // file 1: two good records (one duplicated), one Kraków outlier
    writeBronze(dir, "b1.json",
      rec("102", "1000", 52.2, 21.0, "2026-02-23 12:00:00"),
      rec("102", "1000", 52.2, 21.0, "2026-02-23 12:00:00"),
      rec("102", "9999", 50.06, 19.94, "2026-02-23 12:00:10"))
    // file 2: same (vehicle, time) again — cross-batch duplicate — plus a new ping
    writeBronze(dir, "b2.json",
      rec("102", "1000", 52.2, 21.0, "2026-02-23 12:00:00"),
      rec("102", "1000", 52.21, 21.01, "2026-02-23 12:00:15"))

    val silver = Streams.silverStream(Streams.bronzeStream(spark, dir))
    val q = silver.writeStream
      .format("memory").queryName("silver_out").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("silver_out").collect()
      // 1000@12:00:00 once (deduped within AND across batches),
      // 1000@12:00:15 once; Kraków dropped
      assert(rows.length === 2, rows.mkString("; "))
      assert(rows.map(_.getAs[String]("VehicleNumber")).toSet === Set("1000"))
    } finally q.stop()
  }

  test("flatMapGroupsWithState segments trips across micro-batches") {
    val dir = Files.createTempDirectory("graft-trips").toString
    // batch 1: two pings 10 min apart (same trip)
    writeBronze(dir, "b1.json",
      rec("189", "8349", 52.2, 21.0, "2026-02-23 08:00:00"),
      rec("189", "8349", 52.21, 21.01, "2026-02-23 08:10:00"))
    // batch 2 (same dir, later file): a ping 3 h later → closes trip 1
    writeBronze(dir, "b2.json",
      rec("189", "8349", 52.25, 21.05, "2026-02-23 11:10:00"))

    // one file per micro-batch → the gap is detected ACROSS batches,
    // exercising the cross-batch GroupState
    val silver = Streams.silverStream(Streams.bronzeStream(spark, dir, maxFilesPerTrigger = 1))
    val trips = Streams.tripSegments(silver, gapSec = 1800)
    val q = trips.writeStream
      .format("memory").queryName("trips_out").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("trips_out").collect()
      assert(rows.length === 1, rows.mkString("; "))
      val t = rows.head
      assert(t.getAs[String]("VehicleNumber") === "8349")
      assert(t.getAs[Int]("pings") === 2)
      assert(t.getAs[java.sql.Timestamp]("trip_start").toString === "2026-02-23 08:00:00.0")
      assert(t.getAs[java.sql.Timestamp]("trip_end").toString === "2026-02-23 08:10:00.0")
    } finally q.stop()
  }

  test("gold refresh counts segments that span micro-batch boundaries") {
    val dir = Files.createTempDirectory("graft-gold-src").toString
    val out = Files.createTempDirectory("graft-gold-out").toString
    val ckpt = Files.createTempDirectory("graft-gold-ckpt").toString
    writeBronze(dir, "b1.json",
      rec("189", "8349", 52.2, 21.0, "2026-02-23 08:00:00"),
      rec("189", "8349", 52.21, 21.01, "2026-02-23 08:10:00"))
    // same vehicle continues in the NEXT micro-batch: the 08:10→09:00
    // segment must be attributed (GroupState prevs, not per-batch lag)
    writeBronze(dir, "b2.json",
      rec("189", "8349", 52.25, 21.05, "2026-02-23 09:00:00"))

    val silver = Streams.silverStream(Streams.bronzeStream(spark, dir, maxFilesPerTrigger = 1))
    val q = Streams.goldRefresh(silver, s"$out/gold", s"$ckpt/cp")
    try {
      q.processAllAvailable()
      val gold = spark.table("parquet.`" + out + "/gold`")
      val rows = gold.select("batch_id", "Lines", "total_distance_km").collect()
        .map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(rows.map(_._1).distinct.length === 2, rows.mkString("; "))
      assert(rows.forall(_._2 === "189"))
      // batch 2 holds exactly the cross-batch segment (~5 km);
      // a per-batch lag window would have zeroed it
      val lastBatchDist = rows.last._3
      assert(lastBatchDist > 4.0 && lastBatchDist < 7.0, rows.mkString("; "))
    } finally q.stop()
  }

  test("streaming windowed per-line stats emit after watermark") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    writeBronze(dir, "b1.json",
      rec("189", "8349", 52.2, 21.0, "2026-02-23 12:00:00"),
      rec("189", "8350", 52.21, 21.01, "2026-02-23 12:05:00"),
      rec("523", "7000", 52.22, 21.02, "2026-02-23 12:10:00"))
    // late-arriving file advances the watermark past the first window
    writeBronze(dir, "b2.json",
      rec("189", "8349", 52.2, 21.0, "2026-02-23 13:00:00"))

    val silver = Streams.silverStream(Streams.bronzeStream(spark, dir), "5 minutes")
    val stats = Streams.lineWindowStats(silver, "15 minutes")
    val q = stats.writeStream
      .format("memory").queryName("stats_out").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("stats_out").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
          r.getAs[String]("Lines"), r.getAs[Long]("pings"), r.getAs[Long]("vehicles")))
        .sortBy(r => (r._1, r._2))
      // the 12:00 windows are closed by the 13:00 watermark advance
      assert(rows.contains(("2026-02-23 12:00:00.0", "189", 2L, 2L)), rows.mkString("; "))
      assert(rows.contains(("2026-02-23 12:00:00.0", "523", 1L, 1L)), rows.mkString("; "))
    } finally q.stop()
  }
}
