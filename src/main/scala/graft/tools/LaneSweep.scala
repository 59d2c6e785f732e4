package graft.tools

import org.apache.spark.sql.SparkSession

/** Lane-vs-lane TIME attribution sweep (round-10 VERDICT item 1).
  *
  * Round 10 flipped the default to ANSI-on and shipped an
  * unattributed ~13% uniform warm regression (56 of 62 common
  * headline queries slower at equal CPU calibration). AnsiProbe
  * proves the two lanes are row-identical; this tool measures the
  * lane's TIME cost — the missing instrument.
  *
  * Protocol: one session, one host, same JVM. Warm both lanes once
  * (JIT, memo frames, persisted indexes), then run the headline set
  * in ABBA lane order (ANSI, preANSI, preANSI, ANSI) so slow host
  * drift cancels between lanes; report min-per-lane per query, the
  * per-query ratio, totals, and the calibration stamps. The heavy
  * index-maintenance entries (dd16/dd17/dd18/st07/st08) are excluded:
  * they are fixture-rebuild-dominated and mutate catalog state, so
  * they measure writes, not lane semantics.
  *
  * Usage: tools/run.sh graft.tools.LaneSweep [sfDir]
  */
object LaneSweep {

  private val excluded = Set(
    "dd16_index_append", "dd17_index_compact", "dd18_index_retention",
    "st07_stream_index_maintain", "st08_stream_exactly_once",
    "st11_selffence_replay",
    // round-12 cycles: same fixture-rebuild/write domination
    "dd19_tombstone_retention", "dd20_auto_compact",
    "sim19_pq_lifecycle", "sim20_tombstone_retention",
    "st13_stream_pq_maintain")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.muteReviewedWindowWarning()

    val names = graft.Bench.headline.filterNot(excluded)

    def setLane(ansiOn: Boolean): Unit = {
      // both knobs, so lane control is explicit whatever the default
      spark.conf.set("spark.graft.ansiLane", ansiOn.toString)
      spark.conf.set("spark.graft.preAnsiLane", (!ansiOn).toString)
      graft.Tables.pin(spark)
    }

    def runAll(): Map[String, Double] = names.map { n =>
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap

    val (load0, loadOk) = LoadGuard.awaitQuiet()
    val calib = LoadGuard.awaitCalibrated()

    // Warm both lanes: JIT + shared memo frames + persisted indexes.
    // Memos are lane-shared by design (AnsiProbe proves row parity),
    // so both timed lanes read the SAME warm state — the residual
    // per-query delta is the lane's own expression-evaluation cost.
    setLane(ansiOn = true); runAll()
    setLane(ansiOn = false); runAll()

    // ABBA: ANSI, preANSI, preANSI, ANSI — min per lane
    setLane(ansiOn = true); val a1 = runAll()
    setLane(ansiOn = false); val b1 = runAll()
    setLane(ansiOn = false); val b2 = runAll()
    setLane(ansiOn = true); val a2 = runAll()

    val ansi = names.map(n => n -> math.min(a1(n), a2(n))).toMap
    val pre = names.map(n => n -> math.min(b1(n), b2(n))).toMap
    val ta = ansi.values.sum
    val tp = pre.values.sum

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(f"lane sweep: n=${names.size} loadavg=$load0%.2f load_ok=$loadOk " +
      f"cpu_ref_ms=${calib.cpuRefMs}%.1f all_core_ms=${calib.cpuRefAllCoreMs}%.1f")
    println(f"ANSI-on total:  $ta%.2f s")
    println(f"pre-ANSI total: $tp%.2f s")
    println(f"ratio (ansi/pre): ${ta / tp}%.3f")
    println("per-query (sorted by ansi/pre ratio desc, >=0.15s in either lane):")
    names.filter(n => ansi(n) >= 0.15 || pre(n) >= 0.15)
      .sortBy(n => -(ansi(n) / math.max(pre(n), 1e-9)))
      .foreach { n =>
        println(f"  $n%-28s ansi=${fmt(ansi(n))}%8s pre=${fmt(pre(n))}%8s " +
          f"ratio=${ansi(n) / math.max(pre(n), 1e-9)}%.3f")
      }
    spark.stop()
  }
}
