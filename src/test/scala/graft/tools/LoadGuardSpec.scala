package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the host-axis calibration instruments: the bandwidth
  * probe must be memory-bounded (round-12 fix for the round-11
  * ADVICE — an unbounded n × 64 MB allocation could OOM the very
  * bench JVM the probe calibrates) and must degrade to a sentinel
  * instead of throwing. No SparkSession needed.
  */
class LoadGuardSpec extends AnyFunSuite {

  test("bandwidth probe footprint is bounded at 2 GB regardless of core count") {
    // mirror of memBwGbps's sizing: words = min(8 Mi, 256 Mi / n)
    for (n <- Seq(1, 8, 32, 96, 256, 1024)) {
      val words = math.min(8 * 1024 * 1024, (256 * 1024 * 1024) / n)
      val totalBytes = n.toLong * words * 8
      assert(totalBytes <= 2L * 1024 * 1024 * 1024,
        s"footprint unbounded at n=$n: $totalBytes bytes")
      assert(words > 0, s"per-core array vanished at n=$n")
      // per-core stream must stay DRAM-resident (beyond a typical
      // per-core LLC slice) up to very wide hosts, or the probe
      // measures cache, not bandwidth
      if (n <= 256)
        assert(words * 8 >= 8 * 1024 * 1024,
          s"per-core array ${words * 8} B at n=$n fits in LLC — probe " +
            "would measure cache bandwidth")
    }
  }

  test("bandwidth probe runs clean on this host and reports a sane number") {
    // LIVE host-calibration probe (up to 2 GB allocated, a timed
    // all-core DRAM streaming pass) — slow and load-sensitive on a
    // constrained CI host, so it runs only when explicitly requested
    // (round-13 ADVICE: keep the default test run hermetic). The
    // bench tooling exercises it on every sweep regardless.
    assume(sys.env.get("SPARK_GRAFT_HOST_PROBES").contains("1"),
      "live host probe; set SPARK_GRAFT_HOST_PROBES=1 to run")
    val gbps = LoadGuard.memBwGbps()
    // -1 is the declared degraded sentinel; anything else must be a
    // physically plausible DRAM figure (loose band: this box
    // calibrates at 82-85 GB/s; accept wide margins for CI noise)
    assert(gbps == -1.0 || (gbps > 1.0 && gbps < 2000.0),
      s"implausible mem_bw_gbps: $gbps")
  }
}
