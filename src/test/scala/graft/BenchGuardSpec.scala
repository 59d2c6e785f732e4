package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench acceptance guard's round-14 upgrades, replayed against
  * the ACTUAL round-13 artifacts that motivated them (VERDICT r13
  * items 3 and 8): the compound-axis ratio must label the band-edge
  * 222-entry warm supplement as degraded, and the phase-split graded
  * ratio must separate host-bandwidth write-phase wobble from a real
  * graded-op regression. Pure-function tests — no SparkSession, no
  * host probes.
  */
class BenchGuardSpec extends AnyFunSuite {

  // BENCH_AXES.json best-ever record at round-13 close
  private val ref = Some(Bench.AxesRef(100.2, 240.3, 90.1))

  test("replayed r13 band-edge capture (BENCH_WARM_r13_final222) annotates as degraded") {
    // that artifact's stamps: all_core 107.1 ms, trivial 255.2 ms,
    // mem_bw 81.3 GB/s — every axis individually inside its 10% band
    // (which is why it shipped axes_ok=true), compounding well past it
    val compound = Bench.axesCompound(ref, 107.1, 255.2, 81.3)
    assert(compound > Bench.AxesTightMax,
      f"band-edge capture reads tight: compound $compound%.3f")
    assert(compound > Bench.AxesCompoundSuspect,
      f"band-edge capture below the suspect threshold: $compound%.3f")
  }

  test("healthy axes compound to ~1 and better-than-best never masks a worse axis") {
    assert(Bench.axesCompound(ref, 100.2, 240.3, 90.1) === 1.0)
    // all_core 8% better, mem_bw 8% worse: the clamp keeps the
    // product at the mem_bw degradation, not a masked 1.0
    val c = Bench.axesCompound(ref, 92.2, 240.3, 90.1 / 1.08)
    assert(math.abs(c - 1.08) < 1e-9, s"mask: $c")
    // missing reference or failed probe (-1) is neutral
    assert(Bench.axesCompound(None, 500.0, 500.0, 1.0) === 1.0)
    assert(Bench.axesCompound(ref, 100.2, 240.3, -1.0) === 1.0)
  }

  test("gating reference is the history median once deep enough; best-ever until then") {
    val best = Some(Bench.AxesRef(94.0, 204.5, 123.3)) // the r14 lucky snapshot
    // the three accepted in-band r14 captures
    val hist = Seq(Bench.AxesRef(98.2, 259.9, 117.9), Bench.AxesRef(94.0, 246.4, 116.2),
      Bench.AxesRef(97.4, 211.0, 114.5))
    assert(Bench.gatingRef(best, hist.take(2)) == best, "shallow history must not gate")
    val g = Bench.gatingRef(best, hist).get
    assert(g == Bench.AxesRef(97.4, 246.4, 116.2), s"component-wise median wrong: $g")
  }

  test("replayed r14 stranding: the lucky-snapshot band rejects a capture the history median accepts") {
    // the session that motivated this: host at all_core 99.2 ms /
    // trivial 227.6 ms / mem_bw 111.5 GB/s — flat against the clean
    // base by direct per-query comparison, yet stranded for an hour
    // by the (94.0, 204.5, 123.3) best-ever snapshot
    val lucky = Some(Bench.AxesRef(94.0, 204.5, 123.3))
    assert(!Bench.axesInBand(lucky, 99.2, 227.6, 111.5),
      "fixture drifted: the lucky band should reject this capture")
    val median = Bench.gatingRef(lucky, Seq(Bench.AxesRef(98.2, 259.9, 117.9),
      Bench.AxesRef(94.0, 246.4, 116.2), Bench.AxesRef(97.4, 211.0, 114.5)))
    assert(Bench.axesInBand(median, 99.2, 227.6, 111.5),
      "history median still strands the healthy capture")
    // and the median reference stays pollution-resistant: a capture
    // 30% degraded on every axis is out of band against it too
    assert(!Bench.axesInBand(median, 99.2 * 1.3, 227.6 * 1.3, 111.5 / 1.3))
  }

  test("graded ratio ignores write-phase wobble but catches a graded-op regression") {
    // prior artifact: dd17 full cycle 10.0 s of which persist+append
    // 8.8 s (the r13 shape), plus a plain query at 2.0 s
    val prior = Map("dd17_index_compact" -> 10.0, "q1_pricing" -> 2.0)
    val priorPhases = Map("dd17" -> Map(
      "persist" -> 1.0, "append" -> 7.8, "compact" -> 0.7, "probe" -> 0.5))
    // current: host-bandwidth wobble inflates the write phases 30%
    // but the graded phases and the plain query are flat
    val wobble = Map("dd17_index_compact" -> 12.64, "q1_pricing" -> 2.0)
    val wobblePhases = Map("dd17" -> Map(
      "persist" -> 1.3, "append" -> 10.14, "compact" -> 0.7, "probe" -> 0.5))
    val rWobble = Bench.gradedCommonRatio(wobble, prior, wobblePhases, priorPhases)
    assert(math.abs(rWobble - 1.0) < 1e-9,
      f"write wobble leaked into the graded ratio: $rWobble%.3f")
    // raw common ratio WOULD have read this as a 22% regression —
    // the round-13 driver-sweep rejection shape
    val rawRatio = (12.64 + 2.0) / (10.0 + 2.0)
    assert(rawRatio > 1.10)
    // current: write phases flat, but compact+probe double — a real
    // code regression the guard must still see
    val regressed = Map("dd17_index_compact" -> 11.2, "q1_pricing" -> 2.0)
    val regressedPhases = Map("dd17" -> Map(
      "persist" -> 1.0, "append" -> 7.8, "compact" -> 1.4, "probe" -> 1.0))
    val rBad = Bench.gradedCommonRatio(regressed, prior, regressedPhases, priorPhases)
    assert(rBad > 1.10, f"graded-op regression missed: $rBad%.3f")
  }

  test("graded ratio falls back to full wall when either side lacks phase rows") {
    val prior = Map("dd17_index_compact" -> 10.0)
    val cur = Map("dd17_index_compact" -> 10.5)
    val phases = Map("dd17" -> Map("probe" -> 0.5))
    val r = Bench.gradedCommonRatio(cur, prior, phases, Map.empty)
    assert(math.abs(r - 1.05) < 1e-9, s"one-sided phase rows must not mix lanes: $r")
  }

  test("extractPhases round-trips the artifact's nested phases object") {
    val json = """{"value":1.0,"queries":{"a":1.0},"phases":{"dd17":{"persist":3.11,"probe":0.41},"st08":{"maintain0":1.74}},"sf":"x"}"""
    val p = Bench.extractPhases(json)
    assert(p == Map(
      "dd17" -> Map("persist" -> 3.11, "probe" -> 0.41),
      "st08" -> Map("maintain0" -> 1.74)))
    assert(Bench.extractPhases("""{"value":1.0}""") == Map.empty)
  }

  test("mid-sweep windows catch the in-flight bandwidth wave a start snapshot blesses") {
    // the round-16 shape: start gate passed at a healthy baseline,
    // then the host's band collapsed mid-sweep (SCALE_NOTES records
    // 13.8–113.9 GB/s waves; the polluted driver sweep landed 1.185
    // with compound 1.012 at start). Windows at the observed polluted
    // levels must fail the gate...
    val base = 113.0
    assert(!Bench.midWindowsOk(base, 230.0,
      bws = Seq(110.2, 67.8, 13.8), trivials = Seq(231.0, 240.0, 228.0)),
      "a 13.8–68 GB/s mid-sweep band must label the sweep degraded")
    // ...while healthy wobble (observed ≥0.78× of baseline on clean
    // sessions) passes with margin
    assert(Bench.midWindowsOk(base, 230.0,
      bws = Seq(108.0, 91.5, 112.7), trivials = Seq(225.0, 244.0, 251.0)))
    // a trivial-scan blowup alone is also a degraded window
    assert(!Bench.midWindowsOk(base, 230.0,
      bws = Seq(110.0), trivials = Seq(230.0 * 1.7)))
    // failed probes (-1) and a missing baseline degrade to the start
    // snapshot instead of blocking the sweep
    assert(Bench.midWindowsOk(base, 230.0, bws = Seq(-1.0), trivials = Seq(-1.0)))
    assert(Bench.midWindowsOk(-1.0, -1.0, bws = Seq(13.8), trivials = Seq(999.0)))
    // and an empty window list (short sweep) passes vacuously
    assert(Bench.midWindowsOk(base, 230.0, Nil, Nil))
  }
}
