#!/usr/bin/env python3
"""Round-over-round COLD bench comparison with calibration context.

Usage: python3 tools/cold_compare.py BENCH_COLD_r8.json BENCH_COLD_r9.json

Prints the calibration stamps, the trivial-scan ratio (the host-speed
axis: sub-0.2s queries are scan/startup-bound, so their median ratio
isolates host throughput from code change), and the per-query table of
residual swings after dividing out that trivial-scan ratio — anything
left is attributable to code. Dev-only instrument, not shipped.
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main(a_path, b_path):
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    print(f"{a_path}: total {a['value']:.1f}s n={len(qa)} "
          f"cpu_ref={a.get('cpu_ref_ms','?')} all_core={a.get('cpu_ref_all_core_ms','?')}")
    print(f"{b_path}: total {b['value']:.1f}s n={len(qb)} "
          f"cpu_ref={b.get('cpu_ref_ms','?')} all_core={b.get('cpu_ref_all_core_ms','?')} "
          f"calib_ok={b.get('calib_ok','?')}")
    ratios = {q: qb[q] / qa[q] for q in common if qa[q] > 0 and qb[q] > 0}
    trivial = [r for q, r in ratios.items() if qa[q] < 0.2]
    host = statistics.median(trivial) if trivial else 1.0
    print(f"common queries: {len(common)}; median ratio {statistics.median(ratios.values()):.3f}; "
          f"trivial-scan (<0.2s, n={len(trivial)}) median ratio {host:.3f} ← host axis")
    resid = {q: r / host for q, r in ratios.items()}
    worse = sorted((r, q) for q, r in resid.items() if r > 1.3)
    better = sorted((r, q) for q, r in resid.items() if r < 1 / 1.3)
    print(f"\nresidual (host-normalized) regressions >30%: {len(worse)}")
    for r, q in reversed(worse):
        print(f"  {q:28s} {qa[q]:7.3f}s -> {qb[q]:7.3f}s  resid x{r:.2f}")
    print(f"residual improvements >30%: {len(better)}")
    for r, q in better:
        print(f"  {q:28s} {qa[q]:7.3f}s -> {qb[q]:7.3f}s  resid x{r:.2f}")
    only_b = sorted(set(qb) - set(qa))
    if only_b:
        print(f"\nnew in {b_path}: " + ", ".join(f"{q}={qb[q]:.2f}s" for q in only_b))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
