#!/usr/bin/env python3
"""Per-query scale exponents between two soak Bench JSONs.

Usage: python3 dev/soak_alpha.py <bench_small.json> <Nsmall> <bench_big.json> <Nbig>

alpha = ln(t_big / t_small) / ln(Nbig / Nsmall) per query; alpha < 1 is
sub-linear. Prints the table sorted by alpha descending plus summary
stats. Both inputs must be the same core-count convention (soaks run
SPARK_GRAFT_CPUS=32 — see .claude/skills/verify/SKILL.md).
"""
import json
import math
import statistics
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    n_small = float(sys.argv[2])
    bigj = json.load(open(sys.argv[3]))
    big = bigj["queries"]
    n_big = float(sys.argv[4])
    ratio = n_big / n_small
    rows = []
    for q, tb in sorted(big.items()):
        ts = small.get(q)
        if ts is None or ts <= 0 or tb <= 0:
            continue
        alpha = math.log(tb / ts) / math.log(ratio)
        rows.append((alpha, q, ts, tb))
    rows.sort(reverse=True)
    print(f"{'query':35s} {'t_small':>8s} {'t_big':>8s} {'alpha':>7s}")
    for alpha, q, ts, tb in rows:
        print(f"{q:35s} {ts:8.3f} {tb:8.3f} {alpha:7.2f}")
    alphas = [r[0] for r in rows]
    print(f"\n{len(rows)} queries; alpha median {statistics.median(alphas):.2f}, "
          f"max {max(alphas):.2f}, superlinear (>1.0): "
          f"{sum(1 for a in alphas if a > 1.0)}")
    fails = bigj.get("failures", 0)
    print(f"big-run failures: {fails}; total {bigj.get('value', 0):.1f}s; "
          f"floor {bigj.get('floor_sec', 0):.3f}s")
    # VOLUME CHECK (r11 verdict item 8): alpha is only meaningful on
    # exactly-proportional replicas — assert every reported volume
    # metric scales by the declared factor within 1%, loudly otherwise.
    vs = json.load(open(sys.argv[1])).get("volume")
    vb = bigj.get("volume")
    if vs and vb:
        bad = []
        for k in sorted(set(vs) & set(vb)):
            if vs[k] <= 0:
                continue
            r = vb[k] / vs[k]
            ok = abs(r / ratio - 1) <= 0.01
            print(f"volume {k}: x{r:.4f} (declared x{ratio:.1f}) "
                  f"{'OK' if ok else '*** OUT OF BAND ***'}")
            if not ok:
                bad.append(k)
        if bad:
            print(f"*** VOLUME CHECK FAILED for {bad}: the replicas are NOT "
                  f"volume-proportional — alpha values above are workload-"
                  f"confounded (the r11 generator-inflation trap). ***")
    else:
        print("volume check: not available (legacy artifact without a "
              "'volume' block — pre-r12 Bench)")


if __name__ == "__main__":
    main()
