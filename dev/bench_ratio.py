#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB ratio table.

Usage: python3 dev/bench_ratio.py <bench_json> <sfdir> <oracle_sql.json>

Reads a Bench JSON artifact (steady medians + cold column), times each
oracle SQL in DuckDB (median of 3) on the same parquet, and prints a
ratio table so per-query regressions are attributable (VERDICT r1
next-step #5). Queries without an oracle (or that failed in Spark)
print spark time only and are excluded from both totals.

r12 protocol changes (VERDICT r11 items 2 + 3):

* CAP INJECTION — the blocked-dedup oracles carry a DuckDB twin of the
  engine's jaccardAutoCap arithmetic (structural identity for the
  correctness gate). Timed naively, DuckDB re-evaluates the inlined CTE
  chain behind the `(SELECT cap FROM cap)` scalar subquery and the two
  queries read 12-60 s of pure harness arithmetic (26.6 s of the r15
  91 s oracle total). The cap is a pure function of the df histogram,
  so this harness computes it ONCE UNTIMED (the prefix of the SQL up to
  the cap CTE) and times the query with the literal injected — row
  output proven identical (sf0.1: 256 rows, byte-equal; the correctness
  gate still runs the full structural SQL). Detected generically by the
  `(SELECT cap FROM cap)` marker.

* DUAL CONVENTION — train-once queries (span twins, BPE train/encode,
  the ANN codebook consumers) memoize a derived artifact: their STEADY
  number measures consuming it while the DuckDB oracle re-derives every
  rep, so a steady-vs-oracle ratio is not compute parity. The table
  carries BOTH spark columns for every query; for train-once rows the
  headline ratio uses COLD (derivation included) and the row is marked
  `*`. The steady total is still printed (serving-convention view), but
  the like-for-like headline is the cold-for-train-once one.

r13 protocol changes (VERDICT r12 items 1 + 7):

* CPU COLUMN — wall ratios have twice been poisoned by sustained host
  drift (the r12 3.54-on-a-drifted-box headline). When the bench JSON
  carries `queries_cpu` (Bench's per-query task-CPU listener column,
  ThreadMXBean on-CPU ns), the table adds a DuckDB CPU-seconds column
  (getrusage(RUSAGE_SELF) user+sys delta around each rep, median of 3,
  threads pinned via --threads to the Spark leg's core count) and a
  `cpuR` ratio = spark task-CPU / duckdb CPU. CPU-seconds measure work,
  not scheduler state: they are robust to the wall-side drift the
  controls flag, so the ≤2x bar is read off cpuR. Caveats printed in
  the header: Spark task CPU excludes GC (own threads; `queries_gc` is
  in the full artifact) and driver-side planning; DuckDB's rusage
  includes its buffer manager. Both exclusions are sub-10% on this
  board and favor neither engine systematically.

* EPOCH HEADER — every table is stamped with the box-state epoch
  (BASELINE.md "Box-state epochs"): the bench JSON's own floor_sec and
  control probes, classified against the recorded epoch bands, so a
  cross-epoch comparison is visible in the artifact header instead of
  needing forensics three rounds later.
"""
import datetime
import json
import resource
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries that consume a memoized train-once artifact (span index, BPE
# rules, PQ/IVF codebook). Their cold run carries the derivation the
# oracle re-pays every rep. Keep in sync with the verify skill's
# TRAIN-ONCE note and BASELINE.md.
TRAIN_ONCE = {
    "dedup_substring_spans", "dedup_span_removal",
    "text_bpe_train", "text_bpe_encode",
    "sim_knn_pq", "sim_knn_ivf", "sim_knn_ivfpq", "sim_knn_rerank",
    "sim_knn_incremental", "emb_pq_encode",
}

CAP_MARKER = "(SELECT cap FROM cap)"

# Box-state epochs — keep in sync with BASELINE.md "Box-state epochs".
# (label, floor_lo, floor_hi, shuffle_lo, shuffle_hi)
EPOCHS = [
    ("E1-clean (r5-r15 era)",        0.030, 0.060, 0.20, 0.63),
    ("E2-drifted (aug-2026, ~2x walls)", 0.060, 0.200, 0.60, 1.40),
    # floor recovered to the E1 band while ctl_shuffle stayed E2 —
    # the r18 closing legs (aug-19); walls read ~E1-level
    ("E3-mixed (floor E1, shuffle E2)", 0.030, 0.060, 0.63, 1.40),
]


def classify_epoch(bench: dict) -> str:
    floor = bench.get("floor_sec")
    ctl = (bench.get("controls") or {}).get("ctl_shuffle")
    if floor is None:
        return "unknown (no floor_sec in artifact)"
    for label, flo, fhi, slo, shi in EPOCHS:
        if flo <= floor <= fhi and (ctl is None or slo <= ctl <= shi):
            return label
    return f"out-of-band (floor {floor:.3f}, ctl_shuffle {ctl})"


def cpu_seconds() -> float:
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def split_cap(sql: str):
    """Return (prelude_sql, template) for a cap-twin oracle: prelude
    computes the scalar cap from the CTE prefix; template is the full
    SQL with the marker to be replaced by the literal. The cap CTE block
    ends where the next CTE (`sz AS (`) begins — the structural layout
    of capSqlCtes in Dedup.scala; fail loudly if that drifts."""
    i = sql.index("sz AS (")
    prelude = sql[:i].rstrip().rstrip(",") + "\nSELECT cap FROM cap"
    return prelude, sql


def main(bench_path: str, sfdir: str) -> None:
    bench = json.load(open(bench_path))
    oracle_sql = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else None
    if oracle_sql is None:
        # dump oracles via the checked-in oracle_sql.json from a Verify run
        raise SystemExit("pass oracle_sql.json path as third arg")
    # --threads N or --threads=N; reject missing/zero/negative loudly —
    # a silently-unpinned oracle produces a cpuR table that LOOKS
    # like-for-like but ran DuckDB on all cores (r13 review).
    threads = None
    for i, a in enumerate(sys.argv):
        if a == "--threads":
            if i + 1 >= len(sys.argv):
                raise SystemExit("--threads needs a value")
            threads = int(sys.argv[i + 1])
        elif a.startswith("--threads="):
            threads = int(a.split("=", 1)[1])
    if threads is not None and threads <= 0:
        raise SystemExit(f"--threads must be positive, got {threads}")

    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

    print(f"epoch: {classify_epoch(bench)} | date {datetime.date.today()} | "
          f"floor {bench.get('floor_sec', float('nan')):.3f}s | "
          f"controls {bench.get('controls')} | "
          f"duckdb threads {threads or 'default(all cores)'}")

    spark_cpu = bench.get("queries_cpu", {})
    spark_cpu_cold = bench.get("queries_cpu_cold", {})
    cold = bench.get("queries_cold", {})
    rows = []
    injected_notes = []
    for name, spark_s in sorted(bench["queries"].items()):
        sql = oracle_sql.get(name)
        c = cold.get(name)
        if not sql or spark_s < 0:  # no oracle, or the Spark query failed
            rows.append((name, spark_s, c, None, None, None))
            continue
        if CAP_MARKER in sql:
            prelude, template = split_cap(sql)
            t0 = time.perf_counter()
            capval = con.execute(prelude).fetchone()[0]
            pre_s = time.perf_counter() - t0
            sql = template.replace(CAP_MARKER, str(capval))
            injected_notes.append(f"{name}: cap={capval} computed untimed "
                                  f"({pre_s:.2f}s prelude, injected as literal)")
        times, cputimes = [], []
        for _ in range(3):
            c0 = cpu_seconds()
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
            cputimes.append(cpu_seconds() - c0)
        duck = statistics.median(times)
        duck_cpu = statistics.median(cputimes)
        rows.append((name, spark_s, c, duck,
                     spark_s / duck if duck > 0 else None, duck_cpu))

    # headline spark number per row: cold for train-once (derivation
    # included — the oracle re-derives too), steady otherwise
    def headline_spark(name, steady, c):
        return c if name in TRAIN_ONCE and c is not None and c >= 0 else steady

    # totals cover only queries with BOTH engines measured, so a failed
    # Spark query cannot bias the headline ratio downward
    measured = [r for r in rows if r[3] is not None]
    total_steady = sum(r[1] for r in measured)
    total_hl = sum(headline_spark(r[0], r[1], r[2]) for r in measured)
    total_duck = sum(r[3] for r in measured)

    # headline spark CPU per row, same cold-for-train-once convention
    def headline_cpu(name):
        if name in TRAIN_ONCE and spark_cpu_cold.get(name, -1) >= 0:
            return spark_cpu_cold[name]
        v = spark_cpu.get(name, -1)
        return v if v >= 0 else None

    have_cpu = bool(spark_cpu)
    cpu_hdr = f" {'s-cpu':>7s} {'d-cpu':>7s} {'cpuR':>6s}" if have_cpu else ""
    print(f"{'query':32s} {'steady':>7s} {'cold':>7s} {'duckdb':>7s} "
          f"{'ratio':>6s}{cpu_hdr}  (* = train-once: ratio uses cold)")
    def hl_ratio(r):
        if r[3] is None or r[3] <= 0:
            return None
        return headline_spark(r[0], r[1], r[2]) / r[3]
    for r in sorted(rows, key=lambda x: -(hl_ratio(x) or 0)):
        name, s, c, d, _, dcpu = r
        mark = "*" if name in TRAIN_ONCE else " "
        rr = hl_ratio(r)
        cpu_cols = ""
        if have_cpu:
            scpu = headline_cpu(name)
            cpur = (scpu / dcpu) if (scpu is not None and dcpu and dcpu > 0) else None
            cpu_cols = (f" {scpu if scpu is not None else float('nan'):7.3f}"
                        f" {dcpu if dcpu is not None else float('nan'):7.3f}"
                        f" {cpur if cpur is not None else float('nan'):6.2f}")
        print(f"{name:32s} {s:7.3f} "
              f"{c if c is not None else float('nan'):7.3f} "
              f"{d if d is not None else float('nan'):7.3f} "
              f"{rr if rr is not None else float('nan'):6.2f}{mark}{cpu_cols}")
    for n in injected_notes:
        print(f"note: {n}")
    # GC-share flags (r13: queries_gc_cold landed for exactly this) —
    # executorCpuTime excludes GC, so a cpuR read where GC is a big
    # share of the same window is understating the true cost; flag any
    # row whose headline-convention GC exceeds 20% of its CPU.
    gc_steady = bench.get("queries_gc", {})
    gc_cold = bench.get("queries_gc_cold", {})
    for name, s, c, d, _, dcpu in sorted(rows):
        scpu = headline_cpu(name) if have_cpu else None
        gc = (gc_cold if name in TRAIN_ONCE else gc_steady).get(name, -1)
        if scpu and gc is not None and gc > 0.2 * scpu:
            print(f"note: {name}: GC {gc:.2f}s is {100 * gc / scpu:.0f}% of its "
                  f"{'cold ' if name in TRAIN_ONCE else ''}task CPU {scpu:.2f}s "
                  f"— cpuR understates this row")
    print(f"\ntotal spark steady {total_steady:.2f}s "
          f"(serving convention, train-once artifacts memoized)")
    print(f"total spark headline {total_hl:.2f}s "
          f"(cold for the {len(TRAIN_ONCE)} train-once queries), "
          f"duckdb (oracled) {total_duck:.2f}s, "
          f"ratio steady {total_steady / total_duck:.2f}, "
          f"ratio headline {total_hl / total_duck:.2f}")
    if have_cpu:
        cpu_measured = [(r[0], headline_cpu(r[0]), r[5]) for r in measured
                        if r[5] is not None and headline_cpu(r[0]) is not None]
        tot_scpu = sum(x[1] for x in cpu_measured)
        tot_dcpu = sum(x[2] for x in cpu_measured)
        print(f"total task-CPU spark {tot_scpu:.2f}s, duckdb {tot_dcpu:.2f}s "
              f"over {len(cpu_measured)} queries -> CPU ratio "
              f"{tot_scpu / tot_dcpu:.2f} (host-state-insensitive headline; "
              f"cold CPU for train-once rows)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
