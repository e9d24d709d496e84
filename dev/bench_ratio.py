#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB ratio table.

Usage: python3 dev/bench_ratio.py <bench_json> <sfdir> <oracle_sql.json>

Reads a Bench JSON line (steady + cold columns), times each oracle SQL
in DuckDB (median of 3) on the same parquet, and prints a ratio table
so per-query regressions are attributable (VERDICT r1 next-step #5).
Queries without an oracle (or that failed in Spark) print spark time
only and are excluded from both totals.
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(bench_path: str, sfdir: str) -> None:
    bench = json.load(open(bench_path))
    oracle_sql = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else None
    if oracle_sql is None:
        # dump oracles via the checked-in oracle_sql.json from a Verify run
        raise SystemExit("pass oracle_sql.json path as third arg")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

    rows = []
    for name, spark_s in sorted(bench["queries"].items()):
        sql = oracle_sql.get(name)
        if not sql or spark_s < 0:  # no oracle, or the Spark query failed
            rows.append((name, spark_s, None, None))
            continue
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        duck = statistics.median(times)
        rows.append((name, spark_s, duck, spark_s / duck if duck > 0 else None))

    # totals cover only queries with BOTH engines measured, so a failed
    # Spark query cannot bias the headline ratio downward
    total_spark = sum(r[1] for r in rows if r[2] is not None)
    total_duck = sum(r[2] for r in rows if r[2] is not None)
    print(f"{'query':32s} {'spark':>7s} {'duckdb':>7s} {'ratio':>6s}")
    for name, s, d, r in sorted(rows, key=lambda x: -(x[3] or 0)):
        print(f"{name:32s} {s:7.3f} "
              f"{d if d is not None else float('nan'):7.3f} "
              f"{r if r is not None else float('nan'):6.2f}")
    print(f"\ntotal spark {total_spark:.2f}s, duckdb (oracled) {total_duck:.2f}s, "
          f"ratio {total_spark / total_duck:.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
