#!/usr/bin/env python3
"""Dev-only oracle parity harness (mirrors the driver's DuckDB compare).

Usage: python3 dev/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
tables, and diffs values exactly (rows sorted by all columns, columns
sorted by name). NOT shipped to the driver — local feedback loop only.
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def assert_engine_semantics(con):
    """Pin the DuckDB behaviors every oracle SQL depends on. If the local
    DuckDB ever changes one of these, fail HERE with a named reason
    instead of as a mystery VALUE-MISMATCH (or worse: pass locally while
    the driver's build diverges).
    """
    # 1. Integer division `//` truncates toward zero (Scala `/`,
    #    Spark `div` semantics). Convention-proof oracles don't rely on
    #    this, but legacy `SUM(q) // COUNT(*)` forms would silently flip
    #    321/640 PQ centroid means if `//` ever floors.
    assert con.execute("SELECT -7 // 2").fetchone()[0] == -3, \
        "DuckDB `//` no longer truncates toward zero"
    # 2. `%` follows the dividend's sign (needed by the convention-proof
    #    nonneg-residue form ((a % n) + n) % n, which is correct under
    #    either % convention — this just pins what we observe).
    assert con.execute("SELECT -7 % 2").fetchone()[0] == -1, \
        "DuckDB `%` sign convention changed"
    # 3. SUM(BIGINT) widens to HUGEINT, which fetchdf() delivers as
    #    float64 — value-equal but not HASH-equal to Spark's int64.
    #    Therefore every integer aggregate an oracle EMITS must be CAST
    #    back to BIGINT (the r7 sim_knn_pq red). The strict compare
    #    below now catches violations, and this assert documents why.
    t = con.sql("SELECT SUM(x) FROM (VALUES (CAST(1 AS BIGINT))) t(x)").types
    assert str(t[0]) == "HUGEINT", f"SUM(BIGINT) type changed: {t[0]}"

def norm(v):
    """Normalize to a (type-name, value) pair so the comparison is
    TYPE-STRICT, mirroring the driver's value-hash: int64 123 and
    float64 123.0 must NOT compare equal (Python `==` says they do,
    which is exactly how the r7 HUGEINT reds passed locally)."""
    if hasattr(v, "item"):
        v = v.item()          # numpy scalar -> python scalar
    if isinstance(v, float):
        if math.isnan(v): return ("float", "NaN")
        return ("float", repr(v))
    return (type(v).__name__, repr(v))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    assert_engine_semantics(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracles.items()):
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"MISSING-OUTPUT {name}"); fails += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERROR {name}: {e}"); fails += 1; continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"SCHEMA-MISMATCH {name}: spark={gcols} oracle={ecols}")
            fails += 1; continue
        g = [tuple(norm(v) for v in r) for r in got[gcols].itertuples(index=False)]
        e = [tuple(norm(v) for v in r) for r in exp[ecols].itertuples(index=False)]
        g.sort(key=repr); e.sort(key=repr)
        if g == e:
            print(f"OK {name} ({len(g)} rows)")
        else:
            fails += 1
            print(f"VALUE-MISMATCH {name}: {len(g)} vs {len(e)} rows")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff row {i}:\n   spark={a}\n   duck ={b}")
                    break
    print(f"\n{'FAIL' if fails else 'PASS'}: {len(oracles)-fails}/{len(oracles)} matched")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
