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

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
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
