#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB against the sf tables, and compares:
column names (sorted), row counts, and values (columns sorted by name).
Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata is one file per table; locally generated scale-up
        # dirs (ScaleUp sf1) are parquet DIRECTORIES - glob those
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
            if ecols != gcols:
                print(f"FAIL {name}: columns {gcols} != {ecols}"); n_fail += 1; continue
            if exp.num_rows != got.num_rows:
                print(f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}"); n_fail += 1; continue
            ok = True
            for c in ecols:
                ev = [norm(x) for x in exp.column(c).to_pylist()]
                gv = [norm(x) for x in got.column(c).to_pylist()]
                if ev != gv:
                    bad = next(i for i, (a, b) in enumerate(zip(ev, gv)) if a != b)
                    print(f"FAIL {name}: col {c} row {bad}: got {gv[bad]!r} != exp {ev[bad]!r}")
                    ok = False
                    break
            if ok:
                print(f"PASS {name} ({exp.num_rows} rows)"); n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
