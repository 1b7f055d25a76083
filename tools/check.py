#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by graft.Verify, runs the
corresponding oracle SQL in DuckDB over the same testdata parquet,
and compares: column names (sorted), row count, and exact values
(rows sorted by all columns — plus a note if the as-written order
differs). Exit code 1 if any query mismatches.
"""
import sys, json, math, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated name prefixes — check just those
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only is not None and not any(name.startswith(p) for p in only):
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # fresh connection per query: one long-lived connection accumulates
        # allocator state across queries, and after a huge oracle (dd05's
        # all-pairs at sf1) every later query died with spurious tiny-block
        # OOMs — per-query connections make each oracle independent
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        try:
            got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            con.close()
            continue
        con.close()
        # sort columns by name (driver behavior)
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eperm = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        g = [tuple(canon(r[i]) for i in gperm) for r in got]
        e = [tuple(canon(r[i]) for i in eperm) for r in exp]
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        order_note = "" if g == e else " (as-written order differs)" if sorted(map(repr, g)) == sorted(map(repr, e)) else None
        if order_note is None:
            gs, es = sorted(map(repr, g)), sorted(map(repr, e))
            diffs = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for a, b in diffs:
                print(f"  spark : {a}\n  oracle: {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows){order_note}")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
