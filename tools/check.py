#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [namePrefixes]

Loads each Spark result parquet written by graft.Verify, runs the
corresponding oracle SQL in DuckDB over the same testdata parquet,
and compares: column names (sorted), row count, and exact values
(rows sorted by all columns — plus a note if the as-written order
differs). Exit code 1 if any query mismatches.

Each oracle runs in its OWN SUBPROCESS: DuckDB keeps process-global
allocator state, and after one huge oracle (dd05's 20k-vector
all-pairs at sf1) even a fresh duckdb.connect() in the same process
died with tiny-block OOMs while the machine had >100 GB free.
Process isolation makes every oracle independent.
"""
import sys, json, math, glob, re, subprocess

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# The driver's hash gate is type-sensitive in ways value comparison is not:
# DuckDB types SUM(BIGINT) as HUGEINT (int128), which pandas/arrow fetch as
# float64/object and the driver hashes differently from Spark's BIGINT —
# values compare equal here while the driver reds the entry (r6: mm05-07).
# So every output column must (a) have the SAME type on both sides and
# (b) use only canonical leaf types. See QueryDef.scala's parity rules.
CANON_LEAVES = {"BIGINT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"}


def norm_type(t):
    t = t.strip().upper()
    # Spark parquet timestamps read back as TIMESTAMP WITH TIME ZONE; the
    # oracle side says TIMESTAMP. Same wall-instant values — driver-equivalent.
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return t


def bad_leaves(t):
    """Non-canonical scalar leaf tokens inside a (possibly nested) type."""
    toks = re.findall(r"[A-Z_]+(?:\(\d+(?:,\d+)?\))?", norm_type(t))
    bad = []
    for tok in toks:
        base = tok.split("(")[0]
        if base in ("STRUCT", "MAP", "LIST", "ARRAY", "NOT", "NULL"):
            continue
        if base not in CANON_LEAVES:
            bad.append(tok)
    return bad


def check_types(name, got_t, exp_t):
    """Compare DESCRIBE types of both sides; return list of problems."""
    problems = []
    for c in sorted(set(got_t) | set(exp_t)):
        g, e = got_t.get(c), exp_t.get(c)
        if g is None or e is None:
            continue  # column-name mismatch is reported separately
        if norm_type(g) != norm_type(e):
            problems.append(f"col {c}: spark={g} oracle={e}")
            continue
        for side, t in (("spark", g), ("oracle", e)):
            bl = bad_leaves(t)
            if bl:
                problems.append(f"col {c}: non-canonical {side} type {t} ({','.join(bl)})")
    return problems


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def check_one(sfdir, outdir, name, sql):
    """Run one oracle comparison in-process. Returns True on pass."""
    import duckdb
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        return False
    con = duckdb.connect()
    # GRAFT_DUCKDB_MEMLIMIT (e.g. "80GB"): bound DuckDB's allocator and give
    # it a spill dir instead of letting a huge oracle (dd03/dd06 at sf10)
    # grow until malloc fails. Opt-in — default behavior matches the driver.
    import os
    lim = os.environ.get("GRAFT_DUCKDB_MEMLIMIT")
    if lim:
        con.execute(f"SET memory_limit='{lim}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    try:
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.description]
        exp = con.execute(sql).fetchall()
        exp_cols = [d[0] for d in con.description]
        got_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()}
        exp_t = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        return False
    finally:
        con.close()
    type_problems = check_types(name, got_t, exp_t)
    if type_problems:
        print(f"FAIL {name}: type mismatch (driver hash gate is type-sensitive):")
        for p in type_problems:
            print(f"  {p}")
        return False
    # sort columns by name (driver behavior)
    gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    eperm = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
        return False
    g = [tuple(canon(r[i]) for i in gperm) for r in got]
    e = [tuple(canon(r[i]) for i in eperm) for r in exp]
    if len(g) != len(e):
        print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
        return False
    order_note = "" if g == e else " (as-written order differs)" if sorted(map(repr, g)) == sorted(map(repr, e)) else None
    if order_note is None:
        gs, es = sorted(map(repr, g)), sorted(map(repr, e))
        diffs = [(a, b) for a, b in zip(gs, es) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs:")
        for a, b in diffs:
            print(f"  spark : {a}\n  oracle: {b}")
        return False
    print(f"PASS {name} ({len(g)} rows){order_note}")
    return True


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated name prefixes — check just those.
    # internal form --one=<name> runs a single oracle in THIS process (the
    # subprocess leg of the per-oracle isolation).
    arg3 = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))

    if arg3 is not None and arg3.startswith("--one="):
        name = arg3[len("--one="):]
        ok = check_one(sfdir, outdir, name, oracle[name])
        sys.exit(0 if ok else 1)

    only = arg3.split(",") if arg3 else None
    names = [n for n in sorted(oracle)
             if only is None or any(n.startswith(p) for p in only)]
    n_pass = n_fail = 0
    for name in names:
        r = subprocess.run(
            [sys.executable, __file__, sfdir, outdir, f"--one={name}"],
            capture_output=True, text=True)
        out = (r.stdout or "") + (r.stderr or "")
        sys.stdout.write(r.stdout or "")
        if r.returncode == 0 and f"PASS {name}" in out:
            n_pass += 1
        else:
            if f"FAIL {name}" not in out:
                print(f"FAIL {name}: checker subprocess rc={r.returncode}: {out[-300:]}")
            n_fail += 1
        sys.stdout.flush()
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
