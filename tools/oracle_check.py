#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same sf parquet tables,
sorts columns by name / rows by value, and compares values exactly.
Dev-only tool (driver-side python stack); not part of the shipped library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for name in ["region","nation","customer","supplier","part","orders",
                 "lineitem","events","documents","embeddings"]:
        # driver testdata = single files; ScaleUp data = <table>.parquet DIRS
        # of part files with events.ts stored as raw ns-since-epoch BIGINTs
        # (same handling as baseline_duckdb.connect)
        p = f"{sf_dir}/{name}.parquet"
        src = f"read_parquet('{p}')" if os.path.isfile(p) \
            else f"parquet_scan('{p}/*.parquet')"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {src}")
        if name == "events":
            t = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0]
            if t == "BIGINT":
                con.execute("DROP VIEW events")
                con.execute(f"CREATE VIEW events AS SELECT * REPLACE "
                            f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # per-oracle interrupt cap for above-sf0.01 runs: some oracles are known
    # DuckDB scale cliffs (dedup_embed_cos mirrors the LSH closed form and
    # exceeds 300 s from sf1 up — recorded as a timeout by the BENCH
    # baseline; here it would just hang the gate)
    timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "120"))
    skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
    import threading
    for qname in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, qname)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            results[qname] = "EMPTY-OUTPUT"
            continue
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if qname not in oracle or qname in skip:
            results[qname] = f"rows-only ({len(got)} rows)"
            continue
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            exp = con.execute(oracle[qname]).fetchdf()
        except Exception as e:
            results[qname] = f"ORACLE-SQL-ERROR: {e}"
            continue
        finally:
            timer.cancel()
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e.columns):
            results[qname] = f"SCHEMA-NAMES: got {list(g.columns)} want {list(e.columns)}"
            continue
        if len(g) != len(e):
            results[qname] = f"ROWS: got {len(g)} want {len(e)}"
            continue
        gs = g.sort_values(by=list(g.columns), ignore_index=True)
        es = e.sort_values(by=list(e.columns), ignore_index=True)
        mismatch = None
        for c in g.columns:
            a, b = gs[c], es[c]
            try:
                eq = (a.fillna("<NULL>") == b.fillna("<NULL>")) if a.dtype == object \
                    else ((a == b) | (a.isna() & b.isna()))
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = f"VALUES col={c} row={i}: got {a[i]!r} want {b[i]!r} (dtype {a.dtype}/{b.dtype})"
                break
        dtypes_note = ""
        for c in g.columns:
            if str(gs[c].dtype) != str(es[c].dtype):
                dtypes_note += f" [dtype {c}: {gs[c].dtype} vs {es[c].dtype}]"
        results[qname] = (mismatch or f"OK ({len(g)} rows)") + dtypes_note
        print(f"[progress] {qname}: {results[qname][:80]}", file=sys.stderr, flush=True)
    bad = 0
    for k in sorted(results):
        ok = results[k].startswith("OK") or results[k].startswith("rows-only")
        if not ok:
            bad += 1
        print(f"{'PASS' if ok else 'FAIL':4} {k:24} {results[k]}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
