#!/usr/bin/env python3
"""DuckDB wall-clock baseline for the Bench headline queries.

The reference binary (lingo-db) cannot be built in this sandbox (no
C++/LLVM toolchain, no egress), so DuckDB — the single-node engine the
reference's published work benchmarks itself against, same performance
class — is the explicit stand-in (recorded as such in BASELINE.md).

Runs each headline query's oracle SQL (the exact semantics the Spark side
computes, from Verify's oracle_sql.json) over the SAME parquet files Bench
reads, with the same protocol (1 warmup + 5 measured, median), all cores.

Per-query timeout (default 300 s, TIMEOUT_S env to override): the reference's
own benchmark harness caps each query at 60 s (tools/scripts/benchmark.py:35);
a query that exceeds the cap is recorded as "timeout" rather than hanging the
whole baseline run.

Usage: baseline_duckdb.py <sfDir> <oracle_sql.json> [out.json]
Dev-only tool (driver-side python stack); not part of the shipped library.
"""
import json, sys, time, glob, os, threading
import duckdb

TIMEOUT_S = float(os.environ.get("TIMEOUT_S", "300"))

HEADLINE = ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9", "tpch_q10",
            "tpch_q21", "agg_rollup", "agg_groupjoin", "win_running_sum",
            "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
            "dedup_embed_cos", "sim_cosine_topk", "text_quality", "ev_sessions"]

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    con.execute("SET threads TO %d" % os.cpu_count())
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{name}.parquet"
        src = f"read_parquet('{p}')" if os.path.isfile(p) \
            else f"parquet_scan('{p}/*.parquet')"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {src}")
        if name == "events":
            # the driver's events.parquet stores TIMESTAMP(NANOS) (read by
            # DuckDB as TIMESTAMP_NS); a Spark-rewritten copy (ScaleUp) stores
            # raw ns-since-epoch BIGINTs — normalize to what the oracles expect
            t = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0]
            if t == "BIGINT":
                con.execute("DROP VIEW events")
                con.execute(f"CREATE VIEW events AS SELECT * REPLACE "
                            f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
    oracle = json.load(open(oracle_path))
    results = {}
    for q in HEADLINE:
        if q not in oracle:
            results[q] = None
            print(f"[baseline] {q:24} no-oracle (skipped)", file=sys.stderr)
            continue
        sql = oracle[q]
        def once():
            timer = threading.Timer(TIMEOUT_S, con.interrupt)
            timer.start()
            try:
                t0 = time.time()
                con.execute(sql).fetchall()
                return time.time() - t0
            finally:
                timer.cancel()
        try:
            once()  # warmup
            runs = sorted(once() for _ in range(5))
            results[q] = round(runs[2], 4)
            print(f"[baseline] {q:24} {runs[2]:8.4f}s", file=sys.stderr)
        except duckdb.InterruptException:
            results[q] = f"TIMEOUT>{TIMEOUT_S}s"
            print(f"[baseline] {q:24} TIMEOUT after {TIMEOUT_S}s", file=sys.stderr)
        except Exception as e:
            results[q] = f"ERROR: {e}"
            print(f"[baseline] {q:24} ERROR {e}", file=sys.stderr)
    total = sum(v for v in results.values() if isinstance(v, float))
    out = {"engine": "duckdb-" + duckdb.__version__, "sf": sf_dir,
           "threads": os.cpu_count(), "total": round(total, 4),
           "queries": results}
    print(json.dumps(out))
    if out_path:
        json.dump(out, open(out_path, "w"), indent=1)

if __name__ == "__main__":
    main()
