#!/usr/bin/env python3
"""DuckDB wall-clock baseline for the Bench headline queries.

The reference binary (lingo-db) cannot be built in this sandbox (no
C++/LLVM toolchain, no egress), so DuckDB — the single-node engine the
reference's published work benchmarks itself against, same performance
class — is the explicit stand-in (recorded as such in BASELINE.md).

Runs each headline query's oracle SQL (the exact semantics the Spark side
computes, from Verify's oracle_sql.json) over the SAME parquet files Bench
reads, with the same protocol as graft.Bench (1 warmup, then 5 measured
runs — or 2 once the first measured run reaches 60 s — MIN reported),
all cores. The statistic and the adaptive rule are pinned identically in
both engines so per-query ratios compare like with like.

Per-query timeout (default 300 s, TIMEOUT_S env to override): the reference's
own benchmark harness caps each query at 60 s (tools/scripts/benchmark.py:35);
a query that exceeds the cap is recorded as "timeout" rather than hanging the
whole baseline run.

Each query runs in its OWN child process: at sf100 DuckDB can exceed the
machine and be killed by the kernel OOM killer (observed on dedup_embed_cos),
and in-process that would kill the whole baseline — with isolation it is
recorded as "KILLED (OOM)" and the run continues. The child also sets an
explicit memory_limit + temp_directory so DuckDB prefers spilling to dying.
If the output file already exists, completed queries are skipped (resume).

Usage: baseline_duckdb.py <sfDir> <oracle_sql.json> [out.json]
Dev-only tool (driver-side python stack); not part of the shipped library.
"""
import json, sys, time, os, threading, subprocess, tempfile

TIMEOUT_S = float(os.environ.get("TIMEOUT_S", "300"))
MEM_LIMIT = os.environ.get("DUCKDB_MEM", "96GB")

# spill-heavy queries last — same order as graft.Bench.headline (see its
# scaladoc: the shingle pipelines evict the page cache and leave writeback
# that inflates whatever runs next; light queries measure on a clean machine)
HEADLINE = ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9", "tpch_q10",
            "tpch_q21", "agg_rollup", "agg_groupjoin", "win_running_sum",
            "dedup_exact", "sim_cosine_topk", "text_quality", "ev_sessions",
            "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embed_cos"]

# mirror of graft.Bench.heavies: spill-heavy shingle/self-join pipelines get
# an OS-level barrier (sync + drain pause) before and between measured runs,
# so one heavy's dirty writeback is flushed on the barrier's clock instead of
# contaminating the next run's measurement
HEAVIES = {"dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embed_cos"}


def heavy_barrier():
    os.sync()
    time.sleep(2.0)


def connect(sf_dir):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO %d" % os.cpu_count())
    con.execute(f"SET memory_limit='{MEM_LIMIT}'")
    tmp = tempfile.mkdtemp(prefix="duck_spill_")
    con.execute(f"SET temp_directory='{tmp}'")
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
    return con


def run_one(sf_dir, sql, heavy=False):
    """Child-process entry: 1 warmup + adaptive measured runs, min → JSON.
    Same protocol as graft.Bench: 5 measured runs, or — once the FIRST
    MEASURED run reaches 60 s — as few as 2, extending (up to 5) until the
    two BEST runs agree within 15% (a stable minutes-long query stops at 2;
    a host-contention burst spanning two runs doesn't get to publish a 10x
    number); MIN across measured runs reported on both engines."""
    import duckdb
    con = connect(sf_dir)

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
        if heavy:
            heavy_barrier()  # don't inherit the previous heavy's residue
        once()  # warmup
        if heavy:
            heavy_barrier()
        r1 = once()  # first measured run decides the count (see docstring)
        if r1 >= 60.0:
            runs = [r1]
            def converged(rs):
                best = sorted(rs)[:2]
                return len(best) >= 2 and best[1] <= best[0] * 1.15
            while len(runs) < 5 and not converged(runs):
                if heavy:
                    heavy_barrier()
                runs.append(once())
        else:
            def measured():
                if heavy:
                    heavy_barrier()
                return once()
            runs = [r1] + [measured() for _ in range(4)]
        print(json.dumps({"ok": round(min(runs), 4)}))
    except duckdb.InterruptException:
        print(json.dumps({"err": f"TIMEOUT>{TIMEOUT_S}s"}))
    except Exception as e:
        print(json.dumps({"err": f"ERROR: {e}"}))


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(oracle_path))
    results = {}
    if out_path and os.path.exists(out_path):  # resume a killed run
        results = json.load(open(out_path)).get("queries", {})

    def save():
        total = sum(v for v in results.values() if isinstance(v, float))
        out = {"engine": "duckdb-" + __import__("duckdb").__version__,
               "sf": sf_dir, "threads": os.cpu_count(),
               "total": round(total, 4), "queries": results}
        if out_path:
            json.dump(out, open(out_path, "w"), indent=1)
        return out

    for q in HEADLINE:
        if q in results and not (isinstance(results[q], str)
                                 and results[q].startswith("KILLED")):
            print(f"[baseline] {q:24} (resume: kept {results[q]})",
                  file=sys.stderr)
            continue
        if q not in oracle:
            results[q] = None
            print(f"[baseline] {q:24} no-oracle (skipped)", file=sys.stderr)
            continue
        child = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, oracle_path,
             "--one", q],
            capture_output=True, text=True)
        line = (child.stdout or "").strip().splitlines()
        if child.returncode != 0 or not line:
            # negative returncode = killed by signal (kernel OOM killer sends
            # SIGKILL); anything else without output is a hard crash
            results[q] = f"KILLED (rc={child.returncode}, likely OOM)"
            print(f"[baseline] {q:24} KILLED rc={child.returncode}",
                  file=sys.stderr)
        else:
            r = json.loads(line[-1])
            results[q] = r.get("ok", r.get("err"))
            print(f"[baseline] {q:24} {results[q]}", file=sys.stderr)
        save()  # persist after every query so a later kill loses nothing
    print(json.dumps(save()))


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[3] == "--one":
        oracle = json.load(open(sys.argv[2]))
        run_one(sys.argv[1], oracle[sys.argv[4]], heavy=sys.argv[4] in HEAVIES)
    else:
        main()
