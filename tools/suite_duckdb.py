#!/usr/bin/env python3
"""DuckDB wall-clock baseline for the SCALED query suites (TPC-DS / JOB /
ClickBench) — the denominator column for tools.SuiteBench's numbers.

Reads the oracle dump SuiteBench wrote with dumpOracle= (per-query text =
closed-form CREATE TABLE IF NOT EXISTS DDL at the SAME generator scale +
the suite query in DuckDB dialect). One persistent database file per run:
the first execution materializes the scaled tables (untimed build), the
DDL is a no-op afterwards, so timed runs measure the query alone plus a
millisecond of DDL parsing on both engines' protocols (1 warmup + 5
measured, median).

Usage: suite_duckdb.py <suite_oracle.json> <out.json> [q1 q2 ...]
Dev-only tool (driver-side python stack); not part of the shipped library.
"""
import json, sys, time, os, tempfile

TIMEOUT_NOTE = float(os.environ.get("TIMEOUT_S", "600"))


def main():
    oracle_path, out_path = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    oracles = json.load(open(oracle_path))
    names = only if only else list(oracles)

    import duckdb
    dbfile = os.environ.get("SUITE_DUCK_DB",
                            os.path.join(tempfile.gettempdir(), "graft_suite_duck.db"))
    con = duckdb.connect(dbfile)
    con.execute("SET threads TO %d" % os.cpu_count())
    con.execute("SET memory_limit='%s'" % os.environ.get("DUCKDB_MEM", "96GB"))
    tmp = tempfile.mkdtemp(prefix="duck_suite_spill_")
    con.execute(f"SET temp_directory='{tmp}'")

    results = {}
    for name in names:
        sql = oracles[name]
        try:
            t_build = time.time()
            con.execute(sql).fetchall()  # build tables (first time) + warmup
            build_s = time.time() - t_build
            runs = []
            for _ in range(5):
                t0 = time.time()
                con.execute(sql).fetchall()
                runs.append(time.time() - t0)
            runs.sort()
            results[name] = runs[2]
            print(f"[suite-duck] {name} first(build+warm) {build_s:.2f}s "
                  f"runs {' '.join(f'{r:.2f}' for r in runs)}", flush=True)
        except Exception as e:
            results[name] = -1.0
            print(f"[suite-duck] {name} FAILED: {str(e)[:300]}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"engine": "duckdb", "queries": results,
                   "total": sum(v for v in results.values() if v >= 0)}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
