#!/usr/bin/env python3
"""Row-count probe for oracle SQL against DuckDB only (no Spark).

Usage: python3 tools/count_rows.py <oracle_sql.json> <sfDir> name [name...]
       python3 tools/count_rows.py <oracle_sql.json> <sfDir> --prefix tpcds_

Runs each named oracle query (self-contained: generator DDL + query) in one
DuckDB connection and prints the row count. The closed-form generators render
identically in Spark and DuckDB, so a DuckDB count of 0 == an empty contract
query. Dev-only tool (driver-side python stack); not part of the library.
"""
import json, sys, os
import duckdb


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    with open(oracle_path) as f:
        oracle = json.load(f)
    if names and names[0] == "--prefix":
        names = sorted(k for k in oracle if k.startswith(names[1]))
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{name}.parquet"
        src = f"read_parquet('{p}')" if os.path.isfile(p) \
            else f"parquet_scan('{p}/*.parquet')"
        try:
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM {src}")
        except Exception:
            pass
    zero = []
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            print(f"{name:24s} MISSING")
            continue
        try:
            stmts = [s for s in sql.split(";") if s.strip()]
            for s in stmts[:-1]:
                con.execute(s)
            n = len(con.execute(stmts[-1]).fetchall())
            print(f"{name:24s} {n}")
            if n == 0:
                zero.append(name)
        except Exception as e:
            print(f"{name:24s} ERR {str(e)[:120]}")
            zero.append(name)
    if zero:
        print("ZERO/ERR:", " ".join(zero))
        sys.exit(1)
    print("all non-empty")


if __name__ == "__main__":
    main()
