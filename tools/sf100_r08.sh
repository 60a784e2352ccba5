#!/bin/bash
# r08 sf100 leg: graft Bench then DuckDB baseline, one engine at a time.
set -uo pipefail
cd "$(dirname "$0")/.."
ORACLE=/tmp/verify_r08d/oracle_sql.json
echo "=== graft sf100 ==="
SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 tools/run_main.sh graft.Bench \
  2> /tmp/bench_sf100_r08.log | tail -1 > artifacts/BENCH_sf100_r08.json
echo "graft sf100 rc=$? $(head -c 150 artifacts/BENCH_sf100_r08.json)"
echo "=== duckdb sf100 ==="
python3 tools/baseline_duckdb.py /tmp/graft_sf100 "$ORACLE" \
  artifacts/BASELINE_duckdb_sf100_r08.json > /tmp/duck_sf100_r08.log 2>&1
echo "duckdb sf100 rc=$?"
echo SF100-DONE
