#!/bin/bash
# Resume the r08 bench campaign from where the interrupted run stopped:
# duckdb sf1 (was killed mid-run), then the full sf10 leg. Same strict
# one-engine-at-a-time discipline as bench_campaign.sh.
set -uo pipefail
cd "$(dirname "$0")/.."
ORACLE=/tmp/verify_sf/oracle_sql.json
echo "=== duckdb sf1 ==="
python3 tools/baseline_duckdb.py /tmp/graft_sf1 "$ORACLE" \
  artifacts/BASELINE_duckdb_sf1_r08.json > /tmp/duck_sf1_r08.log 2>&1
echo "duckdb sf1 rc=$?"
echo "=== graft sf10 ==="
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 tools/run_main.sh graft.Bench \
  2> /tmp/bench_sf10_r08.log | tail -1 > artifacts/BENCH_sf10_r08.json
echo "graft sf10 rc=$? $(head -c 120 artifacts/BENCH_sf10_r08.json)"
echo "=== duckdb sf10 ==="
python3 tools/baseline_duckdb.py /tmp/graft_sf10 "$ORACLE" \
  artifacts/BASELINE_duckdb_sf10_r08.json > /tmp/duck_sf10_r08.log 2>&1
echo "duckdb sf10 rc=$?"
echo CAMPAIGN-DONE
