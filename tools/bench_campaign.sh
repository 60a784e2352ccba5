#!/bin/bash
# Round bench campaign: graft Bench + DuckDB baseline per scale factor,
# strictly sequential (exactly one engine running at any moment — the
# round-3/round-5 lesson: concurrent load inflates shingle-heavy queries
# ~2.5-3x on BOTH engines and poisons medians).
# Usage: tools/bench_campaign.sh <round_suffix e.g. r07> <oracle_sql.json>
set -uo pipefail
cd "$(dirname "$0")/.."
R="$1"; ORACLE="$2"
mkdir -p artifacts
declare -A DIRS=(
  [sf01]=/root/testdata/sf0.1
  [sf1]=/tmp/graft_sf1
  [sf10]=/tmp/graft_sf10
  [sf100]=/tmp/graft_sf100
)
for sf in sf01 sf1 sf10 sf100; do
  d="${DIRS[$sf]}"
  echo "=== graft $sf ($d) ==="
  SPARK_GRAFT_SF_DIR="$d" tools/run_main.sh graft.Bench \
    2> "/tmp/bench_${sf}_$R.log" | tail -1 > "artifacts/BENCH_${sf}_$R.json"
  echo "graft $sf rc=$? $(cat artifacts/BENCH_${sf}_$R.json | head -c 120)"
  echo "=== duckdb $sf ($d) ==="
  python3 tools/baseline_duckdb.py "$d" "$ORACLE" \
    "artifacts/BASELINE_duckdb_${sf}_$R.json" > "/tmp/duck_${sf}_$R.log" 2>&1
  echo "duckdb $sf rc=$?"
done
echo CAMPAIGN-DONE
