#!/bin/bash
# Round-9 patch legs: measure the keys added/fixed AFTER the main
# protocol run (q63 recursion-limit fix; q65/q66/t17/q67/s5 new) at
# every protocol SF, Spark and DuckDB back-to-back per SF, so their
# rows can be merged into /tmp/baseline_r9 with full method parity
# (same bench mains, same 3-run medians, same canary trail).
set -e
cd /root/repo
OUT=/tmp/baseline_r9
KEYS=q63,q65,q66,t17_bm25,q67,s5
mkdir -p "$OUT"

canary() {
  echo "--- canary before $1 ($(date +%H:%M:%S))" >> "$OUT/canary.log"
  python3 tools/canary.py >> "$OUT/canary.log" 2>&1 || true
}

run_sf() {
  local tag=$1 dir=$2
  echo "=== patch $tag spark ($(date +%H:%M:%S)) ==="
  canary "patch $tag spark"
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY=$KEYS \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -F '"metric":"queries_full"' | sed 's/^\[info\] //' \
    > "$OUT/spark_patch_$tag.json"
  echo "=== patch $tag duckdb ($(date +%H:%M:%S)) ==="
  canary "patch $tag duckdb"
  GRAFT_ONLY=$KEYS python3 tools/bench_duckdb.py $dir \
    /tmp/graft_out_r9/oracle_sql.json 3 2>/dev/null \
    | grep -F '"metric"' > "$OUT/duck_patch_$tag.json"
}

run_sf sf0.1 /root/testdata/sf0.1
run_sf sf1 benchdata/sf1
run_sf sf10 benchdata/sf10
run_sf sf100 benchdata/sf100
echo "=== PATCH DONE ($(date +%H:%M:%S)) ==="
