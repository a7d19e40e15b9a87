#!/bin/bash
# Round-10 baseline protocol (verify skill §4): Spark bench + DuckDB
# replay per SF, sequential, src frozen while this runs.
#
# r10: bench action is full-plan toRdd.count() for every key (count()
# let Catalyst prune pure-projection work); FORCE retired. All rows in
# this protocol are therefore NOT comparable with r1-r9 rows.
# r9 additions:
# - canary.py before every leg, logged to canary.log — the sandbox VM
#   is a shared-host guest whose effective core count swings (r9
#   measured 5-28 of 32); Spark and DuckDB legs run back-to-back per
#   SF so the RATIO stays meaningful even when absolutes are
#   throttled, and the canary trail documents the conditions.
# - a dedicated c_-only leg at sf100: the partition-at-a-time
#   clustering rewrite bounds c_compact_cluster's scratch, so the
#   engine write gates finally measure at sf100 (kept separate from
#   the main leg so a disk blow-up cannot kill the whole protocol).
set -e
cd /root/repo
OUT=/tmp/baseline_r10
mkdir -p "$OUT"

clean() { rm -rf /tmp/graft_local-* /tmp/graft_db_* 2>/dev/null || true; }

canary() {
  echo "--- canary before $1 ($(date +%H:%M:%S))" >> "$OUT/canary.log"
  python3 tools/canary.py >> "$OUT/canary.log" 2>&1 || true
}

run_sf() {
  local tag=$1 dir=$2 excl=$3 only=$4
  echo "=== $tag spark ($(date +%H:%M:%S)) ==="
  clean
  canary "$tag spark"
  rm -f bench_full.json bench_headline.json
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_EXCLUDE=$excl SPARK_GRAFT_ONLY=$only \
    sbt -batch "runMain graft.Bench" > "$OUT/spark_$tag.stdout" 2>/dev/null
  # Since r10 Bench writes its full-precision JSON as a file — no
  # stdout-framing dependence (grep of the stdout kept as fallback).
  if [ -s bench_full.json ]; then
    cp bench_full.json "$OUT/spark_$tag.json"
  else
    grep -F '"metric":"queries_full"' "$OUT/spark_$tag.stdout" \
      | sed 's/^\[info\] //' > "$OUT/spark_$tag.json"
  fi
  echo "=== $tag duckdb ($(date +%H:%M:%S)) ==="
  canary "$tag duckdb"
  GRAFT_EXCLUDE=$excl GRAFT_ONLY=$only python3 tools/bench_duckdb.py $dir \
    /tmp/graft_out/oracle_sql.json 3 2>/dev/null \
    | grep -F '"metric"' > "$OUT/duck_$tag.json"
  clean
}

run_sf sf0.1 /root/testdata/sf0.1 "" ""
run_sf sf1 benchdata/sf1 "" ""
run_sf sf10 benchdata/sf10 "" ""
run_sf sf100 benchdata/sf100 c_ ""
df -h / | tail -1
run_sf sf100c benchdata/sf100 "" c_
echo "=== DONE ($(date +%H:%M:%S)) ==="
