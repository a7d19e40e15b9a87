#!/bin/bash
# Round-11 baseline, phase 2 — runs AFTER the r11 perf port (native
# scaled-long dsum, d9 shingle sigs, d1/d1b binary sigs) lands in src:
#   1. the sf100c DuckDB leg (its Spark half ran pre-port; c_ gates are
#      write-dominated and only c_bucketed_join/c_orc_roundtrip changed
#      plans — both are re-measured in the targeted pass below),
#   2. a targeted sf100 Spark re-measure of every key whose plan the
#      port changed (the DuckDB sf100 leg stays valid: oracle SQL is
#      untouched),
#   3. full sf10 / sf1 / sf0.1 legs on the ported code.
set -e
cd /root/repo
OUT=/tmp/baseline_r11
mkdir -p "$OUT"

clean() { rm -rf /tmp/graft_local-* /tmp/graft_db_* 2>/dev/null || true; }

canary() {
  echo "--- canary before $1 ($(date +%H:%M:%S))" >> "$OUT/canary.log"
  python3 tools/canary.py >> "$OUT/canary.log" 2>&1 || true
}

spark_leg() {
  local tag=$1 dir=$2 excl=$3 only=$4
  echo "=== $tag spark ($(date +%H:%M:%S)) ==="
  clean
  canary "$tag spark"
  rm -f bench_full.json bench_headline.json
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_EXCLUDE=$excl SPARK_GRAFT_ONLY=$only \
    sbt -batch "runMain graft.Bench" > "$OUT/spark_$tag.stdout" 2>/dev/null
  if [ -s bench_full.json ]; then
    cp bench_full.json "$OUT/spark_$tag.json"
  else
    grep -F '"metric":"queries_full"' "$OUT/spark_$tag.stdout" \
      | sed 's/^\[info\] //' > "$OUT/spark_$tag.json"
  fi
}

duck_leg() {
  local tag=$1 dir=$2 excl=$3 only=$4
  echo "=== $tag duckdb ($(date +%H:%M:%S)) ==="
  canary "$tag duckdb"
  GRAFT_EXCLUDE=$excl GRAFT_ONLY=$only python3 tools/bench_duckdb.py $dir \
    /tmp/graft_out/oracle_sql.json 3 2>/dev/null \
    | grep -F '"metric"' > "$OUT/duck_$tag.json"
  clean
}

# every key whose physical plan the r11 port changed (exact prefixes)
# (c_bucketed_join / c_orc_roundtrip also use dsum, but only in small
# verification sub-queries of write-dominated gates measured in the
# sf100c leg — not re-measured; their sf100c rows carry the old plans)
CHANGED="q1_,q3_,q5_,q6_,q7_,q10_,q11_,q16_,q28_,q29_,q36_,q38_,q41_,q43_,q44_,q47_,q65_,d1_,d1b_,d9_"

duck_leg  sf100c benchdata/sf100 "" c_
spark_leg sf100patch benchdata/sf100 "" "$CHANGED"
spark_leg sf10 benchdata/sf10 "" ""
duck_leg  sf10 benchdata/sf10 "" ""
spark_leg sf1 benchdata/sf1 "" ""
duck_leg  sf1 benchdata/sf1 "" ""
spark_leg sf0.1 /root/testdata/sf0.1 "" ""
duck_leg  sf0.1 /root/testdata/sf0.1 "" ""
echo "=== PHASE2 DONE ($(date +%H:%M:%S)) ==="
