#!/bin/bash
# Round-8 baseline protocol (verify skill §4): Spark bench + DuckDB
# replay per SF, sequential, src frozen while this runs.
set -e
cd /root/repo
OUT=/tmp/baseline_r8
mkdir -p "$OUT"

clean() { rm -rf /tmp/graft_local-* /tmp/graft_db_* 2>/dev/null || true; }

run_sf() {
  local tag=$1 dir=$2 excl=$3
  echo "=== $tag spark ($(date +%H:%M:%S)) ==="
  clean
  if [ -n "$excl" ]; then
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_EXCLUDE=$excl sbt -batch "runMain graft.Bench" 2>/dev/null \
      | grep -F '"metric":"queries_full"' | sed 's/^\[info\] //' > "$OUT/spark_$tag.json"
  else
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" 2>/dev/null \
      | grep -F '"metric":"queries_full"' | sed 's/^\[info\] //' > "$OUT/spark_$tag.json"
  fi
  echo "=== $tag duckdb ($(date +%H:%M:%S)) ==="
  GRAFT_EXCLUDE=$excl python3 tools/bench_duckdb.py $dir \
    /tmp/graft_out/oracle_sql.json 3 2>/dev/null \
    | grep -F '"metric"' > "$OUT/duck_$tag.json"
  clean
}

run_sf sf0.1 /root/testdata/sf0.1 ""
run_sf sf1 benchdata/sf1 ""
run_sf sf10 benchdata/sf10 ""
run_sf sf100 benchdata/sf100 c_
echo "=== DONE ($(date +%H:%M:%S)) ==="
