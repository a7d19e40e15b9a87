#!/bin/bash
# Round-13 baseline completion: the r12 protocol's sf100/sf100c/sf10
# legs ran to completion on r12-final code (archived under
# bench_legs/r12/ — the round ended during the sf10 isolate pass);
# this runner measures the two missing legs (sf1, sf0.1) with the same
# method, then the sf10 isolate keys the cutoff dropped, then fresh
# isolated rows for the keys r13 changed (q62/q25/q9) at sf100+sf10 so
# BASELINE can publish post-change columns beside the archived legs.
set -e
cd /root/repo
OUT=/tmp/baseline_r13
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
  echo "=== $tag isolate ($(date +%H:%M:%S)) ==="
  canary "$tag isolate"
  python3 tools/isolate_flagged.py "$OUT/spark_$tag.json" \
    "$OUT/duck_$tag.json" "$dir" "$OUT/iso_$tag.json" \
    2>&1 | tee -a "$OUT/isolate.log"
  clean
}

run_sf sf1 benchdata/sf1 "" ""
run_sf sf0.1 /root/testdata/sf0.1 "" ""

# The sf10 isolate keys the r12 cutoff dropped (8 of 17 completed),
# plus the three r13-changed keys, measured fresh-JVM each with the
# isolate method (graft.Explain: untimed warm-up + 3-run median).
iso_patch() {
  local tag=$1 dir=$2; shift 2
  canary "$tag iso_patch"
  for k in "$@"; do
    clean
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Explain $dir $k" 2>/dev/null \
      | grep "==" >> "$OUT/iso_patch_$tag.txt"
  done
  clean
}
iso_patch sf10 benchdata/sf10 \
  q62_nation_pairs q47_salted_join c_dag_model q27b_approx_countd \
  q5_multijoin q27_countd q59_stream_dedup c_incr_partition \
  q39_stream_window q25_stats_agg q9_topk
iso_patch sf100 benchdata/sf100 q9_topk

echo "=== DONE ($(date +%H:%M:%S)) ==="
