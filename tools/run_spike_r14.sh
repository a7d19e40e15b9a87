#!/bin/bash
# r13 verdict task #1: the sf300 scale spike.
#
# The 100 TB design claims rest on "the exchange-pair floor scales
# linearly", extrapolated so far from 17 GB (sf100). This measures 8
# representative expensive read keys at sf100 and sf300 (41 GB
# parquet, table subset via gen_scale_subset.py), one fresh JVM per
# (key, sf) via graft.prof.SpikeProf (warm + 2 runs, explicit shuffle
# reaping). Linear = 3.0x per key.
#
# PHASED, not per-key-paired: a single sf300 exchange leg of q5-class
# keys writes >21 GB of shuffle scratch (measured live: ENOSPC at
# 100% fs), which only fits after the 17 GB sf100 dataset is deleted.
# So all sf100 legs run first, sf100 is deleted, then all sf300 legs
# run with ~38 GB headroom. The phases sit ~30-60 min apart on a
# throttling host — canary is logged before every leg and the
# per-key ratio is read with that caveat (regenerate sf100 with
# gen_scale.py afterwards for the protocol).
#
# Both phases run DISK-BOUND (41 GB of sf300 parquet evicts sf100
# from page cache): the honest 100 TB regime, but these sf100 rows
# are NOT comparable to BASELINE's cache-warm isolated rows.
#
# Key selection: q5/q62/q3/q12/q28 (the exchange-pair floor class),
# q27 (distinct exchanges), d9 (corpus semi-join), t19 (documents
# exchange). Dropped from the verdict's 12: t7 (rewritten this round,
# floor changed), q14/q15 (smallest absolutes; q3/q28 cover the
# mechanism), q47 (dedicated sf100 A/B after sf300 is deleted).
#
# Usage: nohup bash tools/run_spike_r14.sh > /tmp/spike_r14/driver.log 2>&1 &
set -u
cd /root/repo
OUT=/tmp/spike_r14
mkdir -p $OUT

KEYS="${SPIKE_KEYS:-q5_multijoin q62_nation_pairs q3_join_agg q12_case_when q28_cte q27_countd d9_contamination t19_corpus_report}"

leg() {
  local key=$1 sf=$2
  echo "--- $key @ $sf $(date +%H:%M:%S)"
  echo "--- canary before $key@$sf" >> $OUT/canary.log
  python3 tools/canary.py >> $OUT/canary.log 2>&1
  df -h / | tail -1
  SPARK_DRIVER_MEM=64g \
    sbt -batch "Test/runMain graft.prof.SpikeProf benchdata/$sf $key" \
    > $OUT/leg_${key}_${sf}.stdout 2>&1
  grep "== " $OUT/leg_${key}_${sf}.stdout | tee -a $OUT/results.log
  grep -m1 "No space left\|OutOfMemory" $OUT/leg_${key}_${sf}.stdout \
    && echo "[$key@$sf FAILED — see leg log]" | tee -a $OUT/results.log
  rm -rf /tmp/graft_db_* /tmp/graft_scratch_* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
}

echo "=== phase A: sf100 legs $(date +%H:%M:%S)"
for key in $KEYS; do leg $key sf100; done

echo "=== phase B: delete sf100 to make shuffle headroom $(date +%H:%M:%S)"
rm -rf benchdata/sf100
df -h / | tail -1

echo "=== phase C: sf300 legs $(date +%H:%M:%S)"
for key in $KEYS; do leg $key sf300; done

echo "=== spike done $(date +%H:%M:%S) — regenerate sf100:"
echo "    python3 tools/gen_scale.py 1000 benchdata/sf100"
