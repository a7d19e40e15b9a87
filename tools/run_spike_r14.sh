#!/bin/bash
# r13 verdict task #1: the sf300 scale spike.
#
# The 100 TB design claims rest on "the exchange-pair floor scales
# linearly", extrapolated so far from 17 GB (sf100). This runs 8
# representative expensive read keys at sf300 (41 GB parquet, table
# subset via gen_scale_subset.py) and at sf100 BACK-TO-BACK in the
# same window, one fresh JVM per (key, sf) via graft.prof.SpikeProf
# (warm + 2 runs, explicit shuffle reaping — see its scaladoc for the
# disk arithmetic), so the sf300/sf100 ratio is throttle-comparable
# (linear = 3.0x). NOTE both legs run DISK-BOUND: 41 GB of sf300
# parquet evicts sf100 from page cache, which is the honest 100 TB
# regime (nothing is page-cached on a real cluster) but makes these
# sf100 rows incomparable to BASELINE's cache-warm isolated rows.
#
# Key selection: q5/q62/q3/q12/q28 (the exchange-pair floor class),
# q27 (distinct exchanges), d9 (corpus semi-join), t19 (documents
# exchange). Dropped from the verdict's list: t7 (rewritten this
# round — its floor changed), q14/q15 (smallest absolutes in the
# class, q3/q28 cover the mechanism), q47 (its stock-arm A/B drove
# the fs to 100% beside sf300; it gets a dedicated sf100 A/B after
# sf300 is deleted).
#
# Usage: nohup bash tools/run_spike_r14.sh > /tmp/spike_r14/driver.log 2>&1 &
set -u
cd /root/repo
OUT=/tmp/spike_r14
mkdir -p $OUT

KEYS="${SPIKE_KEYS:-q5_multijoin q62_nation_pairs q3_join_agg q12_case_when q28_cte q27_countd d9_contamination t19_corpus_report}"

for key in $KEYS; do
  echo "=== $key $(date +%H:%M:%S)"
  python3 tools/canary.py | tee -a $OUT/canary.log
  for sf in sf100 sf300; do
    echo "--- $key @ $sf $(date +%H:%M:%S)"
    df -h / | tail -1
    SPARK_DRIVER_MEM=64g \
      sbt -batch "Test/runMain graft.prof.SpikeProf benchdata/$sf $key" 2>/dev/null \
      | grep "==" | tee -a $OUT/results.log
    rm -rf /tmp/graft_db_* /tmp/graft_scratch_* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
  done
done
echo "=== spike done $(date +%H:%M:%S)"
