#!/bin/bash
# r15 spike (verdict tasks 1 + 4).
#
# Task 1 done-check: q62_nation_pairs and q43_avg_subquery must run
# GREEN at sf300 with NO hand override — SpikeProf now defaults to the
# engine's scale-aware fan-out (EngineDefaults.initialShufflePartitions
# derives the AQE initial partition number from the data dir's bytes),
# the very rule the r14 spike showed was missing when q62's pinned
# shuffle_hash build died at static 32 partitions.
#
# Task 4: extend the at-scale evidence to the LLM-pipeline
# exchange-heavy keys — t18_keyterms (the suite's biggest absolute
# sf100 row, 71 s), d2_dedup_minhash (banded LSH candidate join), and
# t9_domain_cap (TypedImperativeAggregate partial mode). Linear = 3.0x
# per key vs the same key's sf100 leg in the same disk-bound regime.
#
# Disk phasing (r14 lesson): a single sf300 exchange leg writes >21 GB
# of shuffle scratch, so sf100 legs run first, benchdata/sf100 is
# DELETED, then sf300 legs run. Regenerate sf100 afterwards
# (tools/gen_scale.py 1000 benchdata/sf100) before any protocol.
#
# Usage: nohup bash tools/run_spike_r15.sh > /tmp/spike_r15/driver.log 2>&1 &
set -u
cd /root/repo
OUT=/tmp/spike_r15
mkdir -p $OUT

# sf100 legs only for the keys whose sf300 row needs a same-regime
# ratio denominator (the LLM-pipeline extension). q62/q43 at sf300 are
# PASS/FAIL done-checks for the sizing rule — their sf100 evidence
# already exists (r14 spike + this round's isolated rows), so skipping
# their sf100 legs buys the wall-clock the round budget needs.
SF100_KEYS="${SPIKE_SF100_KEYS:-t18_keyterms d2_dedup_minhash t9_domain_cap}"
SF300_KEYS="${SPIKE_SF300_KEYS:-q62_nation_pairs q43_avg_subquery t18_keyterms d2_dedup_minhash t9_domain_cap}"
SF300_TABLES="lineitem orders customer supplier nation region documents"

guard() {
  # contention guard (r14 lesson / verdict task 3): refuse to launch a
  # leg while another sbt/graft JVM or a DuckDB replay is live
  while ps -eo pid,args | grep -E "[s]bt-launch|[j]ava @/tmp/sbt-args|[b]ench_duckdb" \
      | grep -vw $$ > /dev/null; do
    echo "[guard] another graft JVM/replay is live — waiting 60s $(date +%H:%M:%S)"
    sleep 60
  done
}

leg() {
  local key=$1 sf=$2
  guard
  echo "--- $key @ $sf $(date +%H:%M:%S)"
  echo "--- canary before $key@$sf" >> $OUT/canary.log
  python3 tools/canary.py >> $OUT/canary.log 2>&1
  df -h / | tail -1
  SPARK_DRIVER_MEM=64g \
    sbt -batch "Test/runMain graft.prof.SpikeProf benchdata/$sf $key" \
    > $OUT/leg_${key}_${sf}.stdout 2>&1
  grep "== " $OUT/leg_${key}_${sf}.stdout | tee -a $OUT/results.log
  grep -m1 "No space left\|OutOfMemory\|Can't acquire" $OUT/leg_${key}_${sf}.stdout \
    && echo "[$key@$sf FAILED — see leg log]" | tee -a $OUT/results.log
  rm -rf /tmp/graft_db_* /tmp/graft_scratch_* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
}

echo "=== phase A: sf100 legs $(date +%H:%M:%S)"
for key in $SF100_KEYS; do leg $key sf100; done

echo "=== phase B: delete sf100, generate sf300 subset $(date +%H:%M:%S)"
rm -rf benchdata/sf100
df -h / | tail -1
python3 tools/gen_scale_subset.py 3000 benchdata/sf300 $SF300_TABLES \
  > $OUT/gen_sf300.log 2>&1
df -h / | tail -1

echo "=== phase C: sf300 legs (scale-aware fan-out, NO override) $(date +%H:%M:%S)"
for key in $SF300_KEYS; do leg $key sf300; done

echo "=== phase D: q62 regression arm — pin the old static 32 to show the defect stayed fixed-by-design, not by luck"
guard
SPARK_GRAFT_SHUFFLE=32 SPARK_DRIVER_MEM=64g \
  sbt -batch "Test/runMain graft.prof.SpikeProf benchdata/sf300 q62_nation_pairs" \
  > $OUT/leg_q62_sf300_static32.stdout 2>&1
grep -E "== |Can't acquire" $OUT/leg_q62_sf300_static32.stdout | head -3 \
  | tee -a $OUT/results.log

echo "=== phase E: delete sf300, regenerate sf100 $(date +%H:%M:%S)"
rm -rf benchdata/sf300
python3 tools/gen_scale.py 1000 benchdata/sf100 > $OUT/gen_sf100.log 2>&1
df -h / | tail -1
echo "=== spike done $(date +%H:%M:%S)"
