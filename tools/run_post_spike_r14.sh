#!/bin/bash
# r14 post-spike batch: reclaim the sf300 disk, rebuild sf100, then
# run the two remaining verdict measurements that need sf100 and
# shuffle headroom:
#   - Q47Prof (task 5): hot/cold split vs stock AQE skew join, plus a
#     shuffle-partition sweep arm (64) — the stock arm's shuffle is
#     what ENOSPC'd beside sf300, hence the ordering.
#   - StreamEquivProf (task 2): q39/q67 stream-vs-batch equivalence.
# Usage: nohup bash tools/run_post_spike_r14.sh > /tmp/post_spike_r14.log 2>&1 &
set -u
cd /root/repo

echo "=== delete sf300 $(date +%H:%M:%S)"
rm -rf benchdata/sf300
df -h / | tail -1

echo "=== regenerate sf100 $(date +%H:%M:%S)"
python3 tools/gen_scale.py 1000 benchdata/sf100
df -h / | tail -1

clean() { rm -rf /tmp/graft_db_* /tmp/graft_scratch_* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true; }

echo "=== q47 A/B @ sf100 $(date +%H:%M:%S)"
python3 tools/canary.py
clean
SPARK_GRAFT_SF_DIR=benchdata/sf100 SPARK_DRIVER_MEM=64g \
  sbt -batch "Test/runMain graft.prof.Q47Prof" 2>&1 \
  | grep -E "shuffle.partitions|== |No space left" | tee /tmp/q47_ab.log
clean
echo "=== q47 sweep shuffle=64 $(date +%H:%M:%S)"
python3 tools/canary.py
SPARK_GRAFT_SF_DIR=benchdata/sf100 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=64 \
  sbt -batch "Test/runMain graft.prof.Q47Prof" 2>&1 \
  | grep -E "shuffle.partitions|== |No space left" | tee -a /tmp/q47_ab.log
clean

echo "=== q39/q67 stream-vs-batch @ sf100 $(date +%H:%M:%S)"
python3 tools/canary.py
SPARK_GRAFT_SF_DIR=benchdata/sf100 SPARK_DRIVER_MEM=64g \
  sbt -batch "Test/runMain graft.prof.StreamEquivProf" 2>&1 \
  | grep -E "== |No space left" | tee /tmp/stream_equiv.log
clean
python3 tools/canary.py
echo "=== post-spike batch done $(date +%H:%M:%S)"
