#!/bin/bash
# r11 verdict task #3: q62's clean-window row, automated.
# Loop a canary until the host is quiet (>= QUIET effective cores of
# 32), then immediately fire the q62 Spark (fresh-JVM, warm 3-run
# median via graft.Explain) and DuckDB (3-run) legs back-to-back and
# exit. If the window never comes, the fallback adjudication is r8's
# quiet 13.0 s / 1.8x row (BASELINE protocol note).
set -u
cd /root/repo
OUT=${1:-/tmp/q62_quiet}
QUIET=${QUIET:-26}
TRIES=${TRIES:-120}
SLEEP=${SLEEP:-90}
mkdir -p "$OUT"

for i in $(seq 1 "$TRIES"); do
  c=$(python3 tools/canary.py 2>/dev/null | tail -1)
  p=$(echo "$c" | sed -n 's/.*parallelism=\([0-9.]*\).*/\1/p')
  echo "$(date +%H:%M:%S) try=$i $c" >> "$OUT/canary.log"
  ok=$(python3 -c "print(1 if float('$p' or 0) >= $QUIET else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date +%H:%M:%S) QUIET window (p=$p) — firing legs" \
      >> "$OUT/canary.log"
    rm -rf /tmp/graft_local-* /tmp/graft_db_* 2>/dev/null || true
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Explain benchdata/sf100 q62_nation_pairs" \
      2>/dev/null | grep '== q62' > "$OUT/spark.txt"
    GRAFT_ONLY=q62 python3 tools/bench_duckdb.py benchdata/sf100 \
      /tmp/graft_out/oracle_sql.json 3 2>/dev/null \
      | grep -F '"metric"' > "$OUT/duck.json"
    python3 tools/canary.py 2>/dev/null | tail -1 >> "$OUT/canary.log"
    echo "DONE" >> "$OUT/canary.log"
    cat "$OUT/spark.txt" "$OUT/duck.json"
    exit 0
  fi
  sleep "$SLEEP"
done
echo "NO QUIET WINDOW in $TRIES tries" >> "$OUT/canary.log"
exit 1
