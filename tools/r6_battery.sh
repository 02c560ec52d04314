#!/bin/bash
# Round-6 scaling battery: same three pairs as the r5 re-base
# (tools/r5_battery.sh items 1-3), run to give the revised official
# band (BENCH/BASELINE.md, r6 reconciliation) a same-round data point.
# Sequential; each inner run is load-gated by bench.py (wait_for_quiet)
# and interleaved by level. The engine's crawl path is UNCHANGED in r6
# (the r6 optimizations touch the query surface and codecs), so this
# measures windows + reproducibility, not new engine code.
set -u
cd /root/repo
LOG=${1:-/tmp/r6_battery.log}
echo "=== r6 battery start $(date -u +%H:%MZ) loadavg $(cut -d' ' -f1 /proc/loadavg)" | tee -a $LOG

echo "--- [1/3] threads 8->32 single round, 2M" | tee -a $LOG
SPARK_GRAFT_SCALE_LEVELS=8,32 python bench.py --scaling >> $LOG 2>&1

echo "--- [2/3] threads 8->32, 4 rounds pipelined, 2M" | tee -a $LOG
SPARK_GRAFT_SCALE_LEVELS=8,32 SPARK_GRAFT_SCALE_ROUNDS=4 SPARK_GRAFT_PIPELINE=1 \
  python bench.py --scaling >> $LOG 2>&1

echo "--- [3/3] executors 1->4 (local-cluster, 4 cores each), 2M" | tee -a $LOG
SPARK_GRAFT_SCALE_MODE=executors SPARK_GRAFT_SCALE_LEVELS=1,4 \
  python bench.py --scaling >> $LOG 2>&1

echo "=== r6 battery done $(date -u +%H:%MZ)" | tee -a $LOG
