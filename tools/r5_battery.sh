#!/bin/bash
# Round-5 official scaling battery: ALL pairs re-based on the shipped
# engine in ONE window class (VERDICT r4 next-round item 1). Sequential
# (batteries must not contend with each other); each inner run is
# load-gated by bench.py (wait_for_quiet) and interleaved by level.
set -u
cd /root/repo
LOG=/tmp/r5_battery.log
echo "=== r5 battery start $(date -u +%H:%MZ) loadavg $(cut -d' ' -f1 /proc/loadavg)" | tee -a $LOG

echo "--- [1/4] threads 8->32 single round, 2M, pipelined-engine HEAD" | tee -a $LOG
SPARK_GRAFT_SCALE_LEVELS=8,32 python bench.py --scaling >> $LOG 2>&1

echo "--- [2/4] threads 8->32, 4 rounds pipelined, 2M" | tee -a $LOG
SPARK_GRAFT_SCALE_LEVELS=8,32 SPARK_GRAFT_SCALE_ROUNDS=4 SPARK_GRAFT_PIPELINE=1 \
  python bench.py --scaling >> $LOG 2>&1

echo "--- [3/4] executors 1->4 (local-cluster, 4 cores each), 2M" | tee -a $LOG
SPARK_GRAFT_SCALE_MODE=executors SPARK_GRAFT_SCALE_LEVELS=1,4 \
  python bench.py --scaling >> $LOG 2>&1

echo "--- [4/4] HEAD vs 1b79b23 interleaved A/B at the sf0.1 bench shape" | tee -a $LOG
git worktree add -f /tmp/ab_1b79b23 1b79b23 >> $LOG 2>&1 || true
for i in 1 2; do
  for side in pinned head; do
    if [ $side = pinned ]; then d=/tmp/ab_1b79b23; else d=/root/repo; fi
    echo "AB run $i side=$side loadavg $(cut -d' ' -f1 /proc/loadavg)" | tee -a $LOG
    (cd $d && SPARK_GRAFT_BENCH_REPEATS=2 python bench.py 2>/dev/null \
       | tail -1 | sed "s/^/AB_JSON $side $i /") >> $LOG 2>&1
  done
done
echo "=== r5 battery done $(date -u +%H:%MZ)" | tee -a $LOG
