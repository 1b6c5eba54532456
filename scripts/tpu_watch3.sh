#!/bin/bash
# Chained watcher: wait for queue2's QUEUE2_DONE marker, then fire
# scripts/tpu_queue3.sh.
#   setsid nohup bash scripts/tpu_watch3.sh > bench_logs/watch3.log 2>&1 &
# Staleness guard: only a marker stamped AFTER this watcher started counts.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
rm -f bench_logs/QUEUE3_DONE
start_mark=$(mktemp bench_logs/.watch3_start.XXXXXX)

while [ ! bench_logs/QUEUE2_DONE -nt "$start_mark" ]; do
  sleep 60
done
rm -f "$start_mark"
echo "queue2 done at $(date +%H:%M:%S); firing queue3"
bash scripts/tpu_queue3.sh
touch bench_logs/QUEUE3_DONE
echo "queue3 finished at $(date +%H:%M:%S)"
