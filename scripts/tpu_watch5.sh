#!/bin/bash
# Chained watcher: wait for queue4's QUEUE4_DONE marker, then fire
# scripts/tpu_queue5.sh.
#   setsid nohup bash scripts/tpu_watch5.sh > bench_logs/watch5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
rm -f bench_logs/QUEUE5_DONE
start_mark=$(mktemp bench_logs/.watch5_start.XXXXXX)

while [ ! bench_logs/QUEUE4_DONE -nt "$start_mark" ]; do
  sleep 60
done
rm -f "$start_mark"
echo "queue4 done at $(date +%H:%M:%S); firing queue5"
bash scripts/tpu_queue5.sh
touch bench_logs/QUEUE5_DONE
echo "queue5 finished at $(date +%H:%M:%S)"
