#!/bin/bash
# Chained watcher: wait for queue3's QUEUE3_DONE marker, then fire
# scripts/tpu_queue4.sh.
#   setsid nohup bash scripts/tpu_watch4.sh > bench_logs/watch4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
rm -f bench_logs/QUEUE4_DONE
start_mark=$(mktemp bench_logs/.watch4_start.XXXXXX)

while [ ! bench_logs/QUEUE3_DONE -nt "$start_mark" ]; do
  sleep 60
done
rm -f "$start_mark"
echo "queue3 done at $(date +%H:%M:%S); firing queue4"
bash scripts/tpu_queue4.sh
touch bench_logs/QUEUE4_DONE
echo "queue4 finished at $(date +%H:%M:%S)"
