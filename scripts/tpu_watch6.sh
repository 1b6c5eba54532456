#!/bin/bash
# Chained watcher: fire scripts/tpu_queue6.sh after QUEUE5_DONE.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
rm -f bench_logs/QUEUE6_DONE
start_mark=$(mktemp bench_logs/.watch6_start.XXXXXX)
while [ ! bench_logs/QUEUE5_DONE -nt "$start_mark" ]; do
  sleep 60
done
rm -f "$start_mark"
echo "queue5 done at $(date +%H:%M:%S); firing queue6"
bash scripts/tpu_queue6.sh
touch bench_logs/QUEUE6_DONE
echo "queue6 finished at $(date +%H:%M:%S)"
