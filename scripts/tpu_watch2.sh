#!/bin/bash
# Chained watcher: wait for the primary queue's QUEUE_DONE marker, then
# fire the follow-up measurement queue (scripts/tpu_queue2.sh).
#   setsid nohup bash scripts/tpu_watch2.sh > bench_logs/watch2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
rm -f bench_logs/QUEUE2_DONE

while [ ! -f bench_logs/QUEUE_DONE ]; do
  sleep 60
done
echo "primary queue done at $(date +%H:%M:%S); firing queue2"
bash scripts/tpu_queue2.sh
touch bench_logs/QUEUE2_DONE
echo "queue2 finished at $(date +%H:%M:%S)"
