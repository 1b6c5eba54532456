#!/bin/bash
# Chained watcher: wait for the primary queue's QUEUE_DONE marker, then
# fire the follow-up measurement queue (scripts/tpu_queue2.sh).
#   setsid nohup bash scripts/tpu_watch2.sh > bench_logs/watch2.log 2>&1 &
#
# Staleness guard: only a QUEUE_DONE stamped AFTER this watcher started
# counts — a leftover marker from a previous round must not fire queue2
# against a possibly-down tunnel and stamp QUEUE2_DONE over empty logs.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
rm -f bench_logs/QUEUE2_DONE
start_mark=$(mktemp bench_logs/.watch2_start.XXXXXX)

while [ ! bench_logs/QUEUE_DONE -nt "$start_mark" ]; do
  sleep 60
done
rm -f "$start_mark"
echo "primary queue done at $(date +%H:%M:%S); firing queue2"
bash scripts/tpu_queue2.sh
touch bench_logs/QUEUE2_DONE
echo "queue2 finished at $(date +%H:%M:%S)"
