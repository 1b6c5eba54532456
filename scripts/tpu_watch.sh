#!/bin/bash
# Tunnel watcher: probe the axon TPU tunnel every 5 minutes; the moment it
# answers, fire the measurement queue (scripts/tpu_queue.sh) and exit.
# Run detached (nohup) so it survives the driving session:
#   nohup bash scripts/tpu_watch.sh > bench_logs/watch.log 2>&1 &
# A marker file bench_logs/TUNNEL_UP is touched when the tunnel answers;
# bench_logs/QUEUE_DONE when the queue finishes.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
rm -f bench_logs/TUNNEL_UP bench_logs/QUEUE_DONE

while true; do
  echo "probe $(date +%H:%M:%S)"
  if timeout 90 python - <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("tunnel up:", d)
EOF
  then
    touch bench_logs/TUNNEL_UP
    echo "tunnel is UP at $(date +%H:%M:%S); firing queue"
    bash scripts/tpu_queue.sh
    touch bench_logs/QUEUE_DONE
    echo "queue finished at $(date +%H:%M:%S)"
    exit 0
  fi
  sleep 300
done
