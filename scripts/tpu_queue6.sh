#!/bin/bash
# Round-5 final queue: everything with the full flip stack (ms7 default,
# int8 window transfer, streamed row kernel, banded-escalate) — the
# numbers the round ends on, plus a PROPER warm fenced correction split
# (queue5's used --runs 0, so its "split" was compile-polluted).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
ts=$(date +%m%d_%H%M)

run() {
  name=$1; shift
  for attempt in 1 2 3; do
    echo "== $name == ($(date +%H:%M:%S), attempt $attempt)"
    timeout 5400 "$@" 2>&1 | tee -a "bench_logs/${ts}_${name}.log" | tail -25
    rc=${PIPESTATUS[0]}
    [ "$rc" -eq 0 ] && return 0
    if tail -200 "bench_logs/${ts}_${name}.log" | grep -qiE "mosaic|scoped vmem|Rotate with|failed to legalize|NotImplementedError"; then
      echo "!! $name: deterministic compile error (rc=$rc) — recorded, not retried" \
        | tee -a "bench_logs/${ts}_${name}.log"
      return 1
    fi
    echo "!! $name exited rc=$rc (attempt $attempt, infra-retryable)" \
      | tee -a "bench_logs/${ts}_${name}.log"
    [ "$attempt" -lt 3 ] && sleep $((60 * attempt))
  done
  return 0
}

run correct_final    python scripts/bench_correct_scale.py --quality
run correct_fenced_w python scripts/bench_correct_scale.py --runs 1 --fenced
run bench_all6       python scripts/bench_all.py
run map_scale6       python scripts/bench_map_scale.py
run headline6        python bench.py
echo "queue6 done ($(date +%H:%M:%S)); logs in bench_logs/${ts}_*.log"
