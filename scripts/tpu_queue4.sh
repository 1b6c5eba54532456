#!/bin/bash
# Round-5 queue 4: the config #5 product-default runs, re-fired with the
# full fix stack in the tree (128-window sliced POA dispatch, streamed
# consensus setup, wide-band Hirschberg routing, native pack) — queue3's
# correct_full* stages imported pre-fix code and recorded the crashes.
# Fire after bench_logs/QUEUE3_DONE (scripts/tpu_watch4.sh).
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
    if tail -40 "bench_logs/${ts}_${name}.log" | grep -qiE "mosaic|scoped vmem|Rotate with|NotImplementedError"; then
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

run correct_full4   python scripts/bench_correct_scale.py --quality
run correct_full_s8 python scripts/bench_correct_scale.py --quality --max-support 7
run correct_fenced4 python scripts/bench_correct_scale.py --runs 0 --fenced
run correct_w128s8b python scripts/bench_correct_scale.py --reads 400 --read-len 3000 --quality --window-length 128 --max-support 7
run map_scale4      python scripts/bench_map_scale.py
run bench_all4      python scripts/bench_all.py
run headline4       python bench.py
echo "queue4 done ($(date +%H:%M:%S)); logs in bench_logs/${ts}_*.log"
