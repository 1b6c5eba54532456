#!/bin/bash
# Round-5 queue 5: validate the streamed/fori row-NW kernel + raised
# decode cap on chip (queue4's correct stages predate them) and take the
# final product-default numbers.
# Fire after bench_logs/QUEUE4_DONE (scripts/tpu_watch5.sh).
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

run nw_ablate5      python scripts/ablate_nw.py
run correct_full5   python scripts/bench_correct_scale.py --quality
run correct_full5_s8 python scripts/bench_correct_scale.py --quality --max-support 7
run correct_fenced5 python scripts/bench_correct_scale.py --runs 0 --fenced
run map_scale5      python scripts/bench_map_scale.py
run bench_all5      python scripts/bench_all.py
run headline5       python bench.py
echo "queue5 done ($(date +%H:%M:%S)); logs in bench_logs/${ts}_*.log"
