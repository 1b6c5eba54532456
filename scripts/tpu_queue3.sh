#!/bin/bash
# Round-5 queue: everything queue2 doesn't cover.
# 1. The 20 Mbp contradiction (VERDICT r4 Next #3): best-of-3 unfenced +
#    a fenced split on the same config — one reproducible number.
# 2. Config #5 at the full 1000x5kb scale with the consensus-kernel VMEM
#    fix in place (queue2's correct stages run the smaller 400x3000).
# 3. A fenced 100 Mbp with the new sketch sub-ranges (encode/pack/xfer/
#    kernel), the trimmed transfer, and the fixed fence accounting.
# 4. Gbp re-run: the pair loop now pipelines compaction one pair behind
#    and ships trimmed sketch transfers — re-measure the 1.34 Mbp/s row.
# Fire after bench_logs/QUEUE2_DONE (scripts/tpu_watch3.sh does that).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
ts=$(date +%m%d_%H%M)

# Retry discipline (VERDICT r4 Next #7): transient INFRA failures (axon
# compile-helper 500s, tunnel drops) retry up to 3x with backoff; a
# Mosaic/VMEM compile error is deterministic — record it and stop.
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

run map_20mbp_b3     python scripts/bench_map_scale.py --mbp 20 --runs 3
run map_20mbp_fenced python scripts/bench_map_scale.py --mbp 20 --fenced --runs 1
run map_fenced_split python scripts/bench_map_scale.py --fenced --runs 1
run map_scale3       python scripts/bench_map_scale.py
run correct_full     python scripts/bench_correct_scale.py
run correct_full_fenced python scripts/bench_correct_scale.py --runs 0 --fenced
run poa_phases3      python scripts/profile_poa_phases.py --pileup
run headline3        python bench.py
run bench_all3       python scripts/bench_all.py
run map_gbp2         python scripts/bench_map_scale.py --mbp 1000 --runs 1
echo "queue3 done ($(date +%H:%M:%S)); logs in bench_logs/${ts}_*.log"
