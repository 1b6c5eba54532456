#!/bin/bash
# One-shot TPU measurement queue: run everything that needs the chip, in
# dependency order, logging to bench_logs/.  Fire this the moment the
# axon tunnel comes back after an outage.
#
# Round-4 hardening: each stage retries ONCE after a 60 s pause on nonzero
# rc — round 3 permanently lost two stages (bitonic preflight,
# bench_pipeline) to transient axon remote-compile HTTP 500s.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
ts=$(date +%m%d_%H%M)

run() {
  name=$1; shift
  for attempt in 1 2; do
    echo "== $name == ($(date +%H:%M:%S), attempt $attempt)"
    timeout 3600 "$@" 2>&1 | tee -a "bench_logs/${ts}_${name}.log" | tail -30
    rc=${PIPESTATUS[0]}
    [ "$rc" -eq 0 ] && return 0
    echo "!! $name exited rc=$rc (attempt $attempt)" | tee -a "bench_logs/${ts}_${name}.log"
    [ "$attempt" -eq 1 ] && sleep 60
  done
  return 0
}

# --- round-4 queue ---------------------------------------------------------
# 1. POA default flip confirmation: bench_all's POA lines now measure the
#    Batch "auto" routing (pallas2 WPG=16 on the small config); expect
#    >=1.0 Gcells/s on 128x8x100bp (r3 queue measured 1.297 at WPG=16).
# 2. Pileup phase profile: locate the v2 wall at P=S=16/250bp.
# 3. Sort ablate: XLA-variant baselines only — the Pallas bitonic knob
#    was RETIRED mid-round after losing the on-chip A/B at every size
#    (commit 'Retire the Pallas bitonic sort backend').
# 4. Fenced mapper profile: truthful per-stage splits at 100 Mbp.
# 5. Pipeline + correction numbers (config #4/#5).
# 6. Gbp-scale all-vs-all (capacity ratchet / index-store churn at the
#    scale they were built for).
run poa_v2_confirm   python scripts/bench_poa_v2.py --probe-tb
run poa_pileup_prof  python scripts/profile_poa_phases.py --pileup
run sort_ablate      python scripts/ablate_sort.py
run bench_all        python scripts/bench_all.py
run map_fenced       python scripts/bench_map_scale.py --fenced --runs 1
run map_scale        python scripts/bench_map_scale.py
run correct_scale    python scripts/bench_correct_scale.py
run roll16_probe     python scripts/probe_roll16.py
run map_gbp          python scripts/bench_map_scale.py --mbp 1000 --runs 1
run headline         python bench.py
echo "queue done ($(date +%H:%M:%S)); logs in bench_logs/${ts}_*.log"
