#!/bin/bash
# One-shot TPU measurement queue: run everything that needs the chip, in
# dependency order, logging to bench_logs/.  Fire this the moment the
# axon tunnel comes back after an outage.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
ts=$(date +%m%d_%H%M)

run() {
  name=$1; shift
  echo "== $name == ($(date +%H:%M:%S))"
  timeout 2400 "$@" 2>&1 | tee "bench_logs/${ts}_${name}.log" | tail -30
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && echo "!! $name exited rc=$rc" | tee -a "bench_logs/${ts}_${name}.log"
}

run myers_unroll  python scripts/ablate_myers_unroll.py
run nw_diag       python scripts/ablate_nw_diag.py
run sort_ablate   python scripts/ablate_sort.py
run poa_v2_small  python scripts/bench_poa_v2.py --probe-tb
run poa_v2_wpg    python scripts/bench_poa_v2.py --wpg
run poa_phases    python scripts/profile_poa_phases.py
run poa_v2_pileup python scripts/bench_poa_v2.py --pileup
run poa_v2_msa    python scripts/bench_poa_v2.py --msa
run bench_all     python scripts/bench_all.py
run map_scale     python scripts/bench_map_scale.py
run map_scale_ps  python scripts/bench_map_scale.py --sort-backend pallas
run headline      python bench.py
echo "queue done ($(date +%H:%M:%S)); logs in bench_logs/${ts}_*.log"
