#!/bin/bash
# Round-4 follow-up measurements: everything that depends on the code
# landed DURING the first queue (NW assembly + guided topsort, packed
# sketch transfer, chain-start fill A/B, diag->row VMEM routing, pack2 id
# rebasing).  Fire after bench_logs/QUEUE_DONE appears (scripts/
# tpu_watch2.sh does that automatically).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
ts=$(date +%m%d_%H%M)

run() {
  name=$1; shift
  for attempt in 1 2; do
    echo "== $name == ($(date +%H:%M:%S), attempt $attempt)"
    timeout 3600 "$@" 2>&1 | tee -a "bench_logs/${ts}_${name}.log" | tail -25
    rc=${PIPESTATUS[0]}
    [ "$rc" -eq 0 ] && return 0
    echo "!! $name exited rc=$rc (attempt $attempt)" | tee -a "bench_logs/${ts}_${name}.log"
    [ "$attempt" -eq 1 ] && sleep 60
  done
  return 0
}

run pipeline_repro   python scripts/repro_pipeline.py
run poa_v2_small2    python scripts/bench_poa_v2.py --probe-tb
run poa_v2_pileup2   python scripts/bench_poa_v2.py --pileup
run poa_v2_msa2      python scripts/bench_poa_v2.py --msa
run poa_phases2      python scripts/profile_poa_phases.py --pileup
run start_fill_ab    python scripts/ablate_start_fill.py
run map_fenced2      python scripts/bench_map_scale.py --fenced --runs 1
run correct_w500     python scripts/bench_correct_scale.py --reads 400 --read-len 3000 --quality --window-length 500
run correct_w128     python scripts/bench_correct_scale.py --reads 400 --read-len 3000 --quality --window-length 128
run correct_w128s8   python scripts/bench_correct_scale.py --reads 400 --read-len 3000 --quality --window-length 128 --max-support 7
run correct_fenced   python scripts/bench_correct_scale.py --reads 400 --read-len 3000 --window-length 128 --fenced
run bench_all2       python scripts/bench_all.py
run headline2        python bench.py
echo "queue2 done ($(date +%H:%M:%S)); logs in bench_logs/${ts}_*.log"
