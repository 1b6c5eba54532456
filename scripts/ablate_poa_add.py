"""On-device bisection of the POA kernel's add_alignment phase.

Run on the real TPU: python scripts/ablate_poa_add.py [small|large]

Uses the debug-only `skip` ablation flags of poa_batch_pallas (outputs are
WRONG when non-empty — timing only) and the honest-timing harness (scanned
dispatch, salted inputs; see bench/harness.py).  Phases:
  nw    graph-NW rows           tb   traceback walk
  add   graph extension         edge (within add) pred-scan/edge insertion
  slow  (within add) mismatch/insert/new-node branch
  cons  consensus walk
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def build_datasets(small: bool, K: int):
    from claragenomicsanalysis_tpu.core.config import BatchSize
    from claragenomicsanalysis_tpu.utils.genomeutils import (
        encode, generate_random_genome, mutate_sequence)

    if small:
        bs = BatchSize(max_sequence_size=128, max_sequences_per_poa=8,
                       max_pred_per_node=4, max_aligned_per_node=4,
                       max_nodes_per_window=256)
        W, blen, nerr = 128, 100, 5
    else:
        bs = BatchSize(max_sequence_size=512, max_sequences_per_poa=16,
                       max_pred_per_node=16, max_aligned_per_node=8,
                       max_nodes_per_window=1024)
        W, blen, nerr = 32, 256, 12
    S, L = bs.max_sequences_per_poa, bs.padded_seq
    rng = np.random.default_rng(0)
    datasets = []
    for _ in range(K):
        seqs = np.full((W, S, L), -1, np.int32)
        weights = np.zeros((W, S, L), np.int32)
        lens = np.zeros((W, S), np.int32)
        n_seqs = np.full(W, S, np.int32)
        for wi in range(W):
            base = generate_random_genome(blen, rng)
            for si in range(S):
                s = mutate_sequence(base, nerr, rng)[:bs.max_sequence_size]
                seqs[wi, si, : len(s)] = encode(s)
                weights[wi, si, : len(s)] = 1
                lens[wi, si] = len(s)
        datasets.append((seqs, weights, lens, n_seqs))
    cells = W * (S - 1) * bs.padded_nodes * (bs.padded_seq + 1)
    return bs, datasets, cells


def main():
    import jax
    from claragenomicsanalysis_tpu.bench.harness import time_scanned
    from claragenomicsanalysis_tpu.core.config import PoaScores
    from claragenomicsanalysis_tpu.ops.poa_pallas import poa_batch_pallas

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    small = (sys.argv[1] if len(sys.argv) > 1 else "small") == "small"
    bs, datasets, cells = build_datasets(small, K=4 if small else 2)
    sc = PoaScores()
    loops = 2 if small else 1

    combos = [
        ("full", ()),
        ("-cons", ("cons",)),
        ("-slow", ("slow",)),
        ("-edge", ("edge",)),
        ("-edge-slow", ("edge", "slow")),
        ("-add", ("add", "cons")),
        ("-tb-add", ("tb", "add", "cons")),
        ("-nw-tb-add", ("nw", "tb", "add", "cons")),
    ]
    for name, skip in combos:
        fn = (lambda sk: lambda s, w, l, n: poa_batch_pallas(
            s, w, l, n, bs, sc, skip=sk)[5])(skip)
        dt = time_scanned(fn, datasets, loops=loops)
        print(f"{name:12s} {dt*1e3:8.1f} ms   "
              f"{cells/dt/1e9:6.2f} Gcells/s", flush=True)


if __name__ == "__main__":
    main()
