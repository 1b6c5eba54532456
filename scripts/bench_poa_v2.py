"""Compare POA v1 (in-kernel SMEM) vs v2 (lockstep-over-windows) on TPU.

Run: python scripts/bench_poa_v2.py [--msa] [--large]
"""

import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    from claragenomicsanalysis_tpu.bench.harness import time_scanned
    from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores
    from claragenomicsanalysis_tpu.ops.poa_pallas import poa_batch_pallas
    from claragenomicsanalysis_tpu.ops.poa_pallas2 import (
        VMEM_BUDGET, poa_batch_pallas2, vmem_bytes_estimate)
    from claragenomicsanalysis_tpu.utils.genomeutils import (
        encode, generate_random_genome, mutate_sequence)

    msa = "--msa" in sys.argv
    if "--large" in sys.argv:
        bs = BatchSize(max_sequence_size=512, max_sequences_per_poa=16,
                       max_pred_per_node=4, max_aligned_per_node=4,
                       max_nodes_per_window=1024)
        blen = 480
    elif "--pileup" in sys.argv:
        # correction-shaped: models/correct.py's window config (S = 16
        # supporting segments, P = S so every branch can be tracked)
        bs = BatchSize(max_sequence_size=256, max_sequences_per_poa=16,
                       max_pred_per_node=16, max_aligned_per_node=8,
                       max_nodes_per_window=512)
        blen = 250
    else:
        bs = BatchSize(max_sequence_size=128, max_sequences_per_poa=8,
                       max_pred_per_node=4, max_aligned_per_node=4,
                       max_nodes_per_window=256)
        blen = 100
    sc = PoaScores()
    W, S, L = 128, bs.max_sequences_per_poa, bs.padded_seq
    rng = np.random.default_rng(0)
    K = 4

    datasets = []
    for _ in range(K):
        seqs = np.full((W, S, L), -1, np.int32)
        weights = np.zeros((W, S, L), np.int32)
        lens = np.zeros((W, S), np.int32)
        n_seqs = np.full(W, S, np.int32)
        for wi in range(W):
            base = generate_random_genome(blen, rng)
            for si in range(S):
                s = mutate_sequence(base, max(5, blen // 20), rng)
                s = s[: bs.max_sequence_size]
                seqs[wi, si, : len(s)] = encode(s)
                weights[wi, si, : len(s)] = 1
                lens[wi, si] = len(s)
        datasets.append((seqs, weights, lens, n_seqs))

    N = bs.padded_nodes
    cells = W * (S - 1) * N * (bs.padded_seq + 1)

    variants = [
        ("v1", functools.partial(poa_batch_pallas, bs=bs, sc=sc, msa=msa)),
        ("v2", functools.partial(poa_batch_pallas2, bs=bs, sc=sc, msa=msa)),
    ]
    if "--probe-tb" in sys.argv:
        variants.append(
            ("v2-probe", functools.partial(poa_batch_pallas2, bs=bs, sc=sc,
                                           msa=msa, moves_tb=False)))
    if "--wpg" in sys.argv:
        for wpg in (1, 2, 4, 16):
            variants.append(
                (f"v2-wpg{wpg}", functools.partial(
                    poa_batch_pallas2, bs=bs, sc=sc, msa=msa, WPG=wpg),
                 wpg))
    for name, program, *rest in variants:
        wpg = rest[0] if rest else 8
        need = vmem_bytes_estimate(bs, msa, WPG=wpg)
        if name.startswith("v2") and need > VMEM_BUDGET:
            print(json.dumps({
                "kernel": name, "skipped": "plane layout exceeds VMEM",
                "MiB": need >> 20}), flush=True)
            continue
        fn = lambda s, w, l, n: program(s, w, l, n)[5]  # noqa: E731
        try:
            dt = time_scanned(fn, datasets, loops=2)
        except Exception as e:  # e.g. Mosaic block-shape limits for WPG<8
            print(json.dumps({"kernel": name,
                              "skipped": type(e).__name__,
                              "detail": str(e).split("\n")[0][:160]}),
                  flush=True)
            continue
        print(json.dumps({
            "kernel": name, "msa": msa,
            "batch_ms": round(dt * 1e3, 2),
            "Gcells_s": round(cells / dt / 1e9, 3),
            "detail": f"{W}x{S}x{blen}bp N={N} L={L}"}), flush=True)


if __name__ == "__main__":
    main()
