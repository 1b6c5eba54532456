"""Randomized differential stress of the POA v2 lockstep backend.

Runs N random (BatchSize, scores, msa, banded) configurations through BOTH
the XLA program (models.poa._build_program) and the pallas2 lockstep kernels
(interpret mode) and asserts every output array is bit-identical.  Slower
than the unit fuzz in tests/test_poa_pallas2.py (minutes, not seconds) —
run before chip-day or after touching ops/poa_pallas2.py.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/stress_poa_v2.py [trials]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores  # noqa: E402
from claragenomicsanalysis_tpu.models.poa import _build_program  # noqa: E402
from claragenomicsanalysis_tpu.ops.poa_pallas2 import poa_batch_pallas2  # noqa: E402
from claragenomicsanalysis_tpu.utils.genomeutils import (  # noqa: E402
    encode, generate_random_genome, mutate_sequence)


def make(bs, W, S, blen, nmut, rng):
    L = bs.padded_seq
    seqs = np.full((W, S, L), -1, np.int32)
    weights = np.zeros((W, S, L), np.int32)
    lens = np.zeros((W, S), np.int32)
    n_seqs = rng.integers(1, S + 1, W).astype(np.int32)
    for wi in range(W):
        base = generate_random_genome(int(rng.integers(max(8, blen // 2),
                                                       blen + 1)), rng)
        for si in range(S):
            s = mutate_sequence(base, int(rng.integers(0, nmut + 1)),
                                rng)[:bs.max_sequence_size]
            seqs[wi, si, :len(s)] = encode(s)
            weights[wi, si, :len(s)] = 1 + int(rng.integers(0, 3))
            lens[wi, si] = len(s)
    return seqs, weights, lens, n_seqs


def main() -> int:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    fails = 0
    for trial in range(trials):
        rng = np.random.default_rng(1000 + trial)
        P = int(rng.choice([2, 3, 4, 6]))
        A = int(rng.choice([1, 2, 4]))
        msa = bool(rng.integers(0, 2))
        bw = int(rng.choice([0, 12, 24]))
        bs = BatchSize(max_sequence_size=int(rng.choice([24, 40, 56])),
                       max_sequences_per_poa=int(rng.choice([3, 4, 6])),
                       max_pred_per_node=P, max_aligned_per_node=A,
                       max_nodes_per_window=int(rng.choice([48, 96])),
                       band_width=bw or 16)
        banded = bw > 0
        args = make(bs, W=int(rng.integers(2, 7)),
                    S=bs.max_sequences_per_poa,
                    blen=bs.max_sequence_size - 6, nmut=7, rng=rng)
        sc = PoaScores()
        want = _build_program(bs, sc, msa, banded)(*args)
        got = poa_batch_pallas2(*args, bs, sc, banded=banded, msa=msa,
                                interpret=True)
        ok = all(np.array_equal(np.asarray(g), np.asarray(w))
                 for g, w in zip(got, want))
        print(f"trial {trial}: P={P} A={A} msa={msa} banded={banded} "
              f"nodes={bs.max_nodes_per_window} -> "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        fails += not ok
    print("STRESS_DONE fails =", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
