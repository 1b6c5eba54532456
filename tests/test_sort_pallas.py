"""Interpret-mode bit-equality of the Pallas bitonic pair sort vs lax.sort
(the chain-stage sort's candidate replacement — ops/sort_pallas.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from claragenomicsanalysis_tpu.ops.sort_pallas import bitonic_sort_pairs


def _check(k1, k2, logV):
    g1, g2 = bitonic_sort_pairs(jnp.asarray(k1), jnp.asarray(k2),
                                logV=logV, interpret=True)
    w1, w2 = jax.lax.sort((jnp.asarray(k1), jnp.asarray(k2)),
                          num_keys=2, is_stable=False)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(w2))


@pytest.mark.parametrize("n,logV", [(1024, 10), (4096, 10), (8192, 12),
                                    (16384, 11)])
def test_random_pairs_match_lax_sort(rng, n, logV):
    k1 = rng.integers(0, 2**32, n).astype(np.uint32)
    k1[::3] = k1[0]                      # duplicate keys drive the k2 tiebreak
    k2 = rng.integers(0, 2**32, n).astype(np.uint32)
    _check(k1, k2, logV)


def test_degenerate_inputs(rng):
    n = 2048
    # all-equal, pre-sorted ascending, reverse-sorted, sentinel-heavy
    for k1 in (np.zeros(n, np.uint32),
               np.arange(n, dtype=np.uint32),
               np.arange(n, dtype=np.uint32)[::-1].copy(),
               np.where(rng.random(n) < 0.5, np.uint32(0xFFFFFFFF),
                        np.uint32(7)).astype(np.uint32)):
        k2 = rng.integers(0, 2**32, n).astype(np.uint32)
        _check(k1, k2, 10)


def test_chain_sort_shaped_keys(rng):
    """Keys shaped like the pack2 chain sort: key1 = qid<<16|tid<<1|dir with
    UMAX sentinels for invalid rows, key2 = qp<<16|st16."""
    n = 8192
    qid = rng.integers(0, 40, n).astype(np.uint32)
    tid = rng.integers(0, 40, n).astype(np.uint32)
    d = rng.integers(0, 2, n).astype(np.uint32)
    k1 = (qid << 16) | (tid << 1) | d
    k2 = (rng.integers(0, 1 << 16, n).astype(np.uint32) << 16) \
        | rng.integers(0, 1 << 16, n).astype(np.uint32)
    inv = rng.random(n) < 0.3
    k1[inv] = np.uint32(0xFFFFFFFF)
    k2[inv] = np.uint32(0xFFFFFFFF)
    _check(k1, k2, 11)


def test_sort_backend_end_to_end(rng):
    """MapperConfig(sort_backend='pallas') must reproduce the default
    driver's overlaps exactly (interpret-mode kernel on CPU)."""
    from claragenomicsanalysis_tpu.core.config import MapperConfig
    from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
    from claragenomicsanalysis_tpu.models.mapper import map_all_vs_all
    from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                      PoissonGenomeSimulator)
    genome = PoissonGenomeSimulator(seed=21).build_reference(1200)
    sim = NoisyReadSimulator(seed=21, error_rate=0.03)
    seqs = [r.seq for r in sim.generate_reads(genome, 8, 250)]
    parser = FastaParser("<mem>", records=[
        FastaSequence(f"r{i}", s) for i, s in enumerate(seqs)])
    kw = dict(kmer_size=9, window_size=4, min_residues=2, min_overlap_len=40,
              min_overlap_fraction=0.2, min_bases_per_residue=1000)
    ref = map_all_vs_all(parser, MapperConfig(**kw))
    got = map_all_vs_all(parser,
                         MapperConfig(sort_backend="pallas", **kw))
    assert [o.key() for o in got.overlaps] == [o.key() for o in ref.overlaps]
    assert got.overlaps
