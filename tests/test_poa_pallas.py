"""In-kernel Pallas POA (interpret mode on CPU) vs the XLA window program:
consensus codes/coverage/length/status bit-identical across random noisy
windows, degenerate windows, weights, overflow statuses, banding and band
failure, and alternative scoring."""

import numpy as np
import pytest

import jax.numpy as jnp

from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores
from claragenomicsanalysis_tpu.models.poa import _build_program
from claragenomicsanalysis_tpu.ops.poa_pallas import poa_batch_pallas
from claragenomicsanalysis_tpu.utils.genomeutils import (
    encode, generate_random_genome, mutate_sequence)


def _pack(bs, groups, wts=None):
    S, L = bs.max_sequences_per_poa, bs.padded_seq
    W = len(groups)
    seqs = np.full((W, S, L), -1, np.int32)
    weights = np.zeros((W, S, L), np.int32)
    lens = np.zeros((W, S), np.int32)
    n_seqs = np.zeros(W, np.int32)
    for wi, grp in enumerate(groups):
        n_seqs[wi] = len(grp)
        for si, s in enumerate(grp):
            seqs[wi, si, : len(s)] = encode(s)
            weights[wi, si, : len(s)] = wts[wi][si] if wts else [1] * len(s)
            lens[wi, si] = len(s)
    return seqs, weights, lens, n_seqs


def _assert_equal(bs, groups, wts=None, sc=None, banded=False, WPG=1):
    sc = sc or PoaScores()
    seqs, weights, lens, n_seqs = _pack(bs, groups, wts)
    prog = _build_program(bs, sc, False, banded)
    ref = tuple(np.asarray(o) for o in prog(seqs, weights, lens, n_seqs))
    got = tuple(np.asarray(o) for o in poa_batch_pallas(
        jnp.asarray(seqs), jnp.asarray(weights), jnp.asarray(lens),
        jnp.asarray(n_seqs), bs, sc, banded=banded, interpret=True,
        WPG=WPG))
    np.testing.assert_array_equal(ref[5], got[5], err_msg="status")
    for wi in range(len(groups)):
        if ref[5][wi] != 0:
            continue
        n = int(ref[2][wi])
        assert int(got[2][wi]) == n, (wi, n, got[2][wi])
        np.testing.assert_array_equal(ref[0][wi, :n], got[0][wi, :n])
        np.testing.assert_array_equal(ref[1][wi, :n], got[1][wi, :n])


BS = BatchSize(max_sequence_size=48, max_sequences_per_poa=6,
               max_pred_per_node=8, max_aligned_per_node=4)


def test_random_noisy_windows(rng):
    groups = []
    for _ in range(8):
        base = generate_random_genome(int(rng.integers(15, 45)), rng)
        n = int(rng.integers(2, 6))
        groups.append([base] + [
            mutate_sequence(base, int(rng.integers(1, 6)), rng)[:48]
            for _ in range(n - 1)])
    _assert_equal(BS, groups)


def test_lockstep_multi_window(rng):
    """WPG=2 covers the lockstep multi-window NW path: windows of different
    node counts / lengths / activity must stay bit-identical in one
    sub-batch."""
    groups = []
    for i in range(5):   # odd count -> one padded inactive window per pair
        base = generate_random_genome(int(rng.integers(8, 45)), rng)
        n = int(rng.integers(1, 6))
        groups.append([base] + [
            mutate_sequence(base, int(rng.integers(1, 6)), rng)[:48]
            for _ in range(n - 1)])
    _assert_equal(BS, groups, WPG=2)


def test_degenerate_and_weights():
    _assert_equal(BS, [["ACGT"], ["A", "C", "G"],
                       ["TTTTTTTT", "AAAAAAAA"],
                       ["ACGT", "ACGT", "ACGT", "ACGT"]])
    _assert_equal(BS, [["ACTT", "AGTT", "AGTT"]],
                  wts=[[[5] * 4, [1] * 4, [1] * 4]])


def test_overflow_statuses():
    bs = BatchSize(max_sequence_size=16, max_nodes_per_window=12,
                   max_sequences_per_poa=3)
    _assert_equal(bs, [["ACGTACGTACGT", "TTTTGGGGCCCC"], ["ACG", "ACG"]])


def test_banded_and_band_failure(rng):
    bs = BatchSize(max_sequence_size=32, max_sequences_per_poa=3,
                   band_width=17)
    base = generate_random_genome(28, rng)
    _assert_equal(bs, [[base, mutate_sequence(base, 3, rng)[:32]]],
                  banded=True)
    bs1 = BatchSize(max_sequence_size=32, max_sequences_per_poa=2,
                    band_width=1)
    _assert_equal(bs1, [["ACGTACGTAC", "ACGTACGTAC"]], banded=True)


def test_msa_matches_xla(rng):
    groups = []
    for _ in range(5):
        base = generate_random_genome(int(rng.integers(12, 38)), rng)
        n = int(rng.integers(2, 5))
        groups.append([base] + [
            mutate_sequence(base, int(rng.integers(1, 5)), rng)[:48]
            for _ in range(n - 1)])
    groups += [["ACGT"], ["TTTT", "AAAA", "TAT"]]
    sc = PoaScores()
    seqs, weights, lens, n_seqs = _pack(BS, groups)
    prog = _build_program(BS, sc, True)
    ref = tuple(np.asarray(o) for o in prog(seqs, weights, lens, n_seqs))
    got = tuple(np.asarray(o) for o in poa_batch_pallas(
        jnp.asarray(seqs), jnp.asarray(weights), jnp.asarray(lens),
        jnp.asarray(n_seqs), BS, sc, msa=True, interpret=True))
    for wi in range(len(groups)):
        assert ref[5][wi] == got[5][wi]
        if ref[5][wi] != 0:
            continue
        nc = int(ref[4][wi])
        assert int(got[4][wi]) == nc
        for si in range(int(n_seqs[wi])):
            np.testing.assert_array_equal(ref[3][wi, si, :nc],
                                          got[3][wi, si, :nc])


def test_alternative_scores(rng):
    base = generate_random_genome(30, rng)
    groups = [[base, mutate_sequence(base, 4, rng)[:48],
               mutate_sequence(base, 2, rng)[:48]]]
    _assert_equal(BS, groups,
                  sc=PoaScores(match_score=4, mismatch_score=-3,
                               gap_score=-2))
