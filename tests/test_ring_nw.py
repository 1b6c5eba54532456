"""Ring-wavefront sequence-parallel NW ('sp' axis): sp-sharded edit distance
== full NW oracle, for several mesh shapes (incl. data x sp), on the
8-fake-device CPU mesh."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.cpu import nw_oracle
from claragenomicsanalysis_tpu.parallel import make_mesh, ring_wavefront_nw
from claragenomicsanalysis_tpu.utils.genomeutils import (
    encode, generate_random_genome, mutate_sequence)


def _batch(rng, B=6, Lq=70, Lt=90):
    qs, ts = [], []
    for b in range(B):
        a = generate_random_genome(int(rng.integers(1, Lq)), rng)
        if b % 2:
            bseq = mutate_sequence(a, int(rng.integers(0, 8)), rng)[:Lt]
        else:
            bseq = generate_random_genome(int(rng.integers(1, Lt)), rng)
        qs.append(a)
        ts.append(bseq)
    q = np.stack([encode(a, Lq) for a in qs]).astype(np.int32)
    t = np.stack([encode(b, Lt) for b in ts]).astype(np.int32)
    qlen = np.array([len(a) for a in qs], np.int32)
    tlen = np.array([len(b) for b in ts], np.int32)
    return qs, ts, q, qlen, t, tlen


def _oracle_dist(qs, ts):
    return np.array([nw_oracle.nw_matrix(a, b)[len(a), len(b)]
                     for a, b in zip(qs, ts)], np.int32)


@pytest.mark.parametrize("data,sp", [(1, 8), (2, 4), (8, 1)])
def test_ring_nw_matches_oracle(rng, data, sp):
    mesh = make_mesh(data=data, rep=1, sp=sp)
    qs, ts, q, qlen, t, tlen = _batch(rng)
    got = ring_wavefront_nw(q, qlen, t, tlen, mesh)
    want = _oracle_dist(qs, ts)
    np.testing.assert_array_equal(got, want)


def test_ring_nw_empty_and_identical(rng):
    mesh = make_mesh(data=1, rep=1, sp=8)
    a = generate_random_genome(40, rng)
    qs = [a, "", a]
    ts = [a, a, ""]
    Lq = Lt = 48
    q = np.stack([encode(s, Lq) for s in qs]).astype(np.int32)
    t = np.stack([encode(s, Lt) for s in ts]).astype(np.int32)
    qlen = np.array([len(s) for s in qs], np.int32)
    tlen = np.array([len(s) for s in ts], np.int32)
    got = ring_wavefront_nw(q, qlen, t, tlen, mesh)
    np.testing.assert_array_equal(got, [0, 40, 40])


def test_ring_nw_sp_count_invariance(rng):
    """The same batch must give identical scores for any sp size."""
    qs, ts, q, qlen, t, tlen = _batch(rng, B=4, Lq=50, Lt=64)
    outs = [ring_wavefront_nw(q, qlen, t, tlen, make_mesh(data=1, rep=1, sp=s))
            for s in (1, 2, 8)]
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
