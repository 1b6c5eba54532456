"""Banded-NW op vs the CPU oracle: scores AND edit paths bit-identical."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.status import StatusType
from claragenomicsanalysis_tpu.cpu import nw_oracle as nw
from claragenomicsanalysis_tpu.ops import nw_band
from claragenomicsanalysis_tpu.utils.genomeutils import (encode,
                                                         generate_random_genome,
                                                         mutate_sequence)


def _pack(pairs, Lq, Lt):
    q = np.stack([encode(a, Lq) for a, _ in pairs])
    t = np.stack([encode(b, Lt) for _, b in pairs])
    qlen = np.array([len(a) for a, _ in pairs], dtype=np.int32)
    tlen = np.array([len(b) for _, b in pairs], dtype=np.int32)
    return q, qlen, t, tlen


def test_scores_and_paths_match_oracle(rng):
    pairs = []
    for _ in range(24):
        n = int(rng.integers(1, 120))
        a = generate_random_genome(n, rng)
        b = mutate_sequence(a, int(rng.integers(0, 12)), rng)
        pairs.append((a, b))
    pairs += [("ACGT", "ACGT"), ("A", "T"), ("ACGT", "TGCA")]
    r = 16
    q, qlen, t, tlen = _pack(pairs, 128, 160)
    scores, tb = nw_band.banded_nw(q, qlen, t, tlen, r)
    scores = np.asarray(scores)
    paths = nw_band.traceback_paths(np.asarray(tb), qlen, tlen, r)
    for b, (a_s, b_s) in enumerate(pairs):
        o_path, o_dist, o_status = nw.align(a_s, b_s, band_radius=r)
        if o_status != StatusType.SUCCESS:
            assert scores[b] >= nw_band.INF
            continue
        assert scores[b] == o_dist, f"pair {b}: {scores[b]} != {o_dist}"
        assert paths[b] == o_path, f"pair {b}: path mismatch"


def test_empty_and_boundary_cases():
    r = 8
    pairs = [("", "ACG"), ("ACG", ""), ("", ""), ("A", "A")]
    q, qlen, t, tlen = _pack(pairs, 8, 8)
    scores, tb = nw_band.banded_nw(q, qlen, t, tlen, r)
    scores = np.asarray(scores)
    assert list(scores) == [3, 3, 0, 0]
    paths = nw_band.traceback_paths(np.asarray(tb), qlen, tlen, r)
    assert paths[0] == [3, 3, 3]    # deletions
    assert paths[1] == [2, 2, 2]    # insertions
    assert paths[2] == []
    assert paths[3] == [0]


def test_band_overflow_is_inf():
    r = 4
    pairs = [("A" * 20, "A" * 2)]
    q, qlen, t, tlen = _pack(pairs, 32, 32)
    scores, _ = nw_band.banded_nw(q, qlen, t, tlen, r)
    assert np.asarray(scores)[0] >= nw_band.INF


def test_length_difference_within_band(rng):
    # |n - m| close to r: the band's hardest edge cases
    r = 8
    pairs = []
    for d in range(0, 9):
        a = generate_random_genome(40, rng)
        b = a[: 40 - d]
        pairs.append((a, b))
    q, qlen, t, tlen = _pack(pairs, 64, 64)
    scores, tb = nw_band.banded_nw(q, qlen, t, tlen, r)
    scores = np.asarray(scores)
    paths = nw_band.traceback_paths(np.asarray(tb), qlen, tlen, r)
    for b, (a_s, b_s) in enumerate(pairs):
        o_path, o_dist, _ = nw.align(a_s, b_s, band_radius=r)
        assert scores[b] == o_dist
        assert paths[b] == o_path


def test_n_bases_never_match():
    r = 4
    pairs = [("ANNA", "ANNA")]
    q, qlen, t, tlen = _pack(pairs, 8, 8)
    scores, _ = nw_band.banded_nw(q, qlen, t, tlen, r)
    # N vs N is a mismatch by spec: distance 2, not 0
    assert np.asarray(scores)[0] == 2
    o_path, o_dist, _ = nw.align("ANNA", "ANNA", band_radius=r)
    assert o_dist == 2
