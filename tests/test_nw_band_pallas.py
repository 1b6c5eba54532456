"""Pallas banded-NW kernel (interpret mode on CPU) vs scan backend: bit-equal."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.ops import nw_band
from claragenomicsanalysis_tpu.ops.nw_band_pallas import banded_nw_pallas
from claragenomicsanalysis_tpu.utils.genomeutils import (encode,
                                                         generate_random_genome,
                                                         mutate_sequence)


def _pack(pairs, Lq, Lt):
    q = np.stack([encode(a, Lq) for a, _ in pairs])
    t = np.stack([encode(b, Lt) for _, b in pairs])
    qlen = np.array([len(a) for a, _ in pairs], dtype=np.int32)
    tlen = np.array([len(b) for _, b in pairs], dtype=np.int32)
    return q, qlen, t, tlen


def test_pallas_matches_scan_backend(rng):
    pairs = []
    for _ in range(6):
        a = generate_random_genome(int(rng.integers(1, 60)), rng)
        b = mutate_sequence(a, int(rng.integers(0, 8)), rng)
        pairs.append((a, b))
    pairs += [("", "ACG"), ("A" * 50, "A" * 3)]  # boundary + band overflow
    r = 8
    q, qlen, t, tlen = _pack(pairs, 64, 64)
    s_scan, tb_scan = nw_band.banded_nw(q, qlen, t, tlen, r)
    s_pl, tb_pl = banded_nw_pallas(q, qlen, t, tlen, r, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_scan), np.asarray(s_pl))
    # traceback arrays must agree wherever the walk can visit (valid cells);
    # compare decoded paths — the semantic output (pallas tb is 2-bit packed)
    p_scan = nw_band.traceback_paths(np.asarray(tb_scan), qlen, tlen, r)
    p_pl = nw_band.traceback_paths(np.asarray(tb_pl), qlen, tlen, r,
                                   packed=True)
    assert p_scan == p_pl
    # both decoders must agree on the packed format too
    p_py = nw_band.traceback_paths(np.asarray(tb_pl), qlen, tlen, r,
                                   packed=True, use_native="never")
    assert p_py == p_pl


def test_pallas_internal_batch_padding(rng):
    # batch of 3 (not a tile multiple) must still work via internal padding
    pairs = [("ACGT", "ACGA"), ("A", "T"), ("GG", "GG")]
    q, qlen, t, tlen = _pack(pairs, 8, 8)
    s, tb = banded_nw_pallas(q, qlen, t, tlen, 4, interpret=True)
    assert list(np.asarray(s)) == [1, 1, 0]
    paths = nw_band.traceback_paths(np.asarray(tb), qlen, tlen, 4,
                                    packed=True)
    assert len(paths) == 3 and paths[2] == [0, 0]


def test_device_decode_matches_host(rng):
    from claragenomicsanalysis_tpu.ops.tb_decode_pallas import \
        traceback_paths_device
    pairs = []
    for _ in range(6):
        a = generate_random_genome(int(rng.integers(1, 60)), rng)
        b = mutate_sequence(a, int(rng.integers(0, 8)), rng)
        pairs.append((a, b))
    pairs += [("", "ACG"), ("ACGT", "")]
    q, qlen, t, tlen = _pack(pairs, 64, 64)
    s, tb = banded_nw_pallas(q, qlen, t, tlen, 8, interpret=True)
    want = nw_band.traceback_paths(np.asarray(tb), qlen, tlen, 8,
                                   packed=True)
    got = traceback_paths_device(np.asarray(tb), qlen, tlen, 8,
                                 interpret=True)
    # compare only problems with a valid in-band path (garbage walks of
    # INF problems are bounded differently by design)
    for b in range(len(pairs)):
        if int(np.asarray(s)[b]) < nw_band.INF:
            assert got[b] == want[b], b
