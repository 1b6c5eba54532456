"""Native C++ traceback decoder == pure-Python decoder, bit-for-bit, and its
fused CIGARs == cpu/nw_oracle.path_to_cigar."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.cpu.nw_oracle import path_to_cigar
from claragenomicsanalysis_tpu.ops import nw_band
from claragenomicsanalysis_tpu.utils.genomeutils import (
    encode, generate_random_genome, mutate_sequence)

native_traceback = pytest.importorskip(
    "claragenomicsanalysis_tpu.io.native_traceback",
    reason="native traceback decoder not built (run native/build.sh)")


def _tb_batch(rng, B=16, Lq=96, Lt=96, r=15):
    qs, ts = [], []
    for b in range(B):
        a = generate_random_genome(int(rng.integers(1, Lq)), rng)
        t = mutate_sequence(a, int(rng.integers(0, 10)), rng)[:Lt]
        qs.append(a)
        ts.append(t)
    q = np.stack([encode(a, Lq) for a in qs]).astype(np.int32)
    t = np.stack([encode(b, Lt) for b in ts]).astype(np.int32)
    qlen = np.array([len(a) for a in qs], np.int32)
    tlen = np.array([len(b) for b in ts], np.int32)
    scores, tb = nw_band.banded_nw(q, qlen, t, tlen, r)
    return np.asarray(tb), qlen, tlen, np.asarray(scores), r


def test_native_matches_python(rng):
    tb, qlen, tlen, scores, r = _tb_batch(rng)
    py = nw_band.traceback_paths(tb, qlen, tlen, r, use_native="never")
    nat, cigars = native_traceback.decode(tb, qlen, tlen, r)
    assert nat == py
    for b, (p, c) in enumerate(zip(py, cigars)):
        if scores[b] < nw_band.INF:
            assert c == path_to_cigar(p)


def test_native_extended_cigar(rng):
    tb, qlen, tlen, scores, r = _tb_batch(rng, B=4)
    py = nw_band.traceback_paths(tb, qlen, tlen, r, use_native="never")
    _, cigars = native_traceback.decode(tb, qlen, tlen, r, extended=True)
    for b, (p, c) in enumerate(zip(py, cigars)):
        if scores[b] < nw_band.INF:
            assert c == path_to_cigar(p, extended=True)


def test_empty_problems():
    tb = np.zeros((4, 2, 128), np.uint8)
    paths, cigars = native_traceback.decode(
        tb, np.array([0, 0], np.int32), np.array([0, 3], np.int32), 15)
    assert paths[0] == [] and cigars[0] == ""
    assert paths[1] == [3, 3, 3] and cigars[1] == "3D"


def test_dispatch_default_uses_native(rng):
    tb, qlen, tlen, _, r = _tb_batch(rng, B=3)
    assert (nw_band.traceback_paths(tb, qlen, tlen, r)
            == nw_band.traceback_paths(tb, qlen, tlen, r, use_native="never"))


def test_garbage_codes_terminate():
    # A band-overflow problem carries garbage move codes.  All-DELETION rows
    # with i > 0 used to decrement j forever; the walk must now stop within
    # qlen+tlen steps and leave a truncated path for callers to drop.
    Lq, B, W = 8, 2, 16
    tb = np.full((Lq, B, W), 3, np.uint8)  # every code = deletion
    qlen = np.array([8, 8], np.int32)
    tlen = np.array([2, 0], np.int32)
    paths, cigars = native_traceback.decode(tb, qlen, tlen, 4)
    for b in range(B):
        assert len(paths[b]) <= qlen[b] + tlen[b] + 1


def _pack2bit(tb):
    Lq = tb.shape[0]
    pad = (-Lq) % 4
    tbp = np.pad(tb, ((0, pad), (0, 0), (0, 0)))
    out = np.zeros(((Lq + pad) // 4,) + tb.shape[1:], np.uint8)
    for i in range(4):
        out |= (tbp[i::4] & 3) << (2 * i)
    return out


def test_packed_format_both_decoders(rng):
    tb, qlen, tlen, _, r = _tb_batch(rng, B=6)
    want = nw_band.traceback_paths(tb, qlen, tlen, r, use_native="never")
    packed = _pack2bit(tb)
    got_py = nw_band.traceback_paths(packed, qlen, tlen, r,
                                     use_native="never", packed=True)
    got_nat, _ = native_traceback.decode(packed, qlen, tlen, r, packed=True)
    assert got_py == want
    assert got_nat == want
