"""Pallas TPU kernel: decode banded-NW tracebacks ON DEVICE.

The banded kernel's traceback array is (Lq/4, B, W) packed bytes; decoding
on the host means downloading it (the dominant cost of CIGAR production
through the ~20 MB/s transfer path — ~35x the final path bytes for
Hirschberg leaf batches).  This kernel walks each problem's traceback on
device — one problem per grid step, the walk is a scalar while-loop
OR-packing 2-bit move codes 16-per-int32 into an SMEM output row — so only
(B, TL/16) packed words plus (B,) start offsets ever leave the chip (the
host unpack is one vectorized shift-and-mask).

Semantics: identical to the VALID-problem walks of
ops/nw_band.traceback_paths (same clipping, same row-0 deletion tail);
asserted by tests.  Problems whose band overflowed (INF score) produce
bounded garbage, exactly like the host decoders — callers drop them by
status.

Reference counterpart: the dedicated backtrace kernel phase of
cudaaligner/src/ukkonen_gpu.cu [U].
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.mathutils import round_up


def _kernel(qlen_s, tlen_s, tb_ref, path_ref, start_ref, tb32, *, r: int,
            W: int, TL: int, diag: bool):
    b = pl.program_id(0)
    qlen = qlen_s[b]                       # scalar-prefetched (B,) arrays
    tlen = tlen_s[b]
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    # int8 refs don't allow arbitrary dynamic sublane slices: stage the
    # problem's packed bytes into int32 scratch once (one vector convert)
    tb32[...] = tb_ref[...].astype(jnp.int32) & 0xFF

    # the output row is 2-bit PACKED (16 codes per int32 word): the path
    # download is the pipeline's dominant transfer through the ~20 MB/s
    # tunnel, and packing cuts it 16x vs one int32 per move.  The walk
    # writes backwards, so each word is OR-accumulated in SMEM.
    def clear(w, _):
        path_ref[0, w] = 0
        return 0

    jax.lax.fori_loop(0, TL // 16, clear, 0)

    def cond(c):
        i, j, k = c
        return ((i > 0) | (j > 0)) & (k > 0)

    def body(c):
        i, j, k = c
        if diag:
            # anti-diagonal layout (ops/nw_diag_pallas.py): cell (i, j)
            # lives at diagonal d = i + j, sublane u' = (j-i+r-par)/2 with
            # par = (d+r)&1; four DIAGONALS pack per byte
            d = i + j
            par = (d + r) & 1
            lane = jnp.clip((r + j - i - par) >> 1, 0, W - 1)
            row = jnp.clip(d >> 2, 0, tb32.shape[0] - 1)
            shift = 2 * (d & 3)
        else:
            lane = jnp.clip(r + j - i, 0, W - 1)
            row = jnp.clip((i - 1) >> 2, 0, tb32.shape[0] - 1)
            shift = 2 * ((i - 1) & 3)
        byte_row = tb32[pl.ds(row, 1), :]                # (1, W) int32
        byte = jnp.sum(jnp.where(lane_w == lane, byte_row, 0))
        code = (byte >> shift) & 3
        code = jnp.where(i == 0, 3, code)                # row 0: deletions
        k2 = k - 1
        word = k2 >> 4
        path_ref[0, word] = path_ref[0, word] | (code << (2 * (k2 & 15)))
        di = (code == 0) | (code == 1) | (code == 2)
        dj = (code == 0) | (code == 1) | (code == 3)
        return (i - di.astype(jnp.int32), j - dj.astype(jnp.int32), k2)

    _, _, k = jax.lax.while_loop(cond, body, (qlen, tlen, jnp.int32(TL)))
    start_ref[0, 0] = k


@functools.partial(jax.jit, static_argnames=("band_radius", "interpret",
                                              "diag"))
def _decode(tb, qlen, tlen, band_radius, interpret, diag=False):
    Lq4, B, W = tb.shape
    Lq = Lq4 * 4
    # a global path has at most qlen + tlen <= Lq + (Lq + 2r) moves within
    # the band (row layout) or <= Dpad (diag layout: Lq4 counts packed
    # DIAGONALS); round to a 2048 multiple so the PACKED output row
    # (16 codes/int32) keeps a 128-lane SMEM block shape
    TL = round_up((Lq if diag else 2 * Lq + 2 * band_radius) + 8, 2048)
    kernel = functools.partial(_kernel, r=band_radius, W=W, TL=TL, diag=diag)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,             # qlen, tlen as (B,) SMEM arrays
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, Lq4, W), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, 1, TL // 16), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((Lq4, W), jnp.int32)],
    )
    tb_b = jnp.transpose(tb, (1, 0, 2))    # (B, Lq4, W): one problem/block
    packed, start = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, TL // 16), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
        ),
        interpret=interpret,
    )(qlen, tlen, tb_b)
    return packed[:, 0, :], start[:, 0, 0]


#: problems per pallas_call: the scalar-prefetch length arrays and the SMEM
#: output rows must fit the ~1 MB SMEM budget
_DECODE_CHUNK = 8192


def traceback_paths_device(tb, qlen, tlen, band_radius: int,
                           interpret: bool = False,
                           diag: bool = False) -> list[list[int]]:
    """Drop-in for nw_band.traceback_paths on a PACKED device-resident tb:
    decodes on device, downloads only path bytes.  diag=True decodes the
    anti-diagonal layout of ops/nw_diag_pallas.banded_nw_diag_pallas
    (semantics of its traceback_paths_diag host decoder)."""
    tb = jnp.asarray(tb)
    qlen = jnp.asarray(qlen, jnp.int32)
    tlen = jnp.asarray(tlen, jnp.int32)
    B = tb.shape[1]
    # pow2-bucket the batch dim (uniform _DECODE_CHUNK chunks past the cap)
    # so arbitrary caller batch sizes reuse O(log) executables
    Bp = (min(1 << max(3, (B - 1).bit_length()), _DECODE_CHUNK)
          if B <= _DECODE_CHUNK else round_up(B, _DECODE_CHUNK))
    if Bp != B:
        tb = jnp.pad(tb, ((0, 0), (0, Bp - B), (0, 0)))
        qlen = jnp.pad(qlen, (0, Bp - B))
        tlen = jnp.pad(tlen, (0, Bp - B))
    out: list[list[int]] = []
    shifts = 2 * np.arange(16, dtype=np.uint32)
    for s in range(0, tb.shape[1], _DECODE_CHUNK):
        e = s + min(_DECODE_CHUNK, tb.shape[1])
        packed, start = _decode(tb[:, s:e], qlen[s:e], tlen[s:e],
                                band_radius, interpret, diag)
        # unpack 16 2-bit codes per int32 word (vectorized; the download
        # above was 16x smaller than one int32 per move)
        pw = np.asarray(packed).astype(np.uint32)        # (Bc, TL/16)
        codes = ((pw[:, :, None] >> shifts) & 3).reshape(pw.shape[0], -1)
        start = np.asarray(start)
        out.extend(codes[b, start[b]:].tolist()
                   for b in range(codes.shape[0]))
    return out[:B]
