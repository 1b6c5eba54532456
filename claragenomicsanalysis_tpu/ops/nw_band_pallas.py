"""Pallas TPU kernel for batched banded NW — the flagship wavefront-DP kernel.

Same mathematical definition as ops/nw_band.banded_nw (the XLA scan
formulation) and bit-identical outputs, with the DP state kept on-chip:

- Orientation: **sublanes = band cells, lanes = problems.**  Each grid step
  updates a (W_sub, 128) int32 block = one band row of 128 problems.  Putting
  the band on sublanes lets the sliding target window be a *dynamic sublane
  slice* (Mosaic allows arbitrary sublane offsets; lane offsets would need
  128-alignment), and lets the band width round to 8 instead of 128 — an
  ~3x work saving for narrow bands.
- Grid = (batch_tiles, Lq): TPU grid steps run sequentially, so the DP carry
  lives in VMEM scratch across row steps (reset at row 0); only the int8
  traceback row is written out per step — the scan backend round-trips its
  whole carry through HBM every row.
- The within-row deletion chain is a Hillis–Steele min-plus prefix scan over
  sublanes (log2(W) roll+min steps).

Reference counterpart: cudaaligner/src/ukkonen_gpu.cu [U] (one CUDA block per
alignment, threads sweep anti-diagonals).  The TPU design instead fixes
sublane k to diagonal offset j-i = k-r and walks query rows i, keeping every
step a dense VPU block with no cross-thread sync.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.status import AlignmentState
from ..utils.mathutils import round_up
from .nw_band import INF

LANE_TILE = 128  # problems per grid tile (lane dim)


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def band_width_sub(band_radius: int) -> int:
    """Band cells on the sublane dim: 2r+1 rounded to the sublane tile (8)."""
    return round_up(2 * band_radius + 1, 8)


def _shift_from_lower_sub(x, s, krow, fill):
    """out[k, :] = x[k-s, :], `fill` for k < s (sublane axis = 0)."""
    rolled = pltpu.roll(x, shift=s, axis=0)
    return jnp.where(krow >= s, rolled, fill)


def _kernel(qT_ref, tT_ref, qlen_ref, tlen_ref, score_ref, tb_ref,
            prev_ref, final_ref, *, band_radius: int, W: int, Lq: int,
            R: int):
    r = band_radius
    chunk = pl.program_id(1)              # R DP rows per grid step
    n_chunks = pl.num_programs(1)
    krow = jax.lax.broadcasted_iota(jnp.int32, (W, LANE_TILE), 0)
    delta = krow - r                      # j - i per sublane
    in_band = krow <= 2 * r
    qlen = qlen_ref[:]                    # (1, LANE_TILE)
    tlen = tlen_ref[:]

    @pl.when(chunk == 0)
    def _init():
        row0 = jnp.where((delta >= 0) & (delta <= tlen) & in_band, delta, INF)
        prev_ref[:] = row0.astype(jnp.int32)
        final_ref[:] = jnp.where(qlen == 0, jnp.minimum(tlen, INF),
                                 INF).astype(jnp.int32)

    prev = prev_ref[:]
    final = final_ref[:]
    base = chunk * R
    lane_final = r + tlen - qlen          # (1, LANE_TILE)

    for rr in range(R):                   # static unroll: R rows per step
        i = base + rr + 1                 # DP row 1..Lq
        jv = i + delta
        valid = (jv >= 0) & (jv <= tlen) & (i <= qlen) & in_band
        tvec = tT_ref[pl.ds(base + rr, W), :]   # t[j-1] per (k, problem)
        qch = qT_ref[rr, :][None, :]            # (1, LANE_TILE), static row
        sub = jnp.where((qch == tvec) & (qch >= 0), 0, 1).astype(jnp.int32)

        up = pltpu.roll(prev, shift=W - 1, axis=0)  # up[k] = prev[k+1]
        up = jnp.where(krow < W - 1, up, INF)
        tmp = jnp.minimum(prev + sub, up + 1)
        tmp = jnp.where(jv == 0, i, tmp)
        tmp = jnp.where(valid, tmp, INF)

        # min-plus prefix over sublanes: cur[k] = k + min_{l<=k}(tmp[l] - l)
        c = tmp - krow
        for p in range(max(1, (W - 1).bit_length())):
            c = jnp.minimum(c, _shift_from_lower_sub(c, 1 << p, krow, INF))
        cur = jnp.where(valid, c + krow, INF).astype(jnp.int32)

        left = _shift_from_lower_sub(cur, 1, krow, INF)
        code = jnp.where(
            cur == prev + sub, sub,
            jnp.where(cur == left + 1,
                      jnp.int32(AlignmentState.DELETION),
                      jnp.int32(AlignmentState.INSERTION))).astype(jnp.int8)
        tb_ref[rr] = code

        score_i = jnp.sum(jnp.where(krow == lane_final, cur, 0),
                          axis=0, keepdims=True)
        final = jnp.where(i == qlen, score_i, final)
        prev = cur

    prev_ref[:] = prev
    final_ref[:] = final.astype(jnp.int32)

    @pl.when(chunk == n_chunks - 1)
    def _emit():
        score_ref[:] = final_ref[:]


@functools.partial(jax.jit, static_argnames=("band_radius", "interpret"))
def banded_nw_pallas(q, qlen, t, tlen, band_radius: int,
                     interpret: bool = False):
    """Drop-in replacement for ops.nw_band.banded_nw.

    Returns (scores (B,) int32, tb (Lq, B, W_sub) int8).  The batch is padded
    internally to a multiple of 128.
    """
    B, Lq0 = q.shape
    Lt = t.shape[1]
    r = band_radius
    W = band_width_sub(r)
    Bp = round_up(max(B, LANE_TILE), LANE_TILE)
    R = 16                                     # DP rows per grid step
    Lq = round_up(Lq0, R)

    q = jnp.pad(q.astype(jnp.int32), ((0, Bp - B), (0, Lq - Lq0)),
                constant_values=-1)
    t = jnp.pad(t.astype(jnp.int32), ((0, Bp - B), (0, 0)),
                constant_values=-1)
    qlen2 = jnp.pad(qlen.astype(jnp.int32), (0, Bp - B))[None, :]
    tlen2 = jnp.pad(tlen.astype(jnp.int32), (0, Bp - B))[None, :]

    # Transposed layouts: sequence position on sublanes, problem on lanes.
    # S must cover both the data (r + Lt) and the deepest in-kernel slice
    # (row Lq-1 reads sublanes [Lq-1, Lq-1+W)).
    S = round_up(max(r + Lt, Lq) + W + 8, 8)
    qT = q.T                                              # (Lq, Bp)
    tT = jnp.full((S, Bp), -1, dtype=jnp.int32)
    tT = jax.lax.dynamic_update_slice(tT, t.T, (r, 0))

    kernel = functools.partial(_kernel, band_radius=r, W=W, Lq=Lq, R=R)
    grid = (Bp // LANE_TILE, Lq // R)
    scores, tb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, LANE_TILE), lambda b, i: (i, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W, LANE_TILE), lambda b, i: (i, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Lq, W, Bp), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((W, LANE_TILE), jnp.int32),   # prev row
            pltpu.VMEM((1, LANE_TILE), jnp.int32),   # final score
        ],
        cost_estimate=pl.CostEstimate(
            flops=Bp * Lq * W * (10 + 2 * max(1, (W - 1).bit_length())),
            bytes_accessed=Bp * (Lq + S) * 4 + Lq * W * Bp,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qT, tT, qlen2, tlen2)

    band_ok = jnp.abs(qlen2[0, :B] - tlen2[0, :B]) <= r
    scores_out = jnp.where(band_ok, scores[0, :B], INF)
    # (Lq, W, Bp) -> (Lq, B, W) view for the shared host traceback decoder
    tb_out = jnp.swapaxes(tb, 1, 2)[:, :B, :]
    return scores_out, tb_out
