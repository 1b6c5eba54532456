"""Anti-diagonal banded NW Pallas kernel — the scan-free reformulation.

The row-major flagship kernel (ops/nw_band_pallas.py) walks query rows and
pays a log2(W)-step Hillis-Steele min-plus prefix scan per row for the
in-row deletion chain (~24 of its ~55 VPU ops).  Along an ANTI-DIAGONAL
d = i + j, DP cells are independent — every dependency points at d-1/d-2 —
so the chain disappears entirely: one sublane roll + a 3-way min per step.

Layout: problems on lanes; the band's intersection with one anti-diagonal
on sublanes.  With u = j - i + r, cells on diagonal d satisfy
u ≡ d + r (mod 2), so consecutive diagonals use interleaved half-bands:
par = (d + r) & 1, u = 2u' + par, u' in [0, r] — HALF the sublanes of the
row formulation (W' ≈ W/2).  Dependencies at (d, u'):

    diag  D[i-1, j-1] -> (d-2, u')                       no roll
    up    D[i-1, j  ] -> (d-1, u' + par)                 roll iff par=1
    left  D[i,   j-1] -> (d-1, u' + par - 1)             roll iff par=0

The grid steps R=16 diagonals at a time; parity alternates statically
within the unroll, so each rr compiles to exactly one masked roll.  q/t
characters arrive as two dynamic sublane slices per diagonal (query
reversed: i decreases along u', j increases).

Outputs match ops/nw_band.banded_nw bit-for-bit: scores are the same
banded edit distances, and the 2-bit move codes use the identical
tie-break (diag, then DELETION via left+1, else INSERTION), packed four
DIAGONALS per int8 byte — decode with traceback_paths_diag below.  The
boundary rows/columns need no special code paths beyond i==0 -> j: INF
propagation from out-of-band dependencies produces the correct values and
codes (e.g. column j==0 yields INSERTION exactly as the row kernel does).

Reference counterpart: cudaaligner/src/ukkonen_gpu.cu [U] sweeps
anti-diagonals with one CUDA block per alignment; this kernel sweeps them
with 128 problems per lane tile and the band on sublanes.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.status import AlignmentState
from ..utils.mathutils import round_up
from .nw_band import INF

LANE_TILE = 128

#: scoped-VMEM feasibility budget for the diag kernel (v5e limit 16 MiB).
#: Two on-chip OOM data points calibrate the estimator below:
#:   Lq=Lt=8192, r=128 -> 16.75M   (block-dominated)
#:   Lq=Lt=4096, r=512 -> 17.59M   (stack-dominated: the R=16 unrolled
#:                                  diagonal loop keeps ~3 (W, 128) i32
#:                                  temporaries live per iteration)
VMEM_BLOCK_BUDGET = 14 * 2**20


def vmem_block_bytes(Lq: int, Lt: int, r: int) -> int:
    """Conservative scoped-VMEM estimate for this shape bucket: q/t input
    blocks (pipeline-buffered, ~1.5x) plus the unrolled-loop stack term.
    ops.banded uses it to fall back to the row kernel (which streams the
    query and ran r=512 pipeline shapes on chip in round 2)."""
    W = round_up(r + 1, 8)
    R = 16
    Dpad = round_up(Lq + Lt + 1, R)
    i_top_max = (Dpad - 1 + r) // 2
    PADQ = round_up(max(0, i_top_max - Lq), 8)
    PADT = round_up(r // 2 + 2, 8)
    S_q = round_up(PADQ + Lq + W + 8, 8)
    S_t = round_up(PADT + Lt + W + 8, 8)
    blocks = 4 * LANE_TILE * (S_q + S_t)
    stack = 3 * R * W * LANE_TILE * 4
    return blocks + blocks // 2 + stack


def _shift_lower(x, s, krow, fill):
    """out[k] = x[k-s]; `fill` for k < s (sublane axis 0)."""
    W = x.shape[0]
    rolled = pltpu.roll(x, shift=s, axis=0)
    return jnp.where(krow >= s, rolled, fill)


def _shift_upper(x, s, krow, fill):
    """out[k] = x[k+s]; `fill` for k >= W-s (sublane axis 0)."""
    W = x.shape[0]
    rolled = pltpu.roll(x, shift=W - s, axis=0)
    return jnp.where(krow < W - s, rolled, fill)


def _kernel(qbuf_ref, tbuf_ref, qlen_ref, tlen_ref, score_ref, tb_ref,
            prev1_ref, prev2_ref, sacc_ref, *, r: int, W: int, R: int,
            Lqp: int, PADQ: int, PADT: int):
    chunk = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    krow = jax.lax.broadcasted_iota(jnp.int32, (W, LANE_TILE), 0)
    qlen_u = qlen_ref[:].astype(jnp.uint32)     # (1, LANE_TILE)
    tlen_u = tlen_ref[:].astype(jnp.uint32)
    inf = jnp.asarray(int(INF), jnp.int32)
    one = jnp.asarray(1, jnp.int32)
    # in-band mask per parity: u = 2k+par <= 2r  (hoisted, static)
    band = (krow <= r, krow <= r - 1)

    @pl.when(chunk == 0)
    def _init():
        prev1_ref[:] = jnp.full((W, LANE_TILE), int(INF), jnp.int32)
        prev2_ref[:] = jnp.full((W, LANE_TILE), int(INF), jnp.int32)
        sacc_ref[:] = jnp.zeros((W, LANE_TILE), jnp.int32)

    prev1 = prev1_ref[:]
    prev2 = prev2_ref[:]
    sacc = sacc_ref[:]
    base = chunk * R
    acc = jnp.zeros((W, LANE_TILE), jnp.int32)

    for rr in range(R):                     # static unroll, parity alternates
        d = base + rr
        par = (rr + r) % 2                  # R is even => static per rr
        i_top = (d + r) // 2                # i at sublane u'=0 (scalar)
        i_vec = i_top - krow                # (W, LANE_TILE)
        j_vec = d - i_vec
        # chars: q[i-1] along descending i (reversed buffer), t[j-1]
        qch = qbuf_ref[pl.ds(PADQ + Lqp - i_top, W), :]
        tch = tbuf_ref[pl.ds(PADT + d - i_top - 1, W), :]
        sub = jnp.where((qch == tch) & (qch >= 0), 0, one)

        # one unsigned compare covers 0 <= x <= len per side
        valid = ((i_vec.astype(jnp.uint32) <= qlen_u)
                 & (j_vec.astype(jnp.uint32) <= tlen_u) & band[par])

        if par == 0:
            up = prev1
            left = _shift_lower(prev1, 1, krow, inf)
        else:
            up = _shift_upper(prev1, 1, krow, inf)
            left = prev1
        diag = prev2 + sub
        cur = jnp.minimum(diag, jnp.minimum(up, left) + one)
        cur = jnp.where(i_vec == 0, j_vec, cur)   # top boundary (and (0,0))
        cur = jnp.where(valid, cur, inf)

        # identical tie-break to the row kernel: diag, then DELETION, else
        # INSERTION (codes on invalid cells are never read by the decoder)
        code = jnp.where(
            cur == diag, sub,
            jnp.where(cur == left + one,
                      jnp.asarray(int(AlignmentState.DELETION), jnp.int32),
                      jnp.asarray(int(AlignmentState.INSERTION), jnp.int32)))
        acc = acc | (code << (2 * (rr % 4)))
        if rr % 4 == 3:
            tb_ref[rr // 4] = acc.astype(jnp.int8)
            acc = jnp.zeros((W, LANE_TILE), jnp.int32)

        hit = (i_vec == qlen_ref[:]) & (j_vec == tlen_ref[:]) & valid
        sacc = sacc + jnp.where(hit, cur, 0)
        prev2 = prev1
        prev1 = cur

    prev1_ref[:] = prev1
    prev2_ref[:] = prev2
    sacc_ref[:] = sacc

    @pl.when(chunk == n_chunks - 1)
    def _emit():
        score_ref[:] = jnp.sum(sacc_ref[:], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("band_radius", "interpret"))
def banded_nw_diag_pallas(q, qlen, t, tlen, band_radius: int,
                          interpret: bool = False):
    """Banded NW, anti-diagonal sweep.  Same score semantics as
    ops.nw_band.banded_nw; returns (scores (B,) int32,
    tb (Dpad//4, B, W') int8 with four DIAGONALS' 2-bit codes per byte —
    decode with traceback_paths_diag)."""
    B, Lq0 = q.shape
    Lt0 = t.shape[1]
    r = band_radius
    W = round_up(r + 1, 8)                       # half-band on sublanes
    Bp = round_up(max(B, LANE_TILE), LANE_TILE)
    R = 16
    Dpad = round_up(Lq0 + Lt0 + 1, R)
    i_top_max = (Dpad - 1 + r) // 2
    PADQ = round_up(max(0, i_top_max - Lq0), 8)
    PADT = round_up(r // 2 + 2, 8)
    assert vmem_block_bytes(Lq0, Lt0, r) <= VMEM_BLOCK_BUDGET, (
        "diag kernel q/t VMEM blocks exceed the scoped budget for "
        f"Lq={Lq0} Lt={Lt0} r={r}; route via ops.banded (row fallback)")

    q = jnp.pad(q.astype(jnp.int32), ((0, Bp - B), (0, 0)),
                constant_values=-1)
    t = jnp.pad(t.astype(jnp.int32), ((0, Bp - B), (0, 0)),
                constant_values=-1)
    qlen2 = jnp.pad(qlen.astype(jnp.int32), (0, Bp - B))[None, :]
    tlen2 = jnp.pad(tlen.astype(jnp.int32), (0, Bp - B))[None, :]

    # reversed query buffer: qbuf[PADQ + p] = q[Lq0 - 1 - p]
    S_q = round_up(PADQ + Lq0 + W + 8, 8)
    qbuf = jnp.full((Bp, S_q), -1, jnp.int32)
    qbuf = jax.lax.dynamic_update_slice(qbuf, q[:, ::-1], (0, PADQ))
    # target buffer: tbuf[PADT + p] = t[p]
    S_t = round_up(PADT + Lt0 + W + 8, 8)
    tbuf = jnp.full((Bp, S_t), -1, jnp.int32)
    tbuf = jax.lax.dynamic_update_slice(tbuf, t, (0, PADT))

    kernel = functools.partial(_kernel, r=r, W=W, R=R, Lqp=Lq0,
                               PADQ=PADQ, PADT=PADT)
    grid = (Bp // LANE_TILE, Dpad // R)
    scores, tb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S_q, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_t, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, LANE_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R // 4, W, LANE_TILE), lambda b, i: (i, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Dpad // 4, W, Bp), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((W, LANE_TILE), jnp.int32),   # prev1 (diag d-1)
            pltpu.VMEM((W, LANE_TILE), jnp.int32),   # prev2 (diag d-2)
            pltpu.VMEM((W, LANE_TILE), jnp.int32),   # score accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=Bp * Dpad * W * 30,
            bytes_accessed=Bp * (S_q + S_t) * 4 + Dpad * W * Bp // 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qbuf.T, tbuf.T, qlen2, tlen2)

    band_ok = jnp.abs(qlen2[0, :B] - tlen2[0, :B]) <= r
    scores_out = jnp.where(band_ok, scores[0, :B], INF)
    tb_out = jnp.swapaxes(tb, 1, 2)[:, :B, :]    # (Dpad//4, B, W')
    return scores_out, tb_out


def traceback_paths_diag(tb: np.ndarray, qlen: np.ndarray, tlen: np.ndarray,
                         band_radius: int) -> list:
    """Host decode of the anti-diagonal 2-bit traceback into edit paths —
    same output convention as ops/nw_band.traceback_paths (forward-order
    AlignmentState code lists; row 0 is a pure deletion tail).  Cell (i, j)
    lives at diagonal d = i + j, sublane u' = (j - i + r - par) / 2 with
    par = (d + r) & 1; four diagonals pack per byte."""
    tb = np.asarray(tb).view(np.uint8)
    qlen = np.asarray(qlen).astype(np.int64)
    tlen = np.asarray(tlen).astype(np.int64)
    B = tb.shape[1]
    r = band_radius
    i = qlen.copy()
    j = tlen.copy()
    max_steps = int((qlen + tlen).max()) if B else 0
    code_mat = np.zeros((max_steps, B), dtype=np.uint8)
    act_mat = np.zeros((max_steps, B), dtype=bool)
    active = (i > 0) | (j > 0)
    for s in range(max_steps):
        if not active.any():
            break
        del_row = active & (i == 0)
        read = active & (i > 0)
        code = np.zeros(B, dtype=np.uint8)
        d = i + j
        par = (d + r) & 1
        lanes = np.clip((j - i + r - par) >> 1, 0, tb.shape[2] - 1)
        rows = np.clip(d >> 2, 0, tb.shape[0] - 1)
        byte = tb[rows[read], np.nonzero(read)[0], lanes[read]]
        code[read] = (byte >> (2 * (d[read] & 3)).astype(np.uint8)) & 3
        code[del_row] = AlignmentState.DELETION
        code_mat[s] = code
        act_mat[s] = active
        di = np.isin(code, (AlignmentState.MATCH, AlignmentState.MISMATCH,
                            AlignmentState.INSERTION)) & active
        dj = np.isin(code, (AlignmentState.MATCH, AlignmentState.MISMATCH,
                            AlignmentState.DELETION)) & active
        i -= di.astype(np.int64)
        j -= dj.astype(np.int64)
        active = (i > 0) | (j > 0)
    return [code_mat[act_mat[:, b], b][::-1].tolist() for b in range(B)]
