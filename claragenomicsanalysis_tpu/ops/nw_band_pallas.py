"""Pallas TPU kernel for batched banded NW — the flagship wavefront-DP kernel.

Same mathematical definition as ops/nw_band.banded_nw (the XLA scan
formulation) and bit-identical outputs, with the DP state kept on-chip:

- Orientation: **sublanes = band cells, lanes = problems.**  Each grid step
  updates a (W_sub, 128) block = one band row of 128 problems.  Putting
  the band on sublanes lets the sliding target window be a *dynamic sublane
  slice* (Mosaic allows arbitrary sublane offsets; lane offsets would need
  128-alignment), and lets the band width round to 8 instead of 128 — an
  ~3x work saving for narrow bands.
- Grid = (batch_tiles, Lq): TPU grid steps run sequentially, so the DP carry
  lives in VMEM scratch across row steps (reset at row 0); traceback move
  codes are 2-BIT PACKED, four DP rows per int8 byte — the tb array is the
  kernel's only big output and (through the ~20 MB/s remote-TPU transfer
  path) the dominant cost of host-side path decoding, so the packing is a
  4x end-to-end win; decoders unpack inline (ops/nw_band.traceback_paths,
  native/traceback.cpp).
- The within-row deletion chain is a Hillis–Steele min-plus prefix scan over
  sublanes (log2(W) roll+min steps).
- **int16 DP state** whenever max(Lq, Lt) < 8192 (always, for read-scale
  problems): scores are bounded by max sequence length, so 16-bit lanes hold
  the whole dynamic range (INF16 = 16384 with < 2x headroom growth per
  kernel, see the overflow audit in _kernel) and the VPU packs two values
  per 32-bit lane — ~2x elementwise throughput on the DP core.
- The per-problem final score is tracked as a full (W, 128) band snapshot
  (select on `i == qlen`, 2 VPU ops/row) instead of a per-row sublane
  reduction (~9 ops/row); one reduction happens at the last grid step.

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
INF16 = 16384    # int16-path INF: real scores are < 8192, growth is bounded


def pallas_available() -> bool:
    # A failed axon-plugin init makes default_backend() RAISE (not return
    # "cpu"); treat that as "no TPU" so callers degrade instead of crashing
    # (a bare raise here cost round 2 its headline bench — BENCH_r02.json).
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def band_width_sub(band_radius: int) -> int:
    """Band cells on the sublane dim: 2r+1 rounded to the sublane tile (8)."""
    return round_up(2 * band_radius + 1, 8)


def _shift_from_lower_sub(x, s, krow, fill):
    """out[k, :] = x[k-s, :], `fill` for k < s (sublane axis = 0)."""
    rolled = pltpu.roll(x, shift=s, axis=0)
    return jnp.where(krow >= s, rolled, fill)


def _kernel(qT_ref, tT_hbm, qlen_ref, tlen_ref, score_ref, tb_ref,
            prev_ref, final_ref, tscr_ref, dma_sem, *, band_radius: int,
            W: int, Lq: int, R: int, dp_dtype, dp_inf: int):
    r = band_radius
    bt = pl.program_id(0)                 # batch tile (lane block)
    chunk = pl.program_id(1)              # R DP rows per grid step
    n_chunks = pl.num_programs(1)
    # The target window rides in HBM (ANY) and only the rows this grid
    # step touches — [chunk*R, chunk*R + W + R) — are DMA'd into scratch:
    # the old full-length (S, 128) double-buffered VMEM block was ~10 MiB
    # at Lq=8192 and made wide-band long buckets Mosaic-infeasible
    # (0820_1318_correct_full.log).
    cp = pltpu.make_async_copy(
        tT_hbm.at[pl.ds(chunk * R, W + R),
                  pl.ds(bt * LANE_TILE, LANE_TILE)],
        tscr_ref, dma_sem)
    cp.start()
    cp.wait()
    krow = jax.lax.broadcasted_iota(jnp.int32, (W, LANE_TILE), 0)
    krow_dp = krow.astype(dp_dtype)
    inf = jnp.asarray(dp_inf, dp_dtype)
    delta = krow - r                      # j - i per sublane
    in_band = krow <= 2 * r
    qlen = qlen_ref[:]                    # (1, LANE_TILE)
    tlen = tlen_ref[:]
    tlen_u = tlen.astype(jnp.uint32)

    @pl.when(chunk == 0)
    def _init():
        row0 = jnp.where((delta >= 0) & (delta <= tlen) & in_band,
                         delta, dp_inf)
        prev_ref[:] = row0.astype(dp_dtype)
        # final snapshot starts as row 0: for qlen == 0 problems the emit
        # reduction picks D[0, tlen] = tlen from it; rows never overwrite.
        final_ref[:] = row0.astype(dp_dtype)

    prev = prev_ref[:]
    final = final_ref[:]
    base = chunk * R
    acc0 = jnp.zeros((W, LANE_TILE), jnp.int32)

    # fori_loop over the R rows, NOT a static unroll: Mosaic reuses
    # scoped-stack slots across a loop region's iterations but allocates
    # top-level SSA temporaries uniquely, and the unrolled R=16 rows'
    # temporaries (~11 (W, 128) planes measured) put wide bands over the
    # 16 MiB limit (the same lesson as the POA consensus kernel).
    def row_step(rr, carry):
        prev, final, acc = carry
        i = base + rr + 1                 # DP row 1..Lq
        jv = i + delta
        # 0 <= jv <= tlen as ONE unsigned compare; padding lanes have
        # tlen = 0 so they only keep the jv == 0 column (masked by in_band)
        valid = (jv.astype(jnp.uint32) <= tlen_u) & (i <= qlen) & in_band
        tvec = tscr_ref[pl.ds(rr, W), :]        # t[j-1] per (k, problem)
        qch = qT_ref[pl.ds(rr, 1), :]           # (1, LANE_TILE)
        sub = jnp.where((qch == tvec) & (qch >= 0),
                        jnp.asarray(0, dp_dtype),
                        jnp.asarray(1, dp_dtype))

        up = pltpu.roll(prev, shift=W - 1, axis=0)  # up[k] = prev[k+1]
        up = jnp.where(krow < W - 1, up, inf)
        diag = prev + sub
        tmp = jnp.minimum(diag, up + jnp.asarray(1, dp_dtype))
        i_dp = jax.lax.convert_element_type(i, dp_dtype)
        tmp = jnp.where(jv == 0, i_dp, tmp)
        tmp = jnp.where(valid, tmp, inf)

        # min-plus prefix over sublanes: cur[k] = k + min_{l<=k}(tmp[l] - l)
        c = tmp - krow_dp
        for p in range(max(1, (W - 1).bit_length())):
            c = jnp.minimum(c, _shift_from_lower_sub(c, 1 << p, krow, inf))
        cur = jnp.where(valid, c + krow_dp, inf)

        left = _shift_from_lower_sub(cur, 1, krow, inf)
        # select in the DP dtype, single cast to int8 at the packed store
        # (Mosaic cannot relayout an (8,128)-tiled i1 mask onto (32,128)
        # int8 lanes); four 2-bit codes accumulate per output byte
        code = jnp.where(
            cur == diag, sub,
            jnp.where(cur == left + jnp.asarray(1, dp_dtype),
                      jnp.asarray(AlignmentState.DELETION, dp_dtype),
                      jnp.asarray(AlignmentState.INSERTION, dp_dtype)))
        m = rr % 4
        code32 = code.astype(jnp.int32)
        # static shifts + selects (a dynamic shift-by-scalar may not
        # legalize; four cases cover the 2-bit packing positions)
        code32 = jnp.where(m == 1, code32 << 2,
                           jnp.where(m == 2, code32 << 4,
                                     jnp.where(m == 3, code32 << 6,
                                               code32)))
        acc = acc | code32

        @pl.when(m == 3)
        def _store():
            tb_ref[pl.ds(rr // 4, 1)] = acc.astype(jnp.int8)[None]

        acc = jnp.where(m == 3, 0, acc)
        final = jnp.where(i == qlen, cur, final)
        return cur, final, acc

    prev, final, _ = jax.lax.fori_loop(0, R, row_step, (prev, final, acc0))

    prev_ref[:] = prev
    final_ref[:] = final

    @pl.when(chunk == n_chunks - 1)
    def _emit():
        lane_final = r + tlen - qlen          # (1, LANE_TILE) int32
        hit = krow == lane_final              # at most one sublane per lane
        score_ref[:] = jnp.sum(
            jnp.where(hit, final_ref[:].astype(jnp.int32), 0),
            axis=0, keepdims=True)


#: feasibility budget for the row kernel's scoped-VMEM allocation (one
#: v5e core has 16 MiB; leave headroom for Mosaic)
ROW_VMEM_BUDGET = 14 * 2**20


def vmem_row_bytes(Lq0: int, Lt: int, band_radius: int) -> int:
    """Scoped-VMEM bytes one grid step of the row kernel needs (grid > 1
    double-buffers every VMEM in/out block; scratch single; ~7 live
    (W, 128) value planes — the fori_loop'd row body's carries plus the
    min-plus chain temporaries).  The pre-round-5 kernel held the FULL
    (S, 128) target in double-buffered VMEM (~10 MiB at Lq=8192) and
    unrolled all R=16 rows at top level (~11 live planes, measured via
    the 20.77 MiB Mosaic OOM at Lq=2048/r=1024); the target now streams
    through a (W+R, 128) DMA window and rows run as a loop region, so
    wide-band long buckets (Lq=8192, r<=1024) fit — which is what keeps
    5 kb correction spans off the O(Lq*Lt) Hirschberg path."""
    r = band_radius
    W = band_width_sub(r)
    R = 16
    ins = 2 * 4 * 128 * (R + 2)
    outs = 2 * (128 * 4 + (R // 4) * W * 128)
    scratch = (2 * W + W + R) * 128 * 4
    live = 7 * W * 128 * 4
    return ins + outs + scratch + live


@functools.partial(jax.jit, static_argnames=("band_radius", "interpret"))
def banded_nw_pallas(q, qlen, t, tlen, band_radius: int,
                     interpret: bool = False):
    """Banded NW with on-chip DP state.

    Returns (scores (B,) int32, tb (Lq//4, B, W_sub) int8 with FOUR 2-bit
    move codes per byte — decode with traceback_paths(..., packed=True)).
    Score semantics identical to ops.nw_band.banded_nw; the batch is padded
    internally to a multiple of 128.
    """
    B, Lq0 = q.shape
    Lt = t.shape[1]
    r = band_radius
    W = band_width_sub(r)
    Bp = round_up(max(B, LANE_TILE), LANE_TILE)
    R = 16                                     # DP rows per grid step
    Lq = round_up(Lq0, R)

    # int16 DP state would double VPU throughput (scores are bounded by the
    # max sequence length, see module docstring) but current Mosaic cannot
    # lower sublane rotates on 16-bit vectors ("Rotate with non-32-bit
    # data"), and the kernel is built around 9 rolls/row.  Parameterization
    # kept so the int16 path can be re-enabled when Mosaic supports it.
    fits16 = False
    dp_dtype = jnp.int16 if fits16 else jnp.int32
    dp_inf = INF16 if fits16 else int(INF)

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

    kernel = functools.partial(_kernel, band_radius=r, W=W, Lq=Lq, R=R,
                               dp_dtype=dp_dtype, dp_inf=dp_inf)
    grid = (Bp // LANE_TILE, Lq // R)
    scores, tb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, LANE_TILE), lambda b, i: (i, b),
                         memory_space=pltpu.VMEM),
            # target stays in HBM; the kernel DMAs its (W+R)-row window
            pl.BlockSpec(memory_space=pltpu.ANY),
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
            jax.ShapeDtypeStruct((Lq // 4, W, Bp), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((W, LANE_TILE), dp_dtype),   # prev row
            pltpu.VMEM((W, LANE_TILE), dp_dtype),   # final-row snapshot
            pltpu.VMEM((W + R, LANE_TILE), jnp.int32),  # target window
            pltpu.SemaphoreType.DMA,
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
