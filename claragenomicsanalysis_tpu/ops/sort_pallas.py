"""Pallas TPU bitonic sort for the mapper's chain-stage key pairs.

Why: the pack2 chain sort (ops/map_ops.chain_anchors) is the mapper's
dominant device stage at 100 Mbp scale (~0.7 s/pair on lax.sort with two
uint32 operands at 64M rows).  XLA's TPU sort runs the same O(n log^2 n)
bitonic network but round-trips HBM on (nearly) every pass; this kernel
blocks the array into VMEM tiles so all passes with stride < tile size run
on-chip: the initial local sort (log^2 V / 2 passes) and every merge
stage's local tail (log V passes) cost ONE HBM round trip each, leaving
only the true cross-tile passes (sum over stages s>logV of s-logV) as
full-array traffic.  At n=2^26, V=2^17: 45 cross passes + 10 local sweeps
~= 28 GB of HBM traffic vs ~180 GB for per-pass round-tripping.

Network notes (reference: Batcher 1968; layout OURS, TPU-shaped):
- element i's logical position maps to (tile t, T-row, sublane, lane) with
  lane fastest; stride-2^j partners are lane rolls (j<7), sublane rolls
  (7<=j<10), T-row flips (10<=j<logV) and cross-tile block pairs (j>=logV),
  so no pass ever needs a per-lane gather — only rolls, slices and selects.
- direction bit s of i is a local iota bit for s<logV and a per-tile
  program_id bit above, so masks are vector constants or scalars.
- uint32 keys are compared in int32 after an order-preserving sign-bit
  flip (Mosaic's signed compares), restored on exit.
- unstable, ascending by (k1, k2) lexicographic — exactly lax.sort
  semantics when every operand is a key (ties are identical rows).

Interpret-mode tests assert bit-equality with lax.sort
(tests/test_sort_pallas.py); on-chip A/B via scripts/ablate_sort.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
ROW = LANE * SUB          # elements per (8,128) plane


def _linear_iota(T):
    """(T, 8, 128) int32 linear element index (lane fastest)."""
    t = jax.lax.broadcasted_iota(jnp.int32, (T, SUB, LANE), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (T, SUB, LANE), 1)
    l = jax.lax.broadcasted_iota(jnp.int32, (T, SUB, LANE), 2)
    return (t * SUB + s) * LANE + l


def _partner(x, j, T):
    """Value of each element's stride-2^j partner within a (T,8,128) tile.

    For the low slot (bit j of i == 0) the partner sits +2^j away, for the
    high slot -2^j; rolls are cyclic but pairs never cross a 2^(j+1) block,
    so both directions are fetched and selected by the slot bit."""
    d = 1 << j
    if j < 7:                      # lane axis (shifts must be non-negative)
        fwd = pltpu.roll(x, LANE - d, 2)
        bwd = pltpu.roll(x, d, 2)
    elif j < 10:                   # sublane axis
        fwd = pltpu.roll(x, SUB - d // LANE, 1)
        bwd = pltpu.roll(x, d // LANE, 1)
    else:                          # T-row axis: flip within stride pairs
        dt = d // ROW
        y = x.reshape(T // (2 * dt), 2, dt, SUB, LANE)
        y = jnp.concatenate([y[:, 1:2], y[:, 0:1]], axis=1)
        return y.reshape(T, SUB, LANE)
    lowslot = (_linear_iota(T) & d) == 0
    return jnp.where(lowslot, fwd, bwd)


def _cmp_exchange(k1, k2, p1, p2, keep_min):
    """Lexicographic compare-exchange: take the partner's row where doing
    so moves the kept extremum here (ties keep own — valid for bitonic).

    The boolean algebra runs in int32 0/1 arithmetic: a boolean-valued
    ``jnp.where`` lowers to a select_n on i1 vectors, which Mosaic
    implements via an i8 mask + ``arith.trunci i8 -> i1`` — unsupported on
    TPU (the round-3 on-chip crash, bench_logs_queue_r3.log).  Comparisons
    and the final value-select on int32 operands lower fine."""
    p_less = ((p1 < k1) | ((p1 == k1) & (p2 < k2))).astype(jnp.int32)
    neq = ((p1 != k1) | (p2 != k2)).astype(jnp.int32)
    km = jnp.asarray(keep_min).astype(jnp.int32)
    take = (km * p_less + (1 - km) * (1 - p_less) * neq) != 0
    return jnp.where(take, p1, k1), jnp.where(take, p2, k2)


def _local_pass(k1, k2, s, j, T, tile_bits):
    """One in-tile pass: stage s, stride 2^j (j < logV = log2(T*1024)).

    tile_bits = per-tile scalar int32 carrying global index bits >= logV
    (program_id << logV), so direction bits above the tile range work."""
    iota = _linear_iota(T)
    gidx = iota | tile_bits
    # keep_min <=> (bit j of i == 0) == (direction bit s == 0); computed as
    # an int-bit equality so no bool-vector==bool-vector op reaches Mosaic
    asc_bit = (gidx >> s) & 1 if s < 31 else jnp.zeros_like(gidx)
    low_bit = (iota >> j) & 1
    keep_min = low_bit == asc_bit
    p1 = _partner(k1, j, T)
    p2 = _partner(k2, j, T)
    return _cmp_exchange(k1, k2, p1, p2, keep_min)


def _local_sort_kernel(k1_ref, k2_ref, o1_ref, o2_ref, *, T, logV):
    """Full bitonic sort of one tile (stages 1..logV); all direction bits
    live inside the tile except the sign carried by the grid index."""
    tile_bits = pl.program_id(0) << logV
    k1, k2 = k1_ref[...], k2_ref[...]
    for s in range(1, logV + 1):
        for j in range(s - 1, -1, -1):
            k1, k2 = _local_pass(k1, k2, s, j, T, tile_bits)
    o1_ref[...] = k1
    o2_ref[...] = k2


def _merge_tail_kernel(k1_ref, k2_ref, o1_ref, o2_ref, *, T, logV, s):
    """Stage s's local tail: passes j = logV-1 .. 0 (direction constant per
    tile: bit (s - logV) of the tile index... carried via tile_bits)."""
    tile_bits = pl.program_id(0) << logV
    k1, k2 = k1_ref[...], k2_ref[...]
    for j in range(logV - 1, -1, -1):
        k1, k2 = _local_pass(k1, k2, s, j, T, tile_bits)
    o1_ref[...] = k1
    o2_ref[...] = k2


def _cross_kernel(a1_ref, a2_ref, b1_ref, b2_ref, o1_ref, o2_ref,
                  *, s, p, logV):
    """One cross-tile pass: tile g exchanges with tile g ^ 2^p (p = j - logV
    >= 0).  Grid runs over ALL tiles; each writes only its own block from
    the two tiles' OLD values (outputs are fresh buffers, so the
    sequential grid cannot read a partner's new value)."""
    g = pl.program_id(0)
    side_hi = (g & (1 << p)) != 0            # this tile holds the high slots
    asc = (((g << logV) >> s) & 1) == 0      # direction bit s (>= logV + p)
    keep_min = side_hi != asc                # low slot keeps min when asc
    k1, k2 = a1_ref[...], a2_ref[...]
    p1, p2 = b1_ref[...], b2_ref[...]
    o1, o2 = _cmp_exchange(k1, k2, p1, p2, keep_min)
    o1_ref[...] = o1
    o2_ref[...] = o2


def _tiles(n):
    return n // ROW


@functools.partial(jax.jit, static_argnames=("logV", "interpret"))
def bitonic_sort_pairs(k1, k2, logV: int = 17, interpret: bool = False):
    """Sort (k1, k2) uint32 pairs ascending-lexicographic (unstable — ties
    must be fully identical rows, as in the pack2 chain sort).  n must be a
    power of two and a multiple of 1024; logV caps the VMEM tile (elements
    per tile = min(n, 2^logV); 2^17 * 2 words * 4 B = 1 MiB resident)."""
    n = k1.shape[0]
    assert n & (n - 1) == 0 and n >= ROW, n
    logn = n.bit_length() - 1
    logV = min(logV, logn)
    V = 1 << logV
    T = V // ROW
    n_tiles = _tiles(n) // T
    bias = jnp.uint32(0x80000000)
    s1 = jax.lax.bitcast_convert_type(k1 ^ bias,
                                      jnp.int32).reshape(_tiles(n), SUB, LANE)
    s2 = jax.lax.bitcast_convert_type(k2 ^ bias,
                                      jnp.int32).reshape(_tiles(n), SUB, LANE)

    tile_spec = pl.BlockSpec((T, SUB, LANE), lambda g: (g, 0, 0))

    def local_call(kernel, x1, x2, **kw):
        return pl.pallas_call(
            functools.partial(kernel, **kw),
            grid=(n_tiles,),
            in_specs=[tile_spec, tile_spec],
            out_specs=[tile_spec, tile_spec],
            out_shape=[jax.ShapeDtypeStruct(x1.shape, jnp.int32)] * 2,
            interpret=interpret,
        )(x1, x2)

    # phase 1: full local sort of every tile (stages 1..logV)
    s1, s2 = local_call(_local_sort_kernel, s1, s2, T=T, logV=logV)

    # phase 2: merge stages logV+1..logn — cross passes then the local tail
    for s in range(logV + 1, logn + 1):
        for j in range(s - 1, logV - 1, -1):
            p = j - logV
            own = pl.BlockSpec((T, SUB, LANE), lambda g: (g, 0, 0))

            def partner_map(g, _p=p):
                return (g ^ (1 << _p), 0, 0)

            other = pl.BlockSpec((T, SUB, LANE), partner_map)
            s1, s2 = pl.pallas_call(
                functools.partial(_cross_kernel, s=s, p=p, logV=logV),
                grid=(n_tiles,),
                in_specs=[own, own, other, other],
                out_specs=[tile_spec, tile_spec],
                out_shape=[jax.ShapeDtypeStruct(s1.shape, jnp.int32)] * 2,
                interpret=interpret,
            )(s1, s2, s1, s2)
        s1, s2 = local_call(_merge_tail_kernel, s1, s2, T=T, logV=logV, s=s)

    u1 = jax.lax.bitcast_convert_type(s1.reshape(n), jnp.uint32) ^ bias
    u2 = jax.lax.bitcast_convert_type(s2.reshape(n), jnp.uint32) ^ bias
    return u1, u2
