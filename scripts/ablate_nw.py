"""Ablation micro-bench for the banded-NW Pallas kernel (TPU only).

Times kernel variants (some intentionally WRONG — timing only) to locate the
bottleneck: traceback write, min-plus prefix scan, dynamic tvec slice, rows
per grid step.  Not part of the library; results feed kernel tuning notes.

Findings (v5e, 512x512 r=63): prefix scan ~45% of runtime, tb write ~17%
(before 2-bit packing), tvec slice ~0; scan impls roll/concat equal; lax
cummin/associative_scan unsupported in Mosaic.  This script predates the
2-bit tb packing — it measures the unpacked variant by design.
"""

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from claragenomicsanalysis_tpu.bench.harness import time_scanned  # noqa: E402
from claragenomicsanalysis_tpu.ops.nw_band import INF  # noqa: E402
from claragenomicsanalysis_tpu.utils.genomeutils import (  # noqa: E402
    encode, generate_random_genome, mutate_sequence)
from claragenomicsanalysis_tpu.utils.mathutils import round_up  # noqa: E402

LANE = 128


def build(band_radius, Lq0, Lt, *, R=16, write_tb=True, do_scan=True,
          static_tvec=False, scan_impl="roll"):
    r = band_radius
    W = round_up(2 * r + 1, 8)
    Lq = round_up(Lq0, R)

    def kernel(qT_ref, tT_ref, qlen_ref, tlen_ref, score_ref, tb_ref,
               prev_ref, final_ref):
        chunk = pl.program_id(1)
        krow = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
        delta = krow - r
        in_band = krow <= 2 * r
        qlen = qlen_ref[:]
        tlen = tlen_ref[:]
        tlen_u = tlen.astype(jnp.uint32)

        @pl.when(chunk == 0)
        def _init():
            row0 = jnp.where((delta >= 0) & (delta <= tlen) & in_band,
                             delta, INF)
            prev_ref[:] = row0.astype(jnp.int32)
            final_ref[:] = row0.astype(jnp.int32)

        prev = prev_ref[:]
        final = final_ref[:]
        base = chunk * R
        for rr in range(R):
            i = base + rr + 1
            jv = i + delta
            valid = (jv.astype(jnp.uint32) <= tlen_u) & (i <= qlen) & in_band
            if static_tvec:
                tvec = tT_ref[pl.ds(rr, W), :]
            else:
                tvec = tT_ref[pl.ds(base + rr, W), :]
            qch = qT_ref[rr, :][None, :]
            sub = jnp.where((qch == tvec) & (qch >= 0), 0, 1).astype(jnp.int32)
            up = pltpu.roll(prev, shift=W - 1, axis=0)
            up = jnp.where(krow < W - 1, up, INF)
            diag = prev + sub
            tmp = jnp.minimum(diag, up + 1)
            tmp = jnp.where(jv == 0, i, tmp)
            tmp = jnp.where(valid, tmp, INF)
            if do_scan:
                c = tmp - krow
                if scan_impl == "roll":
                    for p in range(max(1, (W - 1).bit_length())):
                        rolled = pltpu.roll(c, shift=1 << p, axis=0)
                        c = jnp.minimum(c, jnp.where(krow >= (1 << p),
                                                     rolled, INF))
                elif scan_impl == "cummin":
                    c = jax.lax.cummin(c, axis=0)
                elif scan_impl == "concat":
                    for p in range(max(1, (W - 1).bit_length())):
                        s = 1 << p
                        shifted = jnp.concatenate(
                            [jnp.full((s, LANE), INF, jnp.int32), c[:-s]],
                            axis=0)
                        c = jnp.minimum(c, shifted)
                elif scan_impl == "assoc":
                    c = jax.lax.associative_scan(jnp.minimum, c, axis=0)
                cur = jnp.where(valid, c + krow, INF)
            else:
                cur = tmp
            if write_tb:
                left = jnp.where(krow >= 1, pltpu.roll(cur, shift=1, axis=0),
                                 INF)
                code = jnp.where(cur == diag, sub,
                                 jnp.where(cur == left + 1, 3, 2))
                tb_ref[rr] = code.astype(jnp.int8)
            final = jnp.where(i == qlen, cur, final)
            prev = cur
        prev_ref[:] = prev
        final_ref[:] = final

        @pl.when(chunk == pl.num_programs(1) - 1)
        def _emit():
            lane_final = r + tlen - qlen
            score_ref[:] = jnp.sum(
                jnp.where(krow == lane_final, final_ref[:], 0),
                axis=0, keepdims=True)

    @jax.jit
    def fn(q, qlen, t, tlen):
        B = q.shape[0]
        Bp = round_up(max(B, LANE), LANE)
        q2 = jnp.pad(q.astype(jnp.int32), ((0, Bp - B), (0, Lq - Lq0)),
                     constant_values=-1)
        t2 = jnp.pad(t.astype(jnp.int32), ((0, Bp - B), (0, 0)),
                     constant_values=-1)
        qlen2 = jnp.pad(qlen.astype(jnp.int32), (0, Bp - B))[None, :]
        tlen2 = jnp.pad(tlen.astype(jnp.int32), (0, Bp - B))[None, :]
        S = round_up(max(r + Lt, Lq) + W + 8, 8)
        qT = q2.T
        tT = jnp.full((S, Bp), -1, dtype=jnp.int32)
        tT = jax.lax.dynamic_update_slice(tT, t2.T, (r, 0))
        grid = (Bp // LANE, Lq // R)
        scores, tb = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[
                pl.BlockSpec((R, LANE), lambda b, i: (i, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, LANE), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANE), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, LANE), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W, LANE), lambda b, i: (i, 0, b),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((Lq, W, Bp), jnp.int8),
            ),
            scratch_shapes=[
                pltpu.VMEM((W, LANE), jnp.int32),
                pltpu.VMEM((W, LANE), jnp.int32),
            ],
        )(qT, tT, qlen2, tlen2)
        return scores

    return fn


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    B, Lq, Lt, r, K = 512, 512, 512, 63, 8
    rng = np.random.default_rng(0)
    datasets = []
    for _ in range(K):
        qs = [generate_random_genome(Lq, rng) for _ in range(B)]
        ts = [mutate_sequence(a, Lq // 25, rng)[:Lt] for a in qs]
        datasets.append((
            np.stack([encode(a, Lq) for a in qs]).astype(np.int8),
            np.array([len(a) for a in qs], np.int32),
            np.stack([encode(b, Lt) for b in ts]).astype(np.int8),
            np.array([len(b) for b in ts], np.int32)))
    cells = B * Lq * (2 * r + 1)

    variants = {
        "base R16": dict(),
        "scan cummin": dict(scan_impl="cummin"),
        "scan concat": dict(scan_impl="concat"),
        "scan assoc": dict(scan_impl="assoc"),
        "R32 concat": dict(R=32, scan_impl="concat"),
        "concat no tb": dict(scan_impl="concat", write_tb=False),
    }
    for name, kw in variants.items():
        try:
            fn = build(r, Lq, Lt, **kw)
            dt = time_scanned(fn, datasets, loops=64)
            print(f"{name:16s} {cells / dt / 1e9:8.1f} Gcells/s")
        except Exception as e:  # noqa: BLE001 — a rejected variant (e.g.
            # the deliberate cummin lowering probe) must not abort the
            # remaining ablations
            print(f"{name:16s} REJECTED: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
