"""On-chip A/B: anti-diagonal banded-NW kernel (ops/nw_diag_pallas.py) vs
the row-major flagship (ops/nw_band_pallas.py) — the VERDICT r2 #8 lever.

The row kernel pays a log2(W)-step min-plus prefix scan per DP row (~24 of
~55 VPU ops); the diagonal kernel replaces it with one roll + a 3-way min.
Predicted ~1.7-2x fewer instructions per cell -> target >= 150 Gcells/s on
the traceback path (row kernel measured ~92).

Protocol (bench/harness.py rules): on-device equality preflight first
(scores AND decoded paths at small size), then Gcells/s at the pipeline
shape (B=1024, 512 bp pairs, r=64 — the band bucket pipeline-scale spans
land in) for both kernels in the same process.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from claragenomicsanalysis_tpu.bench.harness import time_scanned
    from claragenomicsanalysis_tpu.ops import nw_band
    from claragenomicsanalysis_tpu.ops.nw_band_pallas import banded_nw_pallas
    from claragenomicsanalysis_tpu.ops.nw_diag_pallas import (
        banded_nw_diag_pallas, traceback_paths_diag)
    from claragenomicsanalysis_tpu.utils.genomeutils import (
        encode, generate_random_genome, mutate_sequence)

    rng = np.random.default_rng(0)

    def make(B, Lq, Lt, err):
        qs, ts = [], []
        for _ in range(B):
            a = generate_random_genome(int(rng.integers(Lq // 2, Lq)), rng)
            b = mutate_sequence(a, err, rng)[:Lt]
            qs.append(a)
            ts.append(b)
        return (np.stack([encode(a, Lq) for a in qs]),
                np.array([len(a) for a in qs], np.int32),
                np.stack([encode(b, Lt) for b in ts]),
                np.array([len(b) for b in ts], np.int32))

    # ---- equality preflight (on device, small shape)
    q, qlen, t, tlen = make(256, 192, 192, 12)
    r = 24
    s_row, tb_row = banded_nw_pallas(jnp.asarray(q), jnp.asarray(qlen),
                                     jnp.asarray(t), jnp.asarray(tlen), r)
    s_d, tb_d = banded_nw_diag_pallas(jnp.asarray(q), jnp.asarray(qlen),
                                      jnp.asarray(t), jnp.asarray(tlen), r)
    assert np.array_equal(np.asarray(s_row), np.asarray(s_d)), "SCORES DIFFER"
    p_row = nw_band.traceback_paths(np.asarray(tb_row), qlen, tlen, r,
                                    packed=True)
    p_d = traceback_paths_diag(np.asarray(tb_d), qlen, tlen, r)
    n_cmp = 0
    for b, sc in enumerate(np.asarray(s_d)):
        if sc < int(nw_band.INF):     # overflow walks need not agree
            assert p_row[b] == p_d[b], f"PATHS DIFFER at {b}"
            n_cmp += 1
    print(f"preflight OK: scores identical; {n_cmp} in-band paths identical")

    # ---- throughput A/B at the pipeline shape
    B, Lq, Lt, r = 1024, 512, 512, 64
    K, loops = 4, 8
    datasets = [make(B, Lq, Lt, 20) for _ in range(K)]
    cells = B * Lq * (2 * r + 1)                  # band cells actually swept

    for name, fn in (
            ("row ", lambda *a: banded_nw_pallas(*a, band_radius=r)),
            ("diag", lambda *a: banded_nw_diag_pallas(*a, band_radius=r))):
        # time scores+tb production (tb write included; decode excluded)
        dt = time_scanned(lambda q, ql, t, tl: fn(q, ql, t, tl)[0],
                          datasets, loops=loops)
        print(f"{name}: {cells / dt / 1e9:7.1f} Gcells/s "
              f"({dt * 1e3:.1f} ms/batch, B={B} Lq={Lq} r={r})")

    # ---- end-to-end CIGAR path (incl. host decode) for the record
    for name, run, dec in (
            ("row ", lambda: banded_nw_pallas(
                jnp.asarray(datasets[0][0]), jnp.asarray(datasets[0][1]),
                jnp.asarray(datasets[0][2]), jnp.asarray(datasets[0][3]), r),
             lambda tb: nw_band.traceback_paths(
                 np.asarray(tb), datasets[0][1], datasets[0][3], r,
                 packed=True)),
            ("diag", lambda: banded_nw_diag_pallas(
                jnp.asarray(datasets[0][0]), jnp.asarray(datasets[0][1]),
                jnp.asarray(datasets[0][2]), jnp.asarray(datasets[0][3]), r),
             lambda tb: traceback_paths_diag(
                 np.asarray(tb), datasets[0][1], datasets[0][3], r))):
        run()                                        # warm
        t0 = time.perf_counter()
        _, tb = run()
        paths = dec(tb)
        dt = time.perf_counter() - t0
        print(f"{name} e2e (kernel + download + decode): "
              f"{B / dt:7.0f} alignments/s ({dt * 1e3:.0f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
