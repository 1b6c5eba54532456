"""Headline benchmark: DP cell-updates/s/chip on the flagship Myers
bit-vector kernel (BASELINE.md north-star metric #1 — the reference's own
fastest aligner is Myers, cudaaligner/src/myers_gpu.cu [U]).

Prints ONE JSON headline line: {"metric", "value", "unit", "vs_baseline"},
then secondary metric lines (POA cells/s, mapper overlaps/s) so regressions
in the non-headline kernels stay driver-visible.  The driver parses the
FIRST line.

Baseline: the self-measured speed-of-light estimate for one v5e chip
(BASELINE.md — the reference publishes no numbers).  VPU int32 throughput
~= 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85e12 op/s; the Myers
kernel executes ~27 VPU bit-ops per 32-bit word = ~0.84 op/cell, giving a
roofline of ~4.56e12 cells/s.  vs_baseline = value / 4.56e12 (1.0 == at
roofline).  For scale: the banded-NW wavefront kernel (the traceback path)
sustains ~94 Gcells/s on the same chip — Myers advances 32 cells per word op.

Why the kernel sits at ~0.86x and not higher (audited 2026-08-17): the ALU
roofline ignores the Pv/Mv state traffic — each word update also issues 2
VMEM loads + 2 stores, i.e. ~31 issue slots per 27 ALU ops, predicting
27/31 = 0.87x, which matches the measurement.  A register-resident variant
(Pv/Mv hoisted across the 32-column grid step) measures IDENTICAL
(3.83 vs 3.85 Tcells/s): the state is Wq x SUB = 128 vregs per array, far
over the register file, so Mosaic spills it back to VMEM.  Closing the gap
would need fewer ops/word; Hyyro's blocked formulation is already minimal.

Timing methodology (see claragenomicsanalysis_tpu/bench/harness.py): one
dispatch scanning K distinct device-resident datasets with enough on-device
loops that compute dominates the ~30 ms tunnel latency (the Myers kernel
needs loops>=256: at ~75 us/iter, short runs are swamped by latency noise —
measured convergence 8/32/128/512 loops = 7.6/4.2/3.4/3.5 Tcells/s).

Hardening (round-3): a DOWN axon tunnel can either HANG jax.devices() or
poison the in-process backend cache with a JaxRuntimeError — the latter cost
round 2 its headline number (BENCH_r02.json rc=1).  So the TPU backend is
never touched in-process until a subprocess probe (with a timeout) proves
the tunnel is alive; any failure degrades to a labeled CPU smoke line,
always rc=0, always valid JSON on the first line.
"""

import json
import os
import subprocess
import sys

import numpy as np

ROOFLINE_CELLS_PER_S = 4.56e12
_CPU_MARKER = "CGA_BENCH_FORCE_CPU"  # set on re-exec to prevent recursion


def _force_cpu_env() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize pin off (children)


def probe_tpu(timeout: float = 150.0) -> bool:
    """True iff the axon tunnel answers with a non-CPU device, probed in a
    SUBPROCESS so a hang or a failed PJRT init can't take this process down
    (jax.devices() hangs when the tunnel is half-up; a failed axon init
    makes every later jax.default_backend() call raise)."""
    if os.environ.get(_CPU_MARKER):
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "assert d and d[0].platform != 'cpu', d; print('up')"],
            capture_output=True, timeout=timeout)
        return r.returncode == 0 and b"up" in r.stdout
    except Exception:
        return False


def _measure(on_tpu: bool) -> dict:
    from claragenomicsanalysis_tpu.bench.harness import time_scanned
    from claragenomicsanalysis_tpu.ops.myers import myers_bottom_row
    from claragenomicsanalysis_tpu.ops.myers_pallas import \
        myers_bottom_row_pallas
    from claragenomicsanalysis_tpu.utils.genomeutils import (
        encode, generate_random_genome, mutate_sequence)

    if on_tpu:
        B, Lq, Lt, K, loops = 1024, 512, 512, 8, 384
        fn = lambda q, ql, t, tl: myers_bottom_row_pallas(q, ql, t, tl)[1]  # noqa: E731
    else:  # CPU smoke mode: tiny shapes, XLA scan backend
        B, Lq, Lt, K, loops = 16, 64, 64, 2, 2
        fn = lambda q, ql, t, tl: myers_bottom_row(q, ql, t, tl)[1]  # noqa: E731

    rng = np.random.default_rng(0)
    datasets = []
    for _ in range(K):
        qs, ts = [], []
        for _ in range(B):
            a = generate_random_genome(Lq, rng)
            qs.append(a)
            ts.append(mutate_sequence(a, Lq // 25, rng)[:Lt])
        datasets.append((
            np.stack([encode(a, Lq) for a in qs]).astype(np.int8),
            np.array([len(a) for a in qs], np.int32),
            np.stack([encode(b, Lt) for b in ts]).astype(np.int8),
            np.array([len(b) for b in ts], np.int32)))

    dt = time_scanned(fn, datasets, loops=loops)
    cells_per_s = B * Lq * Lt / dt       # full-matrix edit-distance cells
    return {
        "metric": "Myers bit-vector DP cell-updates/s/chip"
                  + ("" if on_tpu else " (CPU smoke mode)"),
        "value": round(cells_per_s / 1e9, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(cells_per_s / ROOFLINE_CELLS_PER_S, 4),
    }


def _secondary(on_tpu: bool):
    """Secondary metric lines: POA cells/s + mapper overlaps/s (the two
    kernels the headline can't see — VERDICT r2 weak #8).  Each is fenced
    so a failure yields a labeled line, never a crash."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    try:
        import bench_all
    except Exception as e:  # noqa: BLE001
        yield {"metric": "secondary", "error": f"import: {e}"[:200]}
        return
    if not on_tpu:
        yield {"metric": "POA graph-NW DP cell-updates/s/chip",
               "skipped": "no TPU (axon tunnel down)"}
        yield {"metric": "all-vs-all overlaps/s (1 chip)",
               "skipped": "no TPU (axon tunnel down)"}
        return
    for fn in (bench_all.bench_poa, bench_all.bench_mapper):
        try:
            yield fn()
        except Exception as e:  # noqa: BLE001
            yield {"metric": fn.__name__, "error": str(e)[:200]}


def main() -> int:
    on_tpu = probe_tpu()
    if not on_tpu:
        _force_cpu_env()

    import jax
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    try:
        headline = _measure(on_tpu)
    except Exception as e:  # noqa: BLE001
        if on_tpu and not os.environ.get(_CPU_MARKER):
            # TPU died between probe and measure: re-exec in CPU smoke mode
            # (a fresh process — this one's backend state may be poisoned).
            env = dict(os.environ)
            env[_CPU_MARKER] = "1"
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = ""
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env)
            return r.returncode
        headline = {
            "metric": "Myers bit-vector DP cell-updates/s/chip "
                      "(CPU smoke FAILED)",
            "value": 0.0, "unit": "Gcells/s", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }
    print(json.dumps(headline), flush=True)
    for line in _secondary(on_tpu):
        print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
