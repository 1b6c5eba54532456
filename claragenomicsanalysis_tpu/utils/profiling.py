"""Profiling ranges (reference: CGA_NVTX_RANGE in common/utils/cudautils.hpp
[U]) — mapped to jax.profiler trace annotations, with a stage-timing registry
for the structured per-stage metrics described in SURVEY.md §5.5."""

import contextlib
import time
from collections import defaultdict

import jax

_STAGE_TOTALS: dict[str, float] = defaultdict(float)
_STAGE_COUNTS: dict[str, int] = defaultdict(int)

#: fenced mode: each trace_range syncs the device before reading the clock
#: at entry AND exit, so a stage's wall time is ITS device time.  Default
#: off — JAX dispatch is async and the product path must stay async (the
#: whole point of lazy outputs); without the fence, all device time queued
#: so far rolls into whichever stage syncs first (round 3's "compact is
#: 97% of device time" misattribution, bench_logs_queue_r3.log:87).
_FENCED = False
_FENCE_SALT = 0


def set_fenced_timings(on: bool) -> None:
    """Profiling-only knob (scripts/bench_map_scale.py --fenced).  Costs
    one tunnel round trip (~30 ms) per range, so never leave it on in
    product runs."""
    global _FENCED
    _FENCED = bool(on)


def device_fence() -> None:
    """Wait until every dispatch enqueued so far has executed.  Through
    the axon tunnel `block_until_ready` returns before execution (see
    bench/harness.py rule 1), so the fence materializes a tiny SALTED
    computation to host: dispatches execute in order, and the salt defeats
    the tunnel's (executable, input-bytes) memoization (rule 2)."""
    global _FENCE_SALT
    import jax.numpy as jnp
    import numpy as np
    _FENCE_SALT += 1
    np.asarray(_fence_step(jnp.int32(_FENCE_SALT)))


@jax.jit
def _fence_step(x):
    return x + 1


@contextlib.contextmanager
def trace_range(name: str):
    """NVTX-range analog: labels the XLA profile AND accumulates wall time."""
    if _FENCED:
        device_fence()
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
        if _FENCED:
            device_fence()
    dt = time.perf_counter() - t0
    _STAGE_TOTALS[name] += dt
    _STAGE_COUNTS[name] += 1


def stage_timings() -> dict[str, dict[str, float]]:
    return {
        k: {"total_s": _STAGE_TOTALS[k], "count": _STAGE_COUNTS[k]}
        for k in sorted(_STAGE_TOTALS)
    }


def reset_stage_timings() -> None:
    _STAGE_TOTALS.clear()
    _STAGE_COUNTS.clear()
