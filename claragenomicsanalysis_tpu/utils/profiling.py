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
#: measured cost of one fence round trip on an idle device (seconds);
#: subtracted from each fenced range so stage sums don't exceed the outer
#: wall (round-4 finding: the 100 Mbp fenced run reported device_stage_s
#: 34.91 > wall_s 34.16, bench_logs/0820_0621_map_fenced.log)
_FENCE_RT = 0.0


def set_fenced_timings(on: bool) -> None:
    """Profiling-only knob (scripts/bench_map_scale.py --fenced).  Costs
    one tunnel round trip (~30 ms) per range, so never leave it on in
    product runs.  On enable, calibrates the round-trip cost on the idle
    device (median of 5) so each range can subtract its own exit fence."""
    global _FENCED, _FENCE_RT
    _FENCED = bool(on)
    if _FENCED:
        device_fence()          # drain anything queued before calibrating
        costs = []
        for _ in range(5):
            t0 = time.perf_counter()
            device_fence()
            costs.append(time.perf_counter() - t0)
        _FENCE_RT = sorted(costs)[len(costs) // 2]
    else:
        _FENCE_RT = 0.0


def is_fenced() -> bool:
    """True while fenced (truthful-split) timing is on.  Concurrency-
    hiding paths (prefetch threads, one-behind pipelines) should run
    SERIAL under it: a fence waits for GLOBAL device quiescence, so a
    worker thread's range otherwise absorbs the main thread's device time
    (the round-5 'pack 20.05 s' artifact, 0820_0947_map_fenced2.log)."""
    return _FENCED


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
    """NVTX-range analog: labels the XLA profile AND accumulates wall time.
    Fenced mode: the entry fence charges queued-up work to WHOEVER queued
    it (before t0); the exit fence waits for this range's own device work;
    the fence's pure round-trip cost (calibrated at enable) is subtracted
    so stage sums stay <= the outer wall."""
    if _FENCED:
        device_fence()
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
        if _FENCED:
            device_fence()
    dt = time.perf_counter() - t0
    if _FENCED:
        dt = max(0.0, dt - _FENCE_RT)
    _STAGE_TOTALS[name] += dt
    _STAGE_COUNTS[name] += 1


def stage_timings() -> dict[str, dict[str, float]]:
    return {
        k: {"total_s": _STAGE_TOTALS[k], "count": _STAGE_COUNTS[k]}
        for k in sorted(_STAGE_TOTALS)
    }


def toplevel_total_s(timings: dict[str, dict[str, float]],
                     prefix: str = "") -> float:
    """Sum of the TOP-LEVEL ranges only: a range nested under another
    recorded range ('mapper.match.count' under 'mapper.match') is already
    inside its parent's total — summing every key double-counts it (the
    other half of the round-4 device_stage_s > wall_s anomaly)."""
    keys = [k for k in timings if k.startswith(prefix)]
    return sum(timings[k]["total_s"] for k in keys
               if not any(k != p and k.startswith(p + ".") for p in keys))


def reset_stage_timings() -> None:
    _STAGE_TOTALS.clear()
    _STAGE_COUNTS.clear()
