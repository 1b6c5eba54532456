"""Structural bound test: vmem_bytes_estimate must dominate the actual
block+scratch VMEM arithmetic of EVERY pallas_call the v2 POA pipeline
issues, for the product shape families.

This is the test the round-4 crash demanded: the estimator then modeled
only 2 of 5 kernels, the unmodeled consensus kernel needed 18.5 MiB at
the w128/depth-16 correction-polish shape, and `cli correct` died in a
compile-time Mosaic VMEM OOM on chip (bench_logs/0820_0621_correct_scale
.log).  Interpret-mode bit-equality tests structurally cannot catch that
class of hole; this test spies on pl.pallas_call and recomputes each
call's VMEM bytes from its specs directly.

Accounting rules (calibrated against four measured Mosaic allocations:
the 18.50/16.32/19.50 MiB OOMs at grid 32/16/16 and the grid=1 profiler
runs that fit):
- grid product == 1: every VMEM block is held ONCE (no pipelining);
- grid product > 1: EVERY grid-indexed VMEM in/out block is double-
  buffered — input_output_aliases included (the 19.50 MiB add-kernel OOM
  is exactly the x2-planes arithmetic);
- scratch is single (x1); SMEM and ANY/semaphore operands are not VMEM.
models/poa dispatches lane-axis kernels in 128-window slices so their
grid is 1 in production; nwtb (grid Wp/WPG) and MSA (grid (1, S)) still
run multi-step.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.config import (BatchSize, CorrectConfig,
                                                   PoaScores)
from claragenomicsanalysis_tpu.models.correct import _polish_batch_size
from claragenomicsanalysis_tpu.ops import poa_pallas2


def _space(spec):
    ms = getattr(spec, "memory_space", None)
    s = str(ms).lower() if ms is not None else "vmem"
    if "smem" in s:
        return "smem"
    if "any" in s:
        return "any"
    if "semaphore" in s:
        return "sem"
    return "vmem"


def _block_bytes(spec, shape_dtype):
    """VMEM bytes of one buffer of this operand's block."""
    if _space(spec) != "vmem":
        return 0
    bshape = getattr(spec, "block_shape", None)
    if bshape is None:
        bshape = shape_dtype.shape
    bshape = [d for d in bshape if d is not None]
    return math.prod(bshape) * np.dtype(shape_dtype.dtype).itemsize


def _scratch_bytes(sc):
    shape = getattr(sc, "shape", None)
    dtype = getattr(sc, "dtype", None)
    if shape is None or dtype is None:   # semaphores etc.
        return 0
    ms = getattr(sc, "memory_space", None)
    if ms is not None and "smem" in str(ms).lower():
        return 0
    return math.prod(shape) * np.dtype(dtype).itemsize


def _call_vmem_bytes(kw, in_avals, out_shape):
    in_specs = kw.get("in_specs") or []
    out_specs = kw.get("out_specs") or ()
    if not isinstance(out_specs, (list, tuple)):
        out_specs = (out_specs,)
    if not isinstance(out_shape, (list, tuple)):
        out_shape = (out_shape,)
    grid = kw.get("grid") or ()
    if not isinstance(grid, (list, tuple)):
        grid = (grid,)
    mult = 1 if math.prod(grid) <= 1 else 2
    total = 0
    for spec, aval in zip(in_specs, in_avals):
        total += mult * _block_bytes(spec, aval)
    for spec, sd in zip(out_specs, out_shape):
        total += mult * _block_bytes(spec, sd)
    for sc in kw.get("scratch_shapes") or []:
        total += _scratch_bytes(sc)
    return total


@pytest.fixture
def spy_pallas(monkeypatch):
    calls = []
    orig = poa_pallas2.pl.pallas_call

    def spied(kernel, **kw):
        wrapped = orig(kernel, **kw)

        def runner(*args):
            grid = kw.get("grid") or ()
            if not isinstance(grid, (list, tuple)):
                grid = (grid,)
            calls.append({
                "bytes": _call_vmem_bytes(
                    kw,
                    [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args],
                    kw.get("out_shape")),
                "grid": tuple(grid),
                "has_smem_in": any(_space(s) == "smem"
                                   for s in (kw.get("in_specs") or [])),
            })
            return wrapped(*args)

        return runner

    monkeypatch.setattr(poa_pallas2.pl, "pallas_call", spied)
    jax.clear_caches()   # force retrace so every pallas_call is observed
    yield calls
    jax.clear_caches()   # drop executables traced with the spy


def _drive(bs, msa, WPG):
    """TRACE the full v2 pipeline (all five kernels) — the spy records
    each pallas_call's specs at trace time, so no execution is needed
    (interpret-executing the depth-16 pipeline takes minutes; tracing
    takes seconds)."""
    W, S = 2, bs.max_sequences_per_poa
    n_seqs = min(3, S)
    seqs = jax.ShapeDtypeStruct((W, S, bs.max_sequence_size), jnp.int32)
    lens = jax.ShapeDtypeStruct((W, S), jnp.int32)
    nseq = jax.ShapeDtypeStruct((W,), jnp.int32)
    del n_seqs
    jax.eval_shape(
        lambda a, b, c, d: poa_pallas2.poa_batch_pallas2(
            a, b, c, d, bs=bs, sc=PoaScores(), msa=msa,
            interpret=True, WPG=WPG),
        seqs, seqs, lens, nseq)


def _product_shapes():
    cfg = CorrectConfig()   # the shipped w128 defaults
    shapes = []
    for depth in (4, 8, 16):
        shapes.append((f"polish-d{depth}", _polish_batch_size(cfg, depth),
                       False))
    # the cli poa sample-window shape family
    shapes.append(("cli-poa", BatchSize(max_sequence_size=128,
                                        max_sequences_per_poa=16), False))
    shapes.append(("cli-poa-msa", BatchSize(max_sequence_size=128,
                                            max_sequences_per_poa=16), True))
    return shapes


@pytest.mark.parametrize("name,bs,msa",
                         _product_shapes(),
                         ids=[s[0] for s in _product_shapes()])
def test_estimate_bounds_every_pallas_call(name, bs, msa, spy_pallas):
    for WPG in (16, 8):
        spy_pallas.clear()
        _drive(bs, msa, WPG)
        assert spy_pallas, "no pallas_call observed (spy not active?)"
        actual = max(c["bytes"] for c in spy_pallas)
        est = poa_pallas2.vmem_bytes_estimate(bs, msa, WPG=WPG)
        assert est >= actual, (
            f"{name} WPG={WPG}: estimator {est} B < structural {actual} B "
            f"— a kernel's planes are unmodeled (round-4 crash class)")


def test_production_dispatch_keeps_lane_kernels_grid1(spy_pallas):
    """The grid==1 single-buffer accounting above is only valid because
    models/poa slices every pallas2 dispatch into 128-window chunks.
    This pins that: a 256-window dispatch through the PRODUCTION program
    must never issue a lane-axis kernel with grid > 1 (at grid 16 the
    add kernel measured 19.50 MiB on chip — the round-5 correct_fenced
    crash).  nwtb (SMEM operands, grid Wp/WPG) and MSA (2-D grid) are
    the known multi-step exceptions."""
    from claragenomicsanalysis_tpu.models.poa import create_batch

    cfg = CorrectConfig()
    bs = _polish_batch_size(cfg, 16)
    batch = create_batch(batch_size=bs, max_poas=256, backend="pallas2")
    program = batch._window_program(False)
    W, S, L = 256, bs.max_sequences_per_poa, bs.max_sequence_size
    jax.eval_shape(
        program,
        jax.ShapeDtypeStruct((W, S, L), jnp.int32),
        jax.ShapeDtypeStruct((W, S, L), jnp.int32),
        jax.ShapeDtypeStruct((W, S), jnp.int32),
        jax.ShapeDtypeStruct((W,), jnp.int32))
    assert spy_pallas, "no pallas_call observed"
    bad = [c for c in spy_pallas
           if math.prod(c["grid"] or (1,)) > 1
           and not c["has_smem_in"]          # nwtb
           and len(c["grid"]) < 2]           # msa
    assert not bad, f"lane-axis kernels dispatched with grid > 1: {bad}"


def test_product_polish_shapes_fit_some_wpg():
    """The shipped correction defaults must route to SOME pallas2 WPG —
    i.e. the fix keeps the product path on the fast backend rather than
    merely routing it away."""
    cfg = CorrectConfig()
    for depth in (4, 8, 16):
        bs = _polish_batch_size(cfg, depth)
        fits = [w for w in (16, 8)
                if poa_pallas2.vmem_bytes_estimate(bs, False, WPG=w)
                <= poa_pallas2.VMEM_BUDGET]
        assert fits, f"depth-{depth} polish bucket no longer fits pallas2"
