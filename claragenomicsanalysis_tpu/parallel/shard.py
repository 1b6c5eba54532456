"""Sharded execution of the three module families over a mesh.

Data-parallel paths annotate the leading batch dim with NamedSharding and
let XLA partition the (already batched) programs — merging is concatenation,
so N-device output == 1-device output bit-for-bit (asserted by tests on the
8-fake-device CPU mesh).

The matcher is the interesting one: the target index is sharded by sorted
representation BLOCKS over the 'rep' axis (contiguous slices of the sorted
element arrays — block boundaries may split a representation run, which is
harmless: each shard emits its part of the cross product and the union is
exactly the full anchor set).  Queries are replicated; per-shard anchors are
all-gathered and chained globally (chaining re-sorts on full keys, so anchor
arrival order cannot change results).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import map_ops, nw_band
from ..utils.mathutils import round_up


def _dp_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(("data",)))


def sharded_banded_nw(q, qlen, t, tlen, band_radius: int, mesh: Mesh):
    """Data-parallel banded NW: batch dim split over 'data'."""
    n_data = mesh.shape["data"]
    B = q.shape[0]
    Bp = round_up(B, n_data)
    pad = Bp - B

    def padb(x, fill):
        return np.concatenate(
            [np.asarray(x),
             np.full((pad,) + np.asarray(x).shape[1:], fill,
                     np.asarray(x).dtype)]) if pad else np.asarray(x)

    sh = _dp_sharding(mesh)
    qd = jax.device_put(padb(q, -1), sh)
    td = jax.device_put(padb(t, -1), sh)
    qld = jax.device_put(padb(qlen, 0), sh)
    tld = jax.device_put(padb(tlen, 0), sh)
    scores, tb = nw_band.banded_nw(qd, qld, td, tld, band_radius)
    return scores[:B], tb[:, :B]


def sharded_poa(program, seqs, weights, lens, n_seqs, mesh: Mesh):
    """Data-parallel POA: window dim split over 'data' via shard_map —
    each device runs `program` (the XLA window program OR a Pallas kernel
    backend from models.poa._window_program) on its local window slice.
    Merging is concatenation, so N-device == 1-device bit-for-bit."""
    n_data = mesh.shape["data"]
    W = seqs.shape[0]
    Wp = round_up(W, n_data)
    pad = Wp - W

    def padw(x, fill):
        x = np.asarray(x)
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)]) if pad else x

    fn = jax.jit(shard_map(
        program, mesh=mesh,
        in_specs=(P(("data",)), P(("data",)), P(("data",)), P(("data",))),
        out_specs=P(("data",)),
        check_vma=False))  # windows are independent; outputs shard cleanly
    out = fn(padw(seqs, -1), padw(weights, 0), padw(lens, 0),
             padw(n_seqs, 0))
    return tuple(np.asarray(o)[:W] for o in out)


@functools.partial(jax.jit, static_argnames=("cap", "skip_self", "mesh"))
def _sharded_match(qidx, tidx, cap: int, skip_self: bool, mesh: Mesh):
    n_rep = mesh.shape["rep"]
    cap_local = cap // n_rep

    def local_match(q_arrays, t_arrays):
        # q replicated, t sharded by sorted-rep blocks (leading dim split)
        anchors, total, overflow = map_ops.match_anchors(
            q_arrays, t_arrays, cap=cap_local, skip_self=skip_self)
        # gather every shard's anchors along a new leading axis
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, "rep", axis=0), anchors)
        total = jax.lax.psum(total, "rep")
        overflow = jax.lax.psum(overflow.astype(jnp.int32), "rep") > 0
        return gathered, total, overflow

    q_spec = {k: P() for k in qidx}
    t_spec = {k: P() if k in ("n_elems", "first_read") else P(("rep",))
              for k in tidx}
    anchors, total, overflow = shard_map(
        local_match, mesh=mesh,
        in_specs=(q_spec, t_spec),
        out_specs=({k: P() for k in ["q_read", "t_read", "q_pos", "t_pos",
                                     "dir", "valid"]}, P(), P()),
        check_vma=False,  # outputs are replicated by construction (all_gather/psum)
    )(qidx, tidx)
    # flatten shard axis back to one anchor list
    anchors = {k: v.reshape(-1) for k, v in anchors.items()}
    return anchors, total, overflow


def sharded_anchors(qidx_arrays: dict, tidx_arrays: dict, cfg, mesh: Mesh,
                    cap: int = 1 << 18):
    """Rep-sharded anchor generation: target index split into sorted-rep
    blocks over the 'rep' axis, anchors all-gathered back.  Returns
    (anchors dict, total, overflow) like ops.map_ops.match_anchors.

    `cap` is the PER-SHARD anchor capacity (shard loads are skewed by the
    rep distribution, so each shard gets the full cap rather than cap/N)."""
    n_rep = mesh.shape["rep"]
    Ct = np.asarray(tidx_arrays["rep"]).shape[0]
    Ctp = round_up(Ct, n_rep)

    tpad = {}
    for k, v in tidx_arrays.items():
        v = np.asarray(v)
        if k in ("n_elems", "first_read"):
            tpad[k] = v
            continue
        fill = np.array(0xFFFFFFFF, v.dtype) if k == "rep" else np.zeros((), v.dtype)
        tpad[k] = np.concatenate([v, np.full(Ctp - Ct, fill, v.dtype)])

    qj = {k: jnp.asarray(np.asarray(v)) for k, v in qidx_arrays.items()}
    tj = {k: jnp.asarray(v) for k, v in tpad.items()}
    return _sharded_match(
        qj, tj, cap=round_up(cap, n_rep) * n_rep,
        skip_self=cfg.skip_self_mappings, mesh=mesh)


def sharded_match_chain(qidx_arrays: dict, tidx_arrays: dict, cfg, mesh: Mesh,
                        cap: int = 1 << 18):
    """Rep-sharded matching + replicated chaining.  Returns the same masked
    overlap dict as ops.map_ops.chain_anchors."""
    from fractions import Fraction
    anchors, total, overflow = sharded_anchors(
        qidx_arrays, tidx_arrays, cfg, mesh, cap=cap // mesh.shape["rep"])

    frac = Fraction(cfg.min_overlap_fraction).limit_denominator(10**6)
    out = map_ops.chain_anchors(
        anchors, k=cfg.kmer_size, min_residues=cfg.min_residues,
        min_overlap_len=cfg.min_overlap_len,
        min_bases_per_residue=cfg.min_bases_per_residue,
        min_overlap_fraction_num=frac.numerator,
        min_overlap_fraction_den=frac.denominator,
        max_gap=cfg.max_anchor_gap)
    return {k: np.asarray(v) for k, v in out.items()}, bool(overflow)
