"""Standalone per-phase POA timing on the real TPU.

Builds a realistic end-of-batch graph state (full 128x8x100bp batch run
through the XLA program), then times each phase in isolation with the
harness's scanned-dispatch rules.  Motivates where v2 kernelization
effort should go (see docs/POA_V2.md).
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from claragenomicsanalysis_tpu.bench.harness import time_scanned  # noqa: E402
from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores  # noqa: E402
from claragenomicsanalysis_tpu.ops import poa_ops  # noqa: E402
from claragenomicsanalysis_tpu.ops.poa_pallas2 import (  # noqa: E402
    _add_pallas, _consensus_pallas, _msa_pallas, _nwtb_pallas,
    _topsort_pallas)
from claragenomicsanalysis_tpu.core.status import StatusType  # noqa: E402
from claragenomicsanalysis_tpu.utils.genomeutils import (  # noqa: E402
    encode, generate_random_genome, mutate_sequence)


def make_batch(rng, bs, blen):
    W, S, L = 128, bs.max_sequences_per_poa, bs.padded_seq
    seqs = np.full((W, S, L), -1, np.int32)
    weights = np.zeros((W, S, L), np.int32)
    lens = np.zeros((W, S), np.int32)
    for wi in range(W):
        base = generate_random_genome(blen, rng)
        for si in range(S):
            s = mutate_sequence(base, max(5, blen // 20),
                                rng)[:bs.max_sequence_size]
            seqs[wi, si, : len(s)] = encode(s)
            weights[wi, si, : len(s)] = 1
            lens[wi, si] = len(s)
    return seqs, weights, lens, np.full(W, S, np.int32)


def main():
    if "--pileup" in sys.argv:
        bs = BatchSize(max_sequence_size=256, max_sequences_per_poa=16,
                       max_pred_per_node=16, max_aligned_per_node=8,
                       max_nodes_per_window=512)
        blen = 250
    else:
        bs = BatchSize(max_sequence_size=128, max_sequences_per_poa=8,
                       max_pred_per_node=4, max_aligned_per_node=4,
                       max_nodes_per_window=256)
        blen = 100
    sc = PoaScores()
    N = bs.padded_nodes
    S = bs.max_sequences_per_poa
    rng = np.random.default_rng(0)
    K = 4

    # Build end-of-batch states on device (host oracle would be too slow):
    # run the XLA scan once per dataset, capture (state, level).
    @jax.jit
    def build_state(seqs, weights, lens):
        state = jax.vmap(lambda s0, w0, l0: poa_ops.init_state(
            bs, s0, w0, l0))(seqs[:, 0], weights[:, 0], lens[:, 0])
        level = jnp.where(jnp.arange(N)[None, :] < lens[:, :1],
                          jnp.arange(N, dtype=jnp.int32)[None, :], 0)

        def step(carry, x):
            state, level = carry
            seq, w, slen = x
            new_level, order, rank, _ = jax.vmap(
                lambda st, lv: poa_ops.topsort(st, lv, N + 2))(state, level)
            Smat = jax.vmap(lambda st, o, r, sq, sl: poa_ops.graph_nw(
                st, o, r, sq, sl, sc))(state, order, rank, seq, slen)
            pn, pp, k0, _ = jax.vmap(
                lambda st, o, r, sm, sq, sl: poa_ops.nw_traceback(
                    st, o, r, sm, sq, sl, sc, N + bs.padded_seq))(
                state, order, rank, Smat, seq, slen)
            state = jax.vmap(
                lambda st, a, b_, sq, ww, k: poa_ops.add_alignment(
                    st, a, b_, sq, ww, jnp.int32(1), bs, path_start=k))(
                state, pn, pp, seq, w, k0)
            return (state, new_level), (pn, pp, k0)

        (state, level), (pns, pps, k0s) = jax.lax.scan(
            step, (state, level),
            (jnp.swapaxes(seqs[:, 1:], 0, 1),
             jnp.swapaxes(weights[:, 1:], 0, 1),
             jnp.swapaxes(lens[:, 1:], 0, 1)))
        return state, level, pns[-1], pps[-1], k0s[-1]

    datasets = []
    treedef = None
    for _ in range(K):
        seqs, weights, lens, n_seqs = make_batch(rng, bs, blen)
        seqs, weights, lens = (jnp.asarray(seqs), jnp.asarray(weights),
                               jnp.asarray(lens))
        state, level, pn, pp, k0 = build_state(seqs, weights, lens)
        leaves, treedef = jax.tree_util.tree_flatten(
            (seqs, weights, lens, state, level, pn, pp, k0))
        datasets.append(tuple(np.asarray(l) for l in leaves))
    print("states built", flush=True)

    def unflat(fn):
        def wrapped(*leaves):
            sq, w, ln, st, lv, pn, pp, k0 = jax.tree_util.tree_unflatten(
                treedef, leaves)
            return fn(sq, w, ln, st, lv, pn, pp, k0)
        return wrapped

    MC = bs.max_consensus_size
    phases = {
        "topsort": lambda sq, w, ln, st, lv, pn, pp, k0: jax.vmap(
            lambda s_, l_: poa_ops.topsort(s_, l_, N + 2))(st, lv)[0],
        "argsort_only": lambda sq, w, ln, st, lv, pn, pp, k0: jnp.argsort(
            lv * N + jnp.arange(N)[None, :], axis=-1),
        "graph_nw_xla": lambda sq, w, ln, st, lv, pn, pp, k0: jax.vmap(
            lambda s_, o, r, q, sl: poa_ops.graph_nw(s_, o, r, q, sl, sc))(
            st, *_ranks(st, lv, N), sq[:, -1], ln[:, -1]),
        "nwtb_xla": lambda sq, w, ln, st, lv, pn, pp, k0: _nwtb_xla(
            st, lv, sq[:, -1], ln[:, -1]),
        "nwtb_pallas": lambda sq, w, ln, st, lv, pn, pp, k0: _nwtb_p(
            st, lv, sq[:, -1], ln[:, -1]),
        "add_xla": lambda sq, w, ln, st, lv, pn, pp, k0: jax.vmap(
            lambda s_, a, b_, q, ww, k: poa_ops.add_alignment(
                s_, a, b_, q, ww, jnp.int32(7), bs, path_start=k))(
            st, pn, pp, sq[:, -1], w[:, -1], k0).node_count,
        "add_pallas": lambda sq, w, ln, st, lv, pn, pp, k0: _add_pallas(
            bs, False, False, st, pn, pp, sq[:, -1], w[:, -1], k0,
            jnp.ones((sq.shape[0],), jnp.bool_))["node_count"],
        "consensus": lambda sq, w, ln, st, lv, pn, pp, k0: jax.vmap(
            lambda s_, o, r: poa_ops.consensus(s_, o, r, MC)[0])(
            st, *_ranks(st, lv, N)),
        "topsort_pallas": lambda sq, w, ln, st, lv, pn, pp, k0:
            _topsort_pallas(bs, False, st, lv)[0],
        "consensus_pallas": lambda sq, w, ln, st, lv, pn, pp, k0:
            _consensus_pallas(bs, False, st, _ranks(st, lv, N)[1])[0],
        "msa_xla": lambda sq, w, ln, st, lv, pn, pp, k0: jax.vmap(
            poa_ops.msa_columns)(st, *_ranks(st, lv, N))[0],
        "msa_pallas": lambda sq, w, ln, st, lv, pn, pp, k0:
            _msa_pallas(bs, False, st, _ranks(st, lv, N)[0])[0],
    }

    def _ranks(st, lv, N):
        key = jnp.where(jnp.arange(N)[None, :] < st.node_count[:, None],
                        lv * N + jnp.arange(N)[None, :],
                        jnp.int32(2**30) + jnp.arange(N)[None, :])
        order = jnp.argsort(key, axis=-1).astype(jnp.int32)
        rank = jnp.zeros_like(order).at[
            jnp.arange(order.shape[0])[:, None], order].set(
            jnp.arange(N, dtype=jnp.int32)[None, :])
        return order, rank

    def _nwtb_xla(st, lv, seq, slen):
        o, r = _ranks(st, lv, N)
        Smat = jax.vmap(lambda s_, oo, rr, q, sl: poa_ops.graph_nw(
            s_, oo, rr, q, sl, sc))(st, o, r, seq, slen)
        return jax.vmap(lambda s_, oo, rr, sm, q, sl: poa_ops.nw_traceback(
            s_, oo, rr, sm, q, sl, sc, N + bs.padded_seq)[0])(
            st, o, r, Smat, seq, slen)

    def _nwtb_p(st, lv, seq, slen):
        o, r = _ranks(st, lv, N)
        return _nwtb_pallas(
            bs, sc, False, False, 8, seq, o, r, st.npred, st.base,
            st.nsucc, st.pred, slen, st.node_count,
            jnp.ones((seq.shape[0],), jnp.bool_))[0]

    for name, fn in phases.items():
        for attempt in range(3):
            try:
                dt = time_scanned(unflat(fn), datasets, loops=2)
                print(json.dumps({"phase": name, "ms": round(dt * 1e3, 3)}),
                      flush=True)
                break
            except Exception as e:  # noqa: BLE001
                # classify: a compile-helper 500 / tunnel drop proves
                # nothing about the kernel (retry); a Mosaic/VMEM error is
                # deterministic (record the FULL text — the r5 queue's
                # truncated 200-char error was unclassifiable)
                msg = str(e)
                low = msg.lower()
                infra = (any(k in low for k in
                             ("http", "unavailable", "deadline",
                              "connection", "tpu_compile_helper", "socket",
                              "internal:"))
                         and "mosaic" not in low and "vmem" not in low)
                kind = "infra-retry" if infra and attempt < 2 else (
                    "infra-gave-up" if infra else "error")
                print(json.dumps({"phase": name, kind: msg[:2000]}),
                      flush=True)
                if not infra:
                    break
                import time as _t
                _t.sleep(30 * (attempt + 1))


if __name__ == "__main__":
    main()
