"""Isolate the topsort kernel's per-pass cost vs pass count at the pileup
shape: time it on (a) the fresh init state (chain graph -> converges in one
sweep) and (b) the evolved end-of-batch state (deep pileup graph)."""

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
    _topsort_pallas, poa_batch_pallas2)
from claragenomicsanalysis_tpu.utils.genomeutils import (  # noqa: E402
    encode, generate_random_genome, mutate_sequence)

bs = BatchSize(max_sequence_size=256, max_sequences_per_poa=16,
               max_pred_per_node=16, max_aligned_per_node=8,
               max_nodes_per_window=512)
sc = PoaScores()
N, S, W = bs.padded_nodes, bs.max_sequences_per_poa, 128
rng = np.random.default_rng(0)
blen = 250

seqs = np.full((W, S, bs.padded_seq), -1, np.int32)
weights = np.zeros((W, S, bs.padded_seq), np.int32)
lens = np.zeros((W, S), np.int32)
for wi in range(W):
    base = generate_random_genome(blen, rng)
    for si in range(S):
        s = mutate_sequence(base, blen // 8, rng)[:bs.max_sequence_size]
        seqs[wi, si, : len(s)] = encode(s)
        weights[wi, si, : len(s)] = 1
        lens[wi, si] = len(s)
seqs, weights, lens = map(jnp.asarray, (seqs, weights, lens))


@jax.jit
def fresh(seqs, weights, lens):
    state = jax.vmap(lambda s0, w0, l0: poa_ops.init_state(
        bs, s0, w0, l0))(seqs[:, 0], weights[:, 0], lens[:, 0])
    level = jnp.where(jnp.arange(N)[None, :] < lens[:, :1],
                      jnp.arange(N, dtype=jnp.int32)[None, :], 0)
    return state, level


@jax.jit
def evolved(seqs, weights, lens):
    state, level = fresh(seqs, weights, lens)

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
        return (state, new_level), ()

    (state, level), _ = jax.lax.scan(
        step, (state, level),
        (jnp.swapaxes(seqs[:, 1:], 0, 1), jnp.swapaxes(weights[:, 1:], 0, 1),
         jnp.swapaxes(lens[:, 1:], 0, 1)))
    return state, level


for name, builder in (("fresh", fresh), ("evolved", evolved)):
    st, lv = builder(seqs, weights, lens)
    leaves, treedef = jax.tree_util.tree_flatten((st, lv))
    ds = [tuple(np.asarray(x) for x in leaves)] * 2

    def fn(*ls, treedef=treedef):
        st, lv = jax.tree_util.tree_unflatten(treedef, ls)
        return _topsort_pallas(bs, False, st, lv)[0]

    dt = time_scanned(fn, ds, loops=2)
    print(json.dumps({"state": name, "topsort_ms": round(dt * 1e3, 3)}),
          flush=True)
