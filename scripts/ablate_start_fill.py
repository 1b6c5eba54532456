"""On-chip A/B: chain-start value lookup via random gather vs the
two-level-cummax forward-fill (_start_fill16) inside the REAL pack2 chain
program, at mapper-scale anchor counts.

The round-3 sort ablate measured random gathers at 69-151 Melem/s vs
371-1152 for streaming sorts, indicting the two C-sized start-value
gathers as the chain stage's hidden wall.  This times chain_anchors
end-to-end (sort + scan + fills) with fill16 forced ON and OFF, so the
delta is exactly the lookup strategy.

Usage: python scripts/ablate_start_fill.py
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax             # noqa: E402
import jax.numpy as jnp  # noqa: E402


def synth_anchors(C, rng):
    """Clustered anchors shaped like a real pair batch (15/16-bit ranges)."""
    qr = rng.integers(0, 1 << 15, C, dtype=np.int32)
    tr = rng.integers(0, 1 << 15, C, dtype=np.int32)
    qp = rng.integers(0, 1 << 16, C, dtype=np.int32)
    tp = rng.integers(0, 1 << 16, C, dtype=np.int32)
    d = rng.integers(0, 2, C, dtype=np.int32)
    # make runs of 16 share (q,t,dir) with increasing positions so chains form
    for name, arr in (("q", qr), ("t", tr), ("d", d)):
        arr.reshape(-1, 16)[:] = arr.reshape(-1, 16)[:, :1]
    qp.reshape(-1, 16)[:] = (qp.reshape(-1, 16)[:, :1] % ((1 << 16) - 256)
                             + np.arange(16, dtype=np.int32) * 7)
    tp.reshape(-1, 16)[:] = (tp.reshape(-1, 16)[:, :1] % ((1 << 16) - 256)
                             + np.arange(16, dtype=np.int32) * 7)
    return {"q_read": qr, "t_read": tr, "q_pos": qp, "t_pos": tp, "dir": d,
            "valid": rng.random(C) < 0.95}


def main():
    from claragenomicsanalysis_tpu.ops import map_ops

    print(f"devices: {jax.devices()}", flush=True)
    kw = dict(k=15, min_residues=3, min_overlap_len=50,
              min_bases_per_residue=500, min_overlap_fraction_num=3,
              min_overlap_fraction_den=10, max_gap=500)

    # wrap _chain_anchors_packed's fill16 default via a jit'd closure pair
    @functools.partial(jax.jit, static_argnames=("fill",))
    def run(anchors, salt, fill):
        a = dict(anchors)
        a["q_pos"] = a["q_pos"] ^ (salt & 1)   # distinct bytes per repeat
        out = map_ops._chain_anchors_packed(
            a, **kw) if fill else None
        if not fill:
            # re-derive the packed path with gathers by calling the scan
            # directly: replicate _chain_anchors_packed with fill16=False
            out = _packed_nofill(a, **kw)
        return out["valid"].sum(), out["q_start"].sum(), out["t_start"].sum()

    def _packed_nofill(anchors, k, min_residues, min_overlap_len,
                       min_bases_per_residue, min_overlap_fraction_num,
                       min_overlap_fraction_den, max_gap):
        # copy of map_ops._chain_anchors_packed with fill16=False
        UMAX = jnp.uint32(0xFFFFFFFF)
        v = anchors["valid"]
        qid32 = anchors["q_read"].astype(jnp.uint32)
        tid32 = anchors["t_read"].astype(jnp.uint32)
        d32 = anchors["dir"].astype(jnp.uint32)
        tp32 = anchors["t_pos"].astype(jnp.uint32)
        key1 = jnp.where(v, (qid32 << 16) | (tid32 << 1) | d32, UMAX)
        st16 = jnp.where(anchors["dir"] == 1, jnp.uint32(0xFFFF) - tp32, tp32)
        key2 = jnp.where(v, (anchors["q_pos"].astype(jnp.uint32) << 16)
                         | st16, UMAX)
        key1, key2 = map_ops._sort_pairs(key1, key2)
        v = key1 != UMAX
        k1 = key1.astype(jnp.int32)
        d = jnp.where(v, k1 & 1, map_ops.I32MAX)
        qid = jnp.where(v, k1 >> 16, map_ops.I32MAX)
        tid = jnp.where(v, (k1 >> 1) & 0x7FFF, map_ops.I32MAX)
        k2 = key2.astype(jnp.int32)
        qp = jnp.where(v, (k2 >> 16) & 0xFFFF, map_ops.I32MAX)
        st = jnp.where(v, k2 & 0xFFFF, map_ops.I32MAX)
        tp = jnp.where(d == 1, 0xFFFF - st, st)
        idx = jnp.arange(k1.shape[0], dtype=jnp.int32)
        prev = lambda x: jnp.concatenate([x[:1], x[:-1]])  # noqa: E731
        same = (key1 == prev(key1)) & (idx > 0)
        return map_ops._chain_scan(
            same, qid, tid, d, qp, st, tp, v, k, min_residues,
            min_overlap_len, min_bases_per_residue,
            min_overlap_fraction_num, min_overlap_fraction_den, max_gap,
            fill16=False)

    rng = np.random.default_rng(0)
    sizes = tuple(int(x) for x in sys.argv[1:]) or (22, 24, 26)
    for logC in sizes:
        C = 1 << logC
        anchors = {k_: jnp.asarray(v_) for k_, v_ in
                   synth_anchors(C, rng).items()}
        # preflight: identical outputs
        ga = run(anchors, jnp.int32(0), False)
        fi = run(anchors, jnp.int32(0), True)
        eq = all(int(a) == int(b) for a, b in zip(ga, fi))
        print(json.dumps({"n": f"2^{logC}", "outputs_equal": eq}), flush=True)
        for fill in (False, True):
            run(anchors, jnp.int32(1), fill)   # warm
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                r = run(anchors, jnp.int32(rep + 2), fill)
                _ = [np.asarray(x) for x in r]
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "n": f"2^{logC}", "fill16": fill, "ms": round(best * 1e3, 1),
                "Melem_s": round(C / best / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
