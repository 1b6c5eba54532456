"""On-chip ablation of the mapper's chain-sort stage (the biggest device
stage at 100 Mbp scale: ~0.7 s/pair on the 2-operand uint32 lax.sort).

Questions this answers before any Pallas-sort investment (docs/DESIGN.md §6):
  1. what does lax.sort actually cost vs n and operand count on a v5e?
  2. is a stable 1-key sort cheaper than the unstable 2-key sort?
  3. what would one counting-sort pass cost (random-access gather at n)?
  4. does a segmented (vmapped) sort of 16 slices beat one big sort enough
     to pay for a merge stage?

All data is generated ON DEVICE from a scalar seed (tunnel moves ~20 MB/s;
shipping 512 MB of keys would swamp the measurement); generation cost is
measured alone and subtracted.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from claragenomicsanalysis_tpu.bench.harness import time_scanned


def _keys(seed, n):
    k = jax.random.key(seed)
    ka, kb = jax.random.split(k)
    k1 = jax.random.bits(ka, (n,), jnp.uint32)
    k2 = jax.random.bits(kb, (n,), jnp.uint32)
    return k1, k2


def _checksum(*arrs):
    return sum(jnp.sum(a.astype(jnp.int32)) for a in arrs)


def variants(n):
    def gen_only(seed):
        return _checksum(*_keys(seed, n))

    def sort2(seed):
        k1, k2 = _keys(seed, n)
        s1, s2 = jax.lax.sort((k1, k2), num_keys=2, is_stable=False)
        return _checksum(s1[::1024], s2[::1024])

    def sort1_stable_carry(seed):
        k1, k2 = _keys(seed, n)
        s1, s2 = jax.lax.sort((k1, k2), num_keys=1, is_stable=True)
        return _checksum(s1[::1024], s2[::1024])

    def sort1_unstable(seed):
        k1, _ = _keys(seed, n)
        (s1,) = jax.lax.sort((k1,), num_keys=1, is_stable=False)
        return _checksum(s1[::1024])

    def gather_random(seed):
        k1, k2 = _keys(seed, n)
        idx = (k2 % n).astype(jnp.int32)
        return _checksum(k1[idx][::1024])

    def seg16_sort2(seed):
        k1, k2 = _keys(seed, n)
        a = k1.reshape(16, n // 16)
        b = k2.reshape(16, n // 16)
        s1, s2 = jax.vmap(lambda x, y: jax.lax.sort(
            (x, y), num_keys=2, is_stable=False))(a, b)
        return _checksum(s1[:, ::1024], s2[:, ::1024])

    # (the Pallas bitonic variants were RETIRED after the round-4 A/B:
    # 0.55-0.57x sort2_unstable at every size — see ops/map_ops._sort_pairs)
    return [("gen_only", gen_only), ("sort2_unstable", sort2),
            ("sort1_stable+carry", sort1_stable_carry),
            ("sort1_unstable", sort1_unstable),
            ("gather_random", gather_random),
            ("seg16_sort2", seg16_sort2)]


def main():
    print(f"devices: {jax.devices()}")
    for logn in (22, 24, 26):
        n = 1 << logn
        base = None
        for name, fn in variants(n):
            ds = [(jnp.int32(7 + i),) for i in range(2)]
            try:
                t = time_scanned(fn, ds, repeats=3, loops=1)
            except Exception as e:  # a Mosaic rejection must not kill the rest
                print(f"n=2^{logn} {name:20s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            if name == "gen_only":
                base = t
                extra = ""
            else:
                net = max(t - base, 1e-9)
                extra = f"  net {net*1e3:8.1f} ms  {n/net/1e6:8.1f} Melem/s"
            print(f"n=2^{logn} {name:20s} {t*1e3:8.1f} ms{extra}",
                  flush=True)


if __name__ == "__main__":
    main()
