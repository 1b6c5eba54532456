"""Sweep the Myers kernel's column-unroll factor on the real chip.

The U>1 variants hoist each word's Pv/Mv load+store and its four Peq loads
out of a U-column inner loop (ops/myers_pallas.py _kernel) — pure memory-
issue-slot diet, bit-identical outputs.  The predicted ceiling moves from
27/31 = 0.87x (U=1) toward 27/29 = 0.93x+ if the Mosaic scheduler was in
fact bound by those slots; a regression means register spills.  Run on
chip-day; feed the winner back into myers_bottom_row_pallas's default and
bench.py.

Usage: python scripts/ablate_myers_unroll.py [B Lq Lt loops]
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from claragenomicsanalysis_tpu.bench.harness import time_scanned  # noqa: E402
from claragenomicsanalysis_tpu.ops.myers_pallas import (  # noqa: E402
    myers_bottom_row_pallas)
from claragenomicsanalysis_tpu.utils.genomeutils import (  # noqa: E402
    encode, generate_random_genome, mutate_sequence)


def main() -> int:
    args = [int(a) for a in sys.argv[1:]]
    B, Lq, Lt, loops = (args + [1024, 512, 512, 384][len(args):])[:4]
    K = 8
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

    results = {}
    for unroll in (1, 2, 4, 8):
        fn = (lambda u: lambda q, ql, t, tl:
              myers_bottom_row_pallas(q, ql, t, tl, unroll=u)[1])(unroll)
        dt = time_scanned(fn, datasets, loops=loops)
        gcells = B * Lq * Lt / dt / 1e9
        results[unroll] = round(gcells, 1)
        print(json.dumps({"unroll": unroll, "Gcells/s": results[unroll]}),
              flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"best_unroll": best, "Gcells/s": results[best],
                      "vs_u1": round(results[best] / results[1], 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
