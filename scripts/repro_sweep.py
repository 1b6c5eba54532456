import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores  # noqa: E402
from claragenomicsanalysis_tpu.ops.poa_pallas2 import _nwtb_pallas  # noqa: E402

bs = BatchSize(max_sequence_size=128, max_sequences_per_poa=8,
               max_pred_per_node=int(__import__("os").environ.get("RP","4")), max_aligned_per_node=4,
               max_nodes_per_window=256)
sc = PoaScores()
W, N, P, L = 8, bs.padded_nodes, bs.max_pred_per_node, bs.padded_seq
rng = np.random.default_rng(0)
seq = jnp.asarray(rng.integers(0, 4, (W, L)), jnp.int32)
order = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (W, N))
rank = order
npred = jnp.ones((W, N), jnp.int32)
base = jnp.asarray(rng.integers(0, 4, (W, N)), jnp.int32)
nsucc = jnp.ones((W, N), jnp.int32)
pred = (jnp.maximum(jnp.arange(N, dtype=jnp.int32)[None, :, None] - 1, 0)
        * jnp.ones((W, 1, P), jnp.int32))
slen = jnp.full((W,), 100, jnp.int32)
nc = jnp.full((W,), 200, jnp.int32)
alive = jnp.ones((W,), bool)
mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
out = _nwtb_pallas(bs, sc, False, False, 8, seq, order, rank, npred, base,
                   nsucc, pred, slen, nc, alive, True, mode)
print("ok", mode, [np.asarray(o).shape for o in out])
