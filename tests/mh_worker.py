"""Worker for the 2-process jax.distributed smoke test (spawned by
tests/test_multihost_distributed.py).  Must initialize the process group
before anything touches the XLA backend."""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", nproc, pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from claragenomicsanalysis_tpu.parallel.multihost import (  # noqa: E402
    make_global_mesh, process_count, process_index)

assert process_count() == nproc, process_count()
assert process_index() == pid

# 2 processes x 2 fake devices: ('data', 'rep') = (2, 2); the rep axis spans
# processes here, so the all-gather below really crosses the process
# boundary (Gloo), exercising the collective pattern parallel/shard.py uses.
mesh = make_global_mesh(rep=2)
assert dict(mesh.shape) == {"data": 2, "rep": 2, "sp": 1}

# global (8,) array, data-sharded: each process contributes its local half
sh = NamedSharding(mesh, P(("data",)))
local = np.arange(4.0) + 4.0 * pid
garr = jax.make_array_from_process_local_data(sh, local, global_shape=(8,))

# psum over 'data' + all_gather over 'rep' (the shard.py collective pair)
def local_fn(x):
    s = jax.lax.psum(jnp.sum(x), "data")
    g = jax.lax.all_gather(s[None], "rep", axis=0)
    return g

out = jax.jit(shard_map(local_fn, mesh=mesh, in_specs=P(("data",)),
                        out_specs=P(), check_vma=False))(garr)
got = np.asarray(out.addressable_data(0)).reshape(-1)
assert got.shape == (2,) and (got == 28.0).all(), got
print(f"proc{pid} OK: global reduction {got.tolist()}")
