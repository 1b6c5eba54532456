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

# ---- full routed mapper across the process boundary (parallel/shard.py's
# all_to_all chain path on a 'rep' axis that SPANS processes): every field
# checksum of the sharded global overlap output must equal the plain
# single-device computation each process derives independently.
from claragenomicsanalysis_tpu.core.config import MapperConfig  # noqa: E402
from claragenomicsanalysis_tpu.io.fasta import (FastaParser,  # noqa: E402
                                                FastaSequence)
from claragenomicsanalysis_tpu.models.mapper import Index  # noqa: E402
from claragenomicsanalysis_tpu.ops import map_ops  # noqa: E402
from claragenomicsanalysis_tpu.parallel.shard import (  # noqa: E402
    _chain_kwargs, sharded_match_chain)
from claragenomicsanalysis_tpu.simulators import (  # noqa: E402
    NoisyReadSimulator, PoissonGenomeSimulator)

cfg = MapperConfig(kmer_size=7, window_size=4, min_residues=3,
                   min_overlap_len=30, min_overlap_fraction=0.5,
                   min_bases_per_residue=1000)
genome = PoissonGenomeSimulator(seed=9).build_reference(900)
sim = NoisyReadSimulator(seed=9, error_rate=0.02)
reads = [r.seq for r in sim.generate_reads(genome, 12, 150)]
parser = FastaParser("<mem>", records=[
    FastaSequence(f"r{i}", s) for i, s in enumerate(reads)])
idx = Index.create_index(parser, 0, len(reads), cfg)

mesh4 = make_global_mesh(rep=4)          # rep axis spans both processes
out, overflow = sharded_match_chain(idx._arrays, idx._arrays, cfg, mesh4,
                                    cap=1 << 14)
assert not overflow

FIELDS = list(map_ops.OVERLAP_FIELDS)


def _checks(out):
    """Replicated scalars over the (possibly process-spanning) output."""
    v = out["valid"]
    cnt = int(np.asarray(jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))(v)))
    sums = [int(np.asarray(jax.jit(
        lambda f, m: jnp.sum(jnp.where(m, f, 0) * jnp.where(m, f, 0)
                             + jnp.where(m, f, 0)))(out[f], v)))
        for f in FIELDS]
    return [cnt] + sums


anchors, total, ov = map_ops.match_anchors(
    {k: jnp.asarray(np.asarray(v)) for k, v in idx._arrays.items()},
    {k: jnp.asarray(np.asarray(v)) for k, v in idx._arrays.items()},
    cap=1 << 14, skip_self=cfg.skip_self_mappings)
expected = map_ops.chain_anchors(anchors, pack2=False, **_chain_kwargs(cfg))
got, want = _checks(out), _checks(expected)
assert got == want and got[0] > 0, (got, want)
print(f"proc{pid} OK: routed map across processes, "
      f"{got[0]} overlaps checksum-equal")

# ---- the REAL user driver across processes: map_all_vs_all on the global
# rep mesh must produce, on EVERY host, exactly the overlap list the plain
# single-process driver computes (SURVEY §5.8's host-independent output).
from claragenomicsanalysis_tpu.models.mapper import map_all_vs_all  # noqa: E402

res_mesh = map_all_vs_all(parser, cfg, mesh=mesh4)
res_local = map_all_vs_all(parser, cfg)
got_keys = [o.key() for o in res_mesh.overlaps]
want_keys = [o.key() for o in res_local.overlaps]
assert got_keys == want_keys and got_keys, (len(got_keys), len(want_keys))
print(f"proc{pid} OK: map_all_vs_all across processes, "
      f"{len(got_keys)} overlaps identical on this host")

# ---- the read-correction driver (BASELINE config #5) across processes:
# every host must produce the identical corrected FASTA.
from claragenomicsanalysis_tpu.core.config import CorrectConfig  # noqa: E402
from claragenomicsanalysis_tpu.models.correct import correct_reads  # noqa: E402

ccfg = CorrectConfig(mapper=cfg, window_length=40, max_support=3,
                     min_supports_for_poa=1)
res_c_mesh = correct_reads(parser, ccfg, mesh=make_global_mesh())
res_c_local = correct_reads(parser, ccfg)
assert res_c_mesh.seqs == res_c_local.seqs and all(res_c_mesh.seqs)
print(f"proc{pid} OK: correct_reads across processes, "
      f"{len(res_c_mesh.seqs)} reads identical on this host")

# ---- data-sharded banded NW across processes (the remaining sharded path)
from claragenomicsanalysis_tpu.parallel.shard import sharded_banded_nw  # noqa: E402
from claragenomicsanalysis_tpu.ops import nw_band  # noqa: E402
from claragenomicsanalysis_tpu.utils.genomeutils import (  # noqa: E402
    encode, generate_random_genome, mutate_sequence)

rng = np.random.default_rng(5)
qs, ts = [], []
for _ in range(8):
    a = generate_random_genome(56, rng)
    qs.append(a)
    ts.append(mutate_sequence(a, 5, rng)[:56])
q = np.stack([encode(a, 64) for a in qs])
t = np.stack([encode(b, 64) for b in ts])
qlen = np.array([len(a) for a in qs], np.int32)
tlen = np.array([len(b) for b in ts], np.int32)
s_mesh, _ = sharded_banded_nw(q, qlen, t, tlen, 16, make_global_mesh())
s_loc, _ = nw_band.banded_nw(q, qlen, t, tlen, 16)
assert np.array_equal(np.asarray(s_mesh), np.asarray(s_loc))
print(f"proc{pid} OK: sharded banded NW across processes, scores equal")

# ---- SHARDED output path (SURVEY §5.8): each host writes part files for
# ONLY its rep shards; the deterministic merge equals the replicated path
# byte-for-byte.  The shared dir comes from the spawning test via env.
import tempfile  # noqa: E402

from claragenomicsanalysis_tpu.models.mapper import (  # noqa: E402
    overlaps_to_paf)
from claragenomicsanalysis_tpu.parallel import (  # noqa: E402
    map_all_vs_all_sharded, write_merged_paf)

shard_dir = os.environ.get("MH_SHARD_DIR") or os.path.join(
    tempfile.gettempdir(), f"mh_shards_{port}")
os.makedirs(shard_dir, exist_ok=True)

written, n_pairs = map_all_vs_all_sharded(parser, cfg, shard_dir, mesh4)
# rep=4 over 2 procs x 2 devices: this host owns exactly 2 of 4 shards
own = sorted(int(p.rsplit("_r", 1)[1][:3]) for p in written)
assert own == ([0, 1] if pid == 0 else [2, 3]), (pid, own)

from jax.experimental import multihost_utils  # noqa: E402
multihost_utils.sync_global_devices("sharded_parts_written")

merged_paf = os.path.join(shard_dir, f"merged_{pid}.paf")
n_merged = write_merged_paf(parser, shard_dir, merged_paf)
want_paf = "".join(line + "\n"
                   for line in overlaps_to_paf(res_local.overlaps, parser))
with open(merged_paf) as f:
    assert f.read() == want_paf
assert n_merged == len(res_local.overlaps) > 0
print(f"proc{pid} OK: sharded output — wrote shards {own} only, "
      f"merged PAF ({n_merged} rows) == replicated path byte-for-byte")
