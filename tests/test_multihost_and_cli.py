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
