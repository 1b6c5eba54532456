"""Read-correction driver (BASELINE config #5): quality, N-device == 1-device
bit-exactness, and checkpoint/resume."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.config import CorrectConfig, MapperConfig
from claragenomicsanalysis_tpu.cpu import nw_oracle
from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
from claragenomicsanalysis_tpu.models.correct import correct_reads, write_fasta
from claragenomicsanalysis_tpu.simulators.genomesim import PoissonGenomeSimulator
from claragenomicsanalysis_tpu.simulators.readsim import NoisyReadSimulator
from claragenomicsanalysis_tpu.utils.genomeutils import reverse_complement


def _edist(a, b):
    return int(nw_oracle.nw_matrix(a, b)[len(a), len(b)])


@pytest.fixture(scope="module")
def dataset():
    genome = PoissonGenomeSimulator(seed=11).build_reference(800)
    sim = NoisyReadSimulator(seed=11, error_rate=0.04)
    reads = sim.generate_reads(genome, 20, 250)  # ~6x coverage
    parser = FastaParser("<mem>", records=[
        FastaSequence(r.name, r.seq) for r in reads])
    cfg = CorrectConfig(
        mapper=MapperConfig(kmer_size=11, window_size=5, min_overlap_len=50,
                            min_overlap_fraction=0.2,
                            min_bases_per_residue=500),
        window_length=100, max_support=7)
    return genome, reads, parser, cfg


@pytest.fixture(scope="module")
def corrected(dataset):
    _, _, parser, cfg = dataset
    return correct_reads(parser, cfg)


def test_correct_improves_reads(dataset, corrected):
    genome, reads, _, _ = dataset
    before = after = 0
    for r, cor in zip(reads, corrected.seqs):
        true = genome[r.reference_start:r.reference_end]
        if r.strand == "-":
            true = reverse_complement(true)
        before += _edist(r.seq, true)
        after += _edist(cor, true)
    assert corrected.n_windows > 0
    assert corrected.n_polished > 0
    assert after < before, f"correction should reduce errors ({before}->{after})"


def test_correct_mesh_bit_identical(dataset, corrected):
    """8-fake-device mesh output == 1-device output, byte for byte — the
    BASELINE determinism requirement through the user-facing driver."""
    from claragenomicsanalysis_tpu.parallel import make_mesh
    _, _, parser, cfg = dataset
    res8 = correct_reads(parser, cfg, mesh=make_mesh())
    assert res8.seqs == corrected.seqs
    assert (res8.n_windows, res8.n_polished, res8.n_window_failed) == \
        (corrected.n_windows, corrected.n_polished, corrected.n_window_failed)


def test_correct_resume(dataset, corrected, tmp_path):
    """A crash mid-run resumes from checkpoints and yields identical output."""
    _, _, parser, cfg = dataset
    work = str(tmp_path / "work")
    with pytest.raises(RuntimeError, match="injected failure"):
        correct_reads(parser, cfg, work_dir=work, part_size=4,
                      fail_after_parts=1)
    res = correct_reads(parser, cfg, work_dir=work, part_size=4)
    assert res.seqs == corrected.seqs


def test_write_fasta_roundtrip(dataset, corrected, tmp_path):
    _, _, parser, _ = dataset
    out = str(tmp_path / "corrected.fasta")
    write_fasta(corrected, out)
    back = FastaParser(out)
    assert back.get_num_sequences() == len(corrected.seqs)
    assert [back.get_sequence_by_id(i).seq
            for i in range(back.get_num_sequences())] == corrected.seqs


def test_cli_correct(dataset, corrected, tmp_path, capsys):
    from claragenomicsanalysis_tpu.cli import main
    _, reads, _, _ = dataset
    fa = tmp_path / "reads.fasta"
    fa.write_text("".join(f">{r.name}\n{r.seq}\n" for r in reads))
    rc = main(["correct", str(fa), "-k", "11", "-w", "5",
               "--min-overlap-len", "50", "--min-overlap-fraction", "0.2",
               "--min-bases-per-residue", "500",
               "--window-length", "100", "--max-support", "7"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = out.strip().split("\n")
    assert lines[0].startswith(">")
    seqs = [lines[i] for i in range(1, len(lines), 2)]
    assert seqs == corrected.seqs
