"""Substrate tests: encoding, FASTA/PAF/window I/O, simulators, buffer plans."""

import gzip

import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.bufferplan import (plan_aligner_batch,
                                                       plan_poa_batch)
from claragenomicsanalysis_tpu.core.config import (AlignerConfig, BatchSize,
                                                   MapperConfig)
from claragenomicsanalysis_tpu.core.types import Overlap
from claragenomicsanalysis_tpu.io.fasta import create_fasta_parser, write_fasta, FastaSequence
from claragenomicsanalysis_tpu.io.paf import format_paf_row, read_paf, write_paf
from claragenomicsanalysis_tpu.io.windows import read_windows, write_windows
from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                  PoissonGenomeSimulator)
from claragenomicsanalysis_tpu.utils.genomeutils import (decode, encode,
                                                         reverse_complement)
from claragenomicsanalysis_tpu.utils.graph import DirectedGraph


def test_encode_decode_roundtrip():
    s = "ACGTACGTTTGA"
    assert decode(encode(s)) == s
    padded = encode(s, 32)
    assert padded.shape == (32,)
    assert (padded[len(s):] == -1).all()
    assert decode(padded) == s


def test_reverse_complement():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AACG") == "CGTT"


def test_fasta_parser_plain_and_gzip(tmp_path):
    recs = [FastaSequence("r0", "ACGTACGT"), FastaSequence("r1", "GGGG"),
            FastaSequence("r2", "ACGTACGTACGTACGT")]
    p = tmp_path / "reads.fasta"
    write_fasta(recs, str(p))
    parser = create_fasta_parser(p)
    assert parser.get_num_sequences() == 3
    assert parser.get_sequence_by_id(0).seq == "ACGTACGT"
    # min_seq_len filter
    parser = create_fasta_parser(p, min_seq_len=5)
    assert parser.get_num_sequences() == 2
    assert parser.get_sequence_by_id(1).name == "r2"
    # gzip
    gz = tmp_path / "reads.fasta.gz"
    with open(p, "rb") as fin, gzip.open(gz, "wb") as fout:
        fout.write(fin.read())
    parser = create_fasta_parser(gz)
    assert parser.get_num_sequences() == 3


def test_fastq_parser(tmp_path):
    p = tmp_path / "reads.fastq"
    p.write_text("@r0 extra\nACGT\n+\nIIII\n@r1\nGGTT\n+\n!!!!\n")
    parser = create_fasta_parser(p)
    assert parser.get_num_sequences() == 2
    assert parser.get_sequence_by_id(0).name == "r0"
    assert parser.get_sequence_by_id(1).seq == "GGTT"


def test_fasta_chunks(tmp_path):
    recs = [FastaSequence(f"r{i}", "A" * 10) for i in range(10)]
    p = tmp_path / "c.fasta"
    write_fasta(recs, str(p))
    parser = create_fasta_parser(p)
    chunks = parser.get_chunks(25)
    assert chunks == [(0, 2), (2, 4), (4, 6), (6, 8), (8, 10)]
    assert parser.get_chunks(1000) == [(0, 10)]


def test_paf_roundtrip(tmp_path):
    o = Overlap(0, 1, 10, 90, 5, 85, 12, "+")
    row = format_paf_row(o, "q0", 100, "t0", 95)
    assert row.split("\t")[4] == "+"
    path = tmp_path / "out.paf"
    write_paf([row], str(path))
    back = read_paf(str(path))
    assert back[0]["query_name"] == "q0"
    assert back[0]["num_residue_matches"] == 12


def test_windows_roundtrip(tmp_path):
    w = [["ACGT", "ACGA"], ["TTTT"]]
    p = tmp_path / "w.txt"
    write_windows(w, str(p))
    assert read_windows(str(p)) == w


def test_simulators():
    genome = PoissonGenomeSimulator(seed=3).build_reference(500)
    assert len(genome) == 500 and set(genome) <= set("ACGT")
    sim = NoisyReadSimulator(seed=3)
    reads = sim.generate_reads(genome, 5, 100)
    assert len(reads) == 5
    for r in reads:
        assert r.reference_end <= len(genome)
        assert len(r.seq) > 0


def test_buffer_plans():
    plan = plan_aligner_batch(AlignerConfig(512, 512, 1024), 256 << 20)
    assert 1 <= plan.problems_per_batch <= 1024
    assert plan.total_bytes <= 256 << 20 or plan.problems_per_batch == 1
    plan = plan_poa_batch(BatchSize(max_sequence_size=512), 1 << 30)
    assert plan.problems_per_batch >= 1


def test_mapper_config_k_bound():
    MapperConfig(kmer_size=16)            # hashed mode: k up to 31
    with pytest.raises(ValueError):
        MapperConfig(kmer_size=32)
    with pytest.raises(ValueError):
        MapperConfig(kmer_size=16, hash_representations=False)


def test_directed_graph_dot():
    g = DirectedGraph()
    g.add_edge(0, 1, 3)
    g.add_edge(1, 2)
    g.set_node_label(0, "A")
    dot = g.serialize_to_dot()
    assert "0 -> 1" in dot and 'label="3"' in dot
