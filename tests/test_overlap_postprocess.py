"""Overlap post-processing: kmerize / sequence_similarity /
Overlapper.filter_overlaps / Overlapper.rescue_overlap_ends
(reference: cudamapper_utils.cpp helpers + Overlapper statics [U])."""

import numpy as np

from claragenomicsanalysis_tpu.core.types import Overlap
from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
from claragenomicsanalysis_tpu.models.mapper import (Overlapper, kmerize,
                                                     sequence_similarity)
from claragenomicsanalysis_tpu.utils.genomeutils import (
    generate_random_genome, reverse_complement)


def test_kmerize_counts():
    km = kmerize("ACGTACG", 3)
    assert km["ACG"] == 2 and km["CGT"] == 1 and sum(km.values()) == 5
    assert kmerize("AC", 3) == {}


def test_sequence_similarity_bounds():
    assert sequence_similarity("ACGTACGT", "ACGTACGT", 4) == 1.0
    assert sequence_similarity("AAAAAAA", "CCCCCCC", 4) == 0.0
    s = sequence_similarity("ACGTACGT", "ACGTTCGT", 4)
    assert 0.0 < s < 1.0


def _mk(qs, qe, ts, te, strand="+", n_res=5, q=0, t=1):
    return Overlap(q, t, qs, qe, ts, te, n_res, strand)


def test_filter_overlaps():
    o1 = _mk(0, 100, 0, 100, n_res=10)
    o2 = _mk(0, 10, 0, 10, n_res=10)     # too short
    o3 = _mk(0, 100, 0, 100, n_res=1)    # too few residues
    out = Overlapper.filter_overlaps([o1, o2, o3], min_residues=4,
                                     min_overlap_len=50)
    assert out == [o1]


def test_rescue_forward_extends_matching_flanks():
    rng = np.random.default_rng(0)
    core = generate_random_genome(80, rng)
    flank = generate_random_genome(20, rng)
    q = flank + core + flank            # reads share both flanks exactly
    t = flank + core + flank
    parser = FastaParser("<mem>", records=[FastaSequence("q", q),
                                           FastaSequence("t", t)])
    o = _mk(20, 100, 20, 100, "+")      # overlap = core only
    (r,) = Overlapper.rescue_overlap_ends([o], parser, extension=20,
                                          required_similarity=0.9)
    assert r.query_start_position_in_read == 0
    assert r.target_start_position_in_read == 0
    assert r.query_end_position_in_read == 120
    assert r.target_end_position_in_read == 120


def test_rescue_rejects_dissimilar_flanks():
    rng = np.random.default_rng(1)
    core = generate_random_genome(80, rng)
    q = generate_random_genome(20, rng) + core + generate_random_genome(20, rng)
    t = generate_random_genome(20, rng) + core + generate_random_genome(20, rng)
    parser = FastaParser("<mem>", records=[FastaSequence("q", q),
                                           FastaSequence("t", t)])
    o = _mk(20, 100, 20, 100, "+")
    (r,) = Overlapper.rescue_overlap_ends([o], parser, extension=20,
                                          required_similarity=0.9)
    assert (r.query_start_position_in_read,
            r.query_end_position_in_read) == (20, 100)
    assert (r.target_start_position_in_read,
            r.target_end_position_in_read) == (20, 100)


def test_rescue_reverse_strand_orientation():
    rng = np.random.default_rng(2)
    core = generate_random_genome(80, rng)
    head = generate_random_genome(20, rng)   # query head flank
    tail = generate_random_genome(20, rng)   # query tail flank
    q = head + core + tail
    # target = revcomp(q): query [20,100) core aligns to target [20,100)
    t = reverse_complement(q)
    parser = FastaParser("<mem>", records=[FastaSequence("q", q),
                                           FastaSequence("t", t)])
    o = _mk(20, 100, 20, 100, "-")
    (r,) = Overlapper.rescue_overlap_ends([o], parser, extension=20,
                                          required_similarity=0.9)
    assert (r.query_start_position_in_read,
            r.query_end_position_in_read) == (0, 120)
    assert (r.target_start_position_in_read,
            r.target_end_position_in_read) == (0, 120)


def test_rescue_respects_read_bounds():
    parser = FastaParser("<mem>", records=[
        FastaSequence("q", "ACGTACGTAC"), FastaSequence("t", "ACGTACGTAC")])
    o = _mk(0, 10, 0, 10, "+")           # nothing to extend
    (r,) = Overlapper.rescue_overlap_ends([o], parser)
    assert r == o
