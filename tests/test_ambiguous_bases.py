"""Ambiguous-base (N) semantics across the whole engine.

Spec (utils/genomeutils.py docstring): any non-ACGT input base encodes to -1
and NEVER matches anything — not even another unknown.  decode() renders
internal negatives as 'N' (only the trailing run is padding).  The mapper
excludes k-mers containing an unknown from sketching.  POA keeps N nodes
positionally in the consensus ('N'); MSA rows render them as '-' (the device
arrays use -1 for both gap and unknown — a documented conflation).

The reference operates on raw char sequences, so its N handling is implicit;
this file pins OUR canonical rule device-vs-oracle so all backends agree.
"""

import numpy as np

from claragenomicsanalysis_tpu.core.config import BatchSize, MapperConfig
from claragenomicsanalysis_tpu.core.status import OutputType, StatusType
from claragenomicsanalysis_tpu.cpu import mapper_oracle as moracle
from claragenomicsanalysis_tpu.cpu import nw_oracle as nw
from claragenomicsanalysis_tpu.cpu.poa_oracle import poa as oracle_poa
from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
from claragenomicsanalysis_tpu.models import create_aligner
from claragenomicsanalysis_tpu.models.mapper import map_all_vs_all
from claragenomicsanalysis_tpu.models.poa import create_batch
from claragenomicsanalysis_tpu.utils.genomeutils import (decode, encode,
                                                         generate_random_genome,
                                                         mutate_sequence,
                                                         reverse_complement)


def _sprinkle_n(seq, rng, frac=0.05):
    s = list(seq)
    for i in range(len(s)):
        if rng.random() < frac:
            s[i] = "N"
    return "".join(s)


def test_encode_decode_roundtrip_with_n():
    assert decode(encode("ACNGT")) == "ACNGT"
    assert decode(encode("ACNGT", 8)) == "ACNGT"        # trailing pad trimmed
    assert decode(encode("ACNGT", 8), length=5) == "ACNGT"
    assert decode(encode("NNACG")) == "NNACG"           # leading N kept
    assert decode(np.full(4, -1, np.int8)) == ""        # all padding
    assert encode("acgtn").tolist() == [0, 1, 2, 3, -1]
    assert reverse_complement("AAN") == "NTT"   # N complements to N


def test_unknown_never_matches_in_oracle():
    # N vs N is a mismatch, not a match
    path, dist, _ = nw.align("N", "N", band_radius=4)
    assert dist == 1
    path, dist, _ = nw.align("ANA", "ANA", band_radius=4)
    assert dist == 1
    assert nw.path_to_cigar(path, extended=True).count("X") == 1


def test_aligner_algorithms_agree_on_n(rng):
    """ukkonen / myers / hirschberg all treat N identically to the oracle."""
    pairs = []
    for _ in range(8):
        a = generate_random_genome(int(rng.integers(20, 120)), rng)
        b = mutate_sequence(a, int(rng.integers(0, 8)), rng)
        pairs.append((_sprinkle_n(a, rng), _sprinkle_n(b, rng)))
    for algo in ("ukkonen", "myers", "hirschberg-myers"):
        aligner = create_aligner(128, 128, 8, band_radius=32, algorithm=algo)
        for a, b in pairs:
            assert aligner.add_alignment(a, b) == StatusType.SUCCESS
        for res, (a, b) in zip(aligner.get_alignments(), pairs):
            o_path, o_dist, _ = nw.align(a, b, band_radius=32)
            assert res.status == StatusType.SUCCESS
            assert res.edit_distance == o_dist, (algo, a, b)
            if algo == "ukkonen":  # canonical-path backend
                assert res.convert_to_cigar() == nw.path_to_cigar(o_path)


def test_poa_consensus_keeps_n(rng):
    base = generate_random_genome(40, rng)
    windows = [
        ["ACGNACGT", "ACGNACGT", "ACGNACGT"],       # shared N -> consensus N
        [_sprinkle_n(mutate_sequence(base, 2, rng), rng, 0.1)
         for _ in range(4)],
    ]
    bs = BatchSize(max_sequence_size=64, max_sequences_per_poa=6,
                   max_pred_per_node=8, max_aligned_per_node=4)
    batch = create_batch(batch_size=bs,
                         output_mask=OutputType.CONSENSUS | OutputType.MSA)
    for w in windows:
        batch.add_poa_group(w)
    cons, covs, stats = batch.get_consensus()
    msas, _ = batch.get_msa()
    for i, w in enumerate(windows):
        o_c, o_cov, o_msa, o_st = oracle_poa(w, batch_size=bs, output_msa=True)
        assert stats[i] == StatusType(o_st)
        assert cons[i] == o_c, (i, cons[i], o_c)
        assert covs[i] == o_cov
        assert msas[i] == o_msa
    # every input N is an unknown node: the identical windows keep it
    assert "N" in cons[0]


def test_mapper_excludes_n_kmers(rng):
    cfg = MapperConfig(kmer_size=7, window_size=4, min_residues=3,
                       min_overlap_len=30, min_overlap_fraction=0.5,
                       min_bases_per_residue=1000)
    genome = generate_random_genome(600, rng)
    reads = [genome[i:i + 200] for i in (0, 100, 200, 300)]
    reads += [reverse_complement(reads[1])]
    reads = [_sprinkle_n(r, rng, 0.03) for r in reads]
    parser = FastaParser("<mem>", records=[
        FastaSequence(f"r{i}", s) for i, s in enumerate(reads)])
    result = map_all_vs_all(parser, cfg)
    o_over = moracle.map_all_vs_all(reads, cfg)
    got = [(o.query_read_id, o.target_read_id, o.relative_strand,
            o.query_start_position_in_read, o.query_end_position_in_read,
            o.target_start_position_in_read, o.target_end_position_in_read,
            o.num_residues) for o in result.overlaps]
    want = [(o.query_read_id, o.target_read_id, o.relative_strand,
             o.query_start_position_in_read, o.query_end_position_in_read,
             o.target_start_position_in_read, o.target_end_position_in_read,
             o.num_residues) for o in o_over]
    assert got == want
    assert len(got) > 0
