"""Long k-mers (16 <= k <= 31, hashed two-word representations): device
sketch/index == oracle, end-to-end overlaps == oracle, config validation."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.config import MapperConfig
from claragenomicsanalysis_tpu.cpu import mapper_oracle as oracle
from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
from claragenomicsanalysis_tpu.models.mapper import (Index, Matcher,
                                                     Overlapper,
                                                     map_all_vs_all)
from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                  PoissonGenomeSimulator)


def _parser(seqs):
    return FastaParser("<mem>", records=[
        FastaSequence(f"r{i}", s) for i, s in enumerate(seqs)])


def _sim_reads(rng, n=8, glen=800, rlen=200):
    genome = PoissonGenomeSimulator(seed=11).build_reference(glen)
    sim = NoisyReadSimulator(seed=11, error_rate=0.02)
    return [r.seq for r in sim.generate_reads(genome, n, rlen)]


@pytest.mark.parametrize("k,w", [(16, 5), (21, 11), (31, 10)])
def test_long_k_sketch_matches_oracle(rng, k, w):
    seqs = _sim_reads(rng) + ["ACGT" * 10, "A" * 40, "ACGTNN" + "ACGT" * 9]
    cfg = MapperConfig(kmer_size=k, window_size=w)
    idx = Index.create_index(_parser(seqs), 0, len(seqs), cfg)
    o_idx = oracle.IndexOracle(seqs, 0, cfg)
    np.testing.assert_array_equal(idx.representations(),
                                  o_idx.representations())
    np.testing.assert_array_equal(
        idx.positions_in_reads(),
        [e.position_in_read for e in o_idx.elements])
    np.testing.assert_array_equal(
        idx.directions_of_reads(),
        [e.direction for e in o_idx.elements])


def test_long_k_overlaps_match_oracle(rng):
    seqs = _sim_reads(rng, n=6, glen=600, rlen=250)
    cfg = MapperConfig(kmer_size=19, window_size=5, min_residues=3,
                       min_overlap_len=30, min_overlap_fraction=0.2,
                       min_bases_per_residue=1000)
    res = map_all_vs_all(_parser(seqs), cfg)
    want = oracle.map_all_vs_all(seqs, cfg)
    assert [o.key() for o in res.overlaps] == [o.key() for o in want]


def test_short_k_results_unchanged_by_two_word_packing(rng):
    """k <= 15 hashed reps must be identical to the historical single-word
    rule (murmur32(hi=0) == 0) — pins golden-output stability."""
    from claragenomicsanalysis_tpu.cpu.mapper_oracle import murmur32
    import numpy as np
    c = np.array([0, 1, 12345, 2**30 - 1], np.uint64)
    two_word = murmur32((c & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                        ^ murmur32((c >> np.uint64(32)).astype(np.uint32)))
    one_word = murmur32(c.astype(np.uint32))
    np.testing.assert_array_equal(two_word, one_word)


def test_config_k_bounds():
    MapperConfig(kmer_size=31)                       # hashed: ok
    with pytest.raises(ValueError):
        MapperConfig(kmer_size=32)
    with pytest.raises(ValueError):
        MapperConfig(kmer_size=16, hash_representations=False)
    MapperConfig(kmer_size=15, hash_representations=False)
