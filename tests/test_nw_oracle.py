"""NW oracle self-consistency: known alignments, banding, CIGAR."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.status import AlignmentState, StatusType
from claragenomicsanalysis_tpu.cpu import nw_oracle as nw
from claragenomicsanalysis_tpu.utils.genomeutils import mutate_sequence, generate_random_genome


def test_identity():
    path, dist, status = nw.align("ACGT", "ACGT")
    assert status == StatusType.SUCCESS
    assert dist == 0
    assert path == [AlignmentState.MATCH] * 4
    assert nw.path_to_cigar(path) == "4M"
    assert nw.path_to_cigar(path, extended=True) == "4="


def test_single_mismatch():
    path, dist, _ = nw.align("ACGT", "AGGT")
    assert dist == 1
    assert nw.path_to_cigar(path) == "4M"
    assert nw.path_to_cigar(path, extended=True) == "1=1X2="


def test_indel():
    path, dist, _ = nw.align("ACGT", "ACT")
    assert dist == 1
    # insertion consumes query
    assert path.count(AlignmentState.INSERTION) == 1
    path, dist, _ = nw.align("ACT", "ACGT")
    assert dist == 1
    assert path.count(AlignmentState.DELETION) == 1


def test_empty_sequences():
    path, dist, _ = nw.align("", "ACG")
    assert dist == 3 and nw.path_to_cigar(path) == "3D"
    path, dist, _ = nw.align("ACG", "")
    assert dist == 3 and nw.path_to_cigar(path) == "3I"


def test_path_consistency_random(rng):
    for _ in range(20):
        n = int(rng.integers(1, 60))
        q = generate_random_genome(n, rng)
        t = mutate_sequence(q, int(rng.integers(0, 8)), rng)
        path, dist, _ = nw.align(q, t)
        # path must consume exactly q and t
        qi = sum(1 for s in path if s in (0, 1, 2))
        tj = sum(1 for s in path if s in (0, 1, 3))
        assert qi == len(q) and tj == len(t)
        # cost of path equals reported distance
        cost = sum(1 for s in path if s != AlignmentState.MATCH)
        assert cost == dist


def test_banded_equals_dense_when_band_large(rng):
    for _ in range(10):
        q = generate_random_genome(int(rng.integers(5, 40)), rng)
        t = mutate_sequence(q, 3, rng)
        p1, d1, s1 = nw.align(q, t)
        p2, d2, s2 = nw.align(q, t, band_radius=64)
        assert (d1, s1) == (d2, s2)
        assert p1 == p2


def test_band_overflow_status():
    _, _, status = nw.align("A" * 100, "A" * 10, band_radius=8)
    assert status == StatusType.EXCEEDED_MAX_ALIGNMENT_DIFFERENCE


def test_format_alignment():
    path, _, _ = nw.align("ACGT", "AGT")
    view = nw.format_alignment(path, "ACGT", "AGT")
    lines = view.splitlines()
    assert lines[0].replace("-", "") == "ACGT"
    assert lines[2].replace("-", "") == "AGT"


def test_path_to_cigar_rejects_sentinel_codes():
    """Review regression: the vectorized LUT must keep the dict era's loud
    failure — a -1 sentinel in a path raises, never wraps into '1D'."""
    import pytest
    with pytest.raises(ValueError):
        nw.path_to_cigar([-1])
    with pytest.raises(ValueError):
        nw.path_to_cigar([0, 4])
