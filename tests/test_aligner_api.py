"""Aligner batch API tests — the reference's Test_AlignerGlobal analog
(batch-level CIGAR checks incl. status-overflow paths)."""

import numpy as np

from claragenomicsanalysis_tpu.core.status import StatusType
from claragenomicsanalysis_tpu.cpu import nw_oracle as nw
from claragenomicsanalysis_tpu.models import create_aligner
from claragenomicsanalysis_tpu.utils.genomeutils import (generate_random_genome,
                                                         mutate_sequence)


def test_batch_cigars_match_oracle(rng):
    aligner = create_aligner(200, 200, 64, band_radius=32)
    pairs = []
    for _ in range(16):
        a = generate_random_genome(int(rng.integers(10, 180)), rng)
        b = mutate_sequence(a, int(rng.integers(0, 10)), rng)
        pairs.append((a, b))
        assert aligner.add_alignment(a, b) == StatusType.SUCCESS
    aligner.align_all()
    results = aligner.get_alignments()
    assert len(results) == 16
    for res, (a, b) in zip(results, pairs):
        o_path, o_dist, _ = nw.align(a, b, band_radius=32)
        assert res.status == StatusType.SUCCESS
        assert res.edit_distance == o_dist
        assert res.convert_to_cigar() == nw.path_to_cigar(o_path)
        assert res.convert_to_cigar(extended=True) == nw.path_to_cigar(
            o_path, extended=True)


def test_status_overflow_paths():
    aligner = create_aligner(8, 8, 2, band_radius=4)
    assert aligner.add_alignment("ACGT", "ACGT") == StatusType.SUCCESS
    # too long -> slot kept, marked failed
    assert aligner.add_alignment("A" * 20, "ACGT") == StatusType.EXCEEDED_MAX_LENGTH
    # too many
    assert aligner.add_alignment("AC", "AC") == StatusType.EXCEEDED_MAX_ALIGNMENTS
    res = aligner.get_alignments()
    assert len(res) == 2
    assert res[0].status == StatusType.SUCCESS
    assert res[1].status == StatusType.EXCEEDED_MAX_LENGTH
    assert res[1].path == []


def test_adaptive_band_absorbs_length_difference():
    """Reference parity: the Ukkonen band is p + |lq - lt| (ukkonen_gpu.cu
    [U]) — a pair whose length difference exceeds the configured radius must
    still align (band widens per pair), not return an overflow status."""
    aligner = create_aligner(64, 64, 4, band_radius=4)
    aligner.add_alignment("A" * 40, "A" * 4)
    res = aligner.get_alignments()
    assert res[0].status == StatusType.SUCCESS
    assert res[0].edit_distance == 36
    assert res[0].convert_to_cigar() == "36I4M"


def test_adaptive_band_matches_dense_oracle(rng):
    """Pairs with dl > p: widened band must reproduce the dense-canonical
    path whenever it contains the optimal envelope."""
    aligner = create_aligner(128, 128, 8, band_radius=8)
    pairs = []
    for n_del in (20, 40, 70):
        a = generate_random_genome(100, rng)
        b = a[: 100 - n_del]        # pure suffix deletion: s == dl == n_del
        pairs.append((a, b))
        aligner.add_alignment(a, b)
    for res, (a, b) in zip(aligner.get_alignments(), pairs):
        o_path, o_dist, _ = nw.align(a, b)
        assert res.status == StatusType.SUCCESS
        assert res.edit_distance == o_dist == len(a) - len(b)
        assert res.convert_to_cigar() == nw.path_to_cigar(o_path)


def test_reset_and_reuse():
    aligner = create_aligner(16, 16, 4, band_radius=8)
    aligner.add_alignment("ACGT", "ACGA")
    first = aligner.get_alignments()
    assert first[0].edit_distance == 1
    aligner.reset()
    assert aligner.get_alignments() == []
    aligner.add_alignment("GG", "GG")
    assert aligner.get_alignments()[0].edit_distance == 0


def test_format_alignment_roundtrip():
    aligner = create_aligner(16, 16, 1, band_radius=8)
    aligner.add_alignment("ACGT", "AGT")
    res = aligner.get_alignments()[0]
    view = res.format_alignment()
    assert view.splitlines()[0].replace("-", "") == "ACGT"
