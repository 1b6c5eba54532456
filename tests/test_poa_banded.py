"""Banded graph-NW (create_batch banded_alignment=True): device == oracle
bit-for-bit, wide band == full result, too-narrow band -> EXCEEDED_BAND_WIDTH.

Reference counterpart: cudapoa/src/cudapoa_nw_banded.cuh + create_batch's
banded_alignment flag [U]; band semantics are ours (cpu/poa_oracle.py rule 8).
"""

import numpy as np

from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores
from claragenomicsanalysis_tpu.core.status import OutputType, StatusType
from claragenomicsanalysis_tpu.cpu.poa_oracle import poa as oracle_poa
from claragenomicsanalysis_tpu.models.poa import create_batch
from claragenomicsanalysis_tpu.utils.genomeutils import (generate_random_genome,
                                                         mutate_sequence)


def _run_device(windows, bs, banded, msa=True):
    batch = create_batch(
        batch_size=bs,
        output_mask=OutputType.CONSENSUS | (OutputType.MSA if msa else 0),
        banded_alignment=banded)
    for w in windows:
        batch.add_poa_group(w)
    cons, covs, stats = batch.get_consensus()
    msas, _ = batch.get_msa() if msa else ([], [])
    return cons, covs, stats, msas


def test_banded_matches_banded_oracle(rng):
    bs = BatchSize(max_sequence_size=64, max_sequences_per_poa=6,
                   max_pred_per_node=8, max_aligned_per_node=4,
                   band_width=17)
    windows = []
    for _ in range(6):
        base = generate_random_genome(int(rng.integers(25, 60)), rng)
        n = int(rng.integers(2, 6))
        windows.append([base] + [
            mutate_sequence(base, int(rng.integers(1, 5)), rng)[:64]
            for _ in range(n - 1)])
    cons, covs, stats, msas = _run_device(windows, bs, banded=True)
    for i, w in enumerate(windows):
        o_c, o_cov, o_msa, o_st = oracle_poa(w, batch_size=bs,
                                             output_msa=True, banded=True)
        assert stats[i] == StatusType(o_st), (i, stats[i], o_st)
        assert cons[i] == o_c, (i, cons[i], o_c)
        assert covs[i] == o_cov
        assert msas[i] == o_msa


def test_wide_band_equals_full():
    bs_full = BatchSize(max_sequence_size=48, max_sequences_per_poa=4,
                        max_pred_per_node=8)
    bs_wide = BatchSize(max_sequence_size=48, max_sequences_per_poa=4,
                        max_pred_per_node=8, band_width=2 * 49 + 1)
    rng = np.random.default_rng(7)
    base = generate_random_genome(40, rng)
    windows = [[base] + [mutate_sequence(base, 3, rng)[:48] for _ in range(3)]]
    c_full, cov_full, st_full, m_full = _run_device(windows, bs_full, False)
    c_band, cov_band, st_band, m_band = _run_device(windows, bs_wide, True)
    assert st_full == st_band
    assert c_full == c_band
    assert cov_full == cov_band
    assert m_full == m_band


def test_band_width_one_fails_with_status():
    # band_width=1 (half-width 0) cannot reach column L on a chain graph:
    # c(last row) = L*L//(L+1) < L, so the sink cell stays NEG.
    bs = BatchSize(max_sequence_size=32, max_sequences_per_poa=2,
                   band_width=1)
    w = ["ACGTACGTAC", "ACGTACGTAC"]
    o = oracle_poa(w, batch_size=bs, banded=True)
    assert StatusType(o[3]) == StatusType.EXCEEDED_BAND_WIDTH
    cons, covs, stats, _ = _run_device([w], bs, banded=True, msa=False)
    assert stats[0] == StatusType.EXCEEDED_BAND_WIDTH
    assert cons[0] == ""


def test_band_failure_keeps_batch_going():
    """A band-failed window must not poison its batch neighbours."""
    bs = BatchSize(max_sequence_size=32, max_sequences_per_poa=3,
                   band_width=1)
    good = ["ACGT"]                       # single-seq window: no alignment
    bad = ["ACGTACGTAC", "ACGTACGTAC"]
    cons, covs, stats, _ = _run_device([bad, good], bs, True, msa=False)
    assert stats[0] == StatusType.EXCEEDED_BAND_WIDTH
    assert stats[1] == StatusType.SUCCESS
    assert cons[1] == "ACGT"
