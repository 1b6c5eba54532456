"""Device POA vs CPU oracle: consensus, coverage, MSA bit-identical."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores
from claragenomicsanalysis_tpu.core.status import OutputType, StatusType
from claragenomicsanalysis_tpu.cpu.poa_oracle import poa as oracle_poa
from claragenomicsanalysis_tpu.models.poa import create_batch
from claragenomicsanalysis_tpu.utils.genomeutils import (generate_random_genome,
                                                         mutate_sequence)

BS = BatchSize(max_sequence_size=64, max_sequences_per_poa=6,
               max_pred_per_node=8, max_aligned_per_node=4)


def _run_both(windows, bs=BS, msa=True):
    batch = create_batch(batch_size=bs,
                         output_mask=OutputType.CONSENSUS | OutputType.MSA)
    for w in windows:
        batch.add_poa_group(w)
    cons, covs, stats = batch.get_consensus()
    msas, mstats = batch.get_msa()
    oracle = [oracle_poa(w, batch_size=bs, output_msa=True) for w in windows]
    return cons, covs, stats, msas, oracle


def test_trivial_windows():
    windows = [["ACGT"], ["ACGT", "ACGT", "ACGT"]]
    cons, covs, stats, msas, oracle = _run_both(windows)
    for i, (o_c, o_cov, o_msa, o_st) in enumerate(oracle):
        assert stats[i] == StatusType(o_st)
        assert cons[i] == o_c, (i, cons[i], o_c)
        assert covs[i] == o_cov
        assert msas[i] == o_msa


def test_substitution_insertion_deletion():
    windows = [
        ["ACTT", "ACTT", "AGTT", "ACTT"],
        ["ACGT", "ACGGT", "ACGGT"],
        ["ACGGT", "ACGT", "ACGT"],
        ["TTTT", "AAAA"],              # fully divergent
        ["A", "C", "G"],
    ]
    cons, covs, stats, msas, oracle = _run_both(windows)
    for i, (o_c, o_cov, o_msa, o_st) in enumerate(oracle):
        assert stats[i] == StatusType(o_st)
        assert cons[i] == o_c, (i, cons[i], o_c)
        assert covs[i] == o_cov, (i, covs[i], o_cov)
        assert msas[i] == o_msa, (i, msas[i], o_msa)


def test_random_noisy_windows_match_oracle(rng):
    windows = []
    for _ in range(6):
        base = generate_random_genome(int(rng.integers(20, 60)), rng)
        n = int(rng.integers(2, 6))
        windows.append([base] + [mutate_sequence(base, int(rng.integers(1, 6)), rng)[:64]
                                 for _ in range(n - 1)])
    cons, covs, stats, msas, oracle = _run_both(windows)
    for i, (o_c, o_cov, o_msa, o_st) in enumerate(oracle):
        assert stats[i] == StatusType(o_st), (i, stats[i], o_st)
        assert cons[i] == o_c, (i, cons[i], o_c)
        assert covs[i] == o_cov
        assert msas[i] == o_msa, (i,)


def test_weights_match_oracle():
    windows = [["ACTT", "AGTT", "AGTT"]]
    weights = [[5] * 4, [1] * 4, [1] * 4]
    batch = create_batch(batch_size=BS)
    batch.add_poa_group(windows[0], weights)
    cons, covs, stats = batch.get_consensus()
    o_c, o_cov, _, o_st = oracle_poa(windows[0], weights=weights, batch_size=BS)
    assert cons[0] == o_c == "ACTT"
    assert covs[0] == o_cov


def test_host_status_paths():
    bs = BatchSize(max_sequence_size=8, max_sequences_per_poa=2)
    batch = create_batch(batch_size=bs)
    assert batch.add_poa_group(["A" * 20]) == StatusType.EXCEEDED_MAXIMUM_SEQUENCE_SIZE
    assert batch.add_poa_group(["AC", "AC", "AC"]) == \
        StatusType.EXCEEDED_MAXIMUM_SEQUENCES_PER_POA
    assert batch.add_poa_group(["ACGT", "ACGA"]) == StatusType.SUCCESS
    cons, covs, stats = batch.get_consensus()
    assert stats[0] == StatusType.EXCEEDED_MAXIMUM_SEQUENCE_SIZE
    assert stats[1] == StatusType.EXCEEDED_MAXIMUM_SEQUENCES_PER_POA
    assert stats[2] == StatusType.SUCCESS and cons[2]


def test_node_overflow_device_status():
    bs = BatchSize(max_sequence_size=32, max_nodes_per_window=16,
                   max_sequences_per_poa=4)
    batch = create_batch(batch_size=bs)
    batch.add_poa_group(["ACGTACGTACGT", "TTTTGGGGCCCC"])
    _, _, stats = batch.get_consensus()
    o = oracle_poa(["ACGTACGTACGT", "TTTTGGGGCCCC"], batch_size=bs)
    assert stats[0] == StatusType(o[3])
    assert stats[0] == StatusType.NODE_COUNT_EXCEEDED_MAXIMUM_GRAPH_SIZE


def test_msa_disabled_status():
    batch = create_batch(batch_size=BS, output_mask=OutputType.CONSENSUS)
    batch.add_poa_group(["ACGT", "ACGT"])
    msas, stats = batch.get_msa()
    assert stats[0] == StatusType.OUTPUT_TYPE_UNAVAILABLE


def test_reset_and_graphs():
    batch = create_batch(batch_size=BS)
    batch.add_poa_group(["ACG", "ACG"])
    g = batch.get_graphs()[0]
    assert "digraph" in g.serialize_to_dot()
    batch.reset()
    assert batch.get_total_poas() == 0


def test_get_graphs_matches_oracle(rng):
    """The device graph export (XLA program arrays) serializes to the SAME
    DOT as the CPU oracle's graph for successful windows — the debug
    surface now shows the device's graph, verified against the spec."""
    from claragenomicsanalysis_tpu.cpu.poa_oracle import PoaGraph
    from claragenomicsanalysis_tpu.utils.genomeutils import (
        encode as enc, generate_random_genome, mutate_sequence)
    groups = []
    for _ in range(4):
        base = generate_random_genome(int(rng.integers(10, 30)), rng)
        n = int(rng.integers(2, 5))
        groups.append([base] + [mutate_sequence(base, 2, rng)[:32]
                                for _ in range(n - 1)])
    batch = create_batch(batch_size=BS)
    for g in groups:
        batch.add_poa_group(g)
    device_graphs = batch.get_graphs()
    for grp, dg in zip(groups, device_graphs):
        og = PoaGraph(batch_size=BS, scores=batch.scores)
        for i, s in enumerate(grp):
            codes = list(enc(s))
            if i == 0:
                og.add_first_sequence(codes, [1] * len(s))
            else:
                og.add_alignment(og.align_sequence(codes), codes,
                                 [1] * len(s))
        assert dg.serialize_to_dot() == og.to_directed_graph() \
            .serialize_to_dot()
