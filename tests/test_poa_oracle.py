"""POA oracle tests: graph construction, topsort, consensus, MSA semantics."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores
from claragenomicsanalysis_tpu.core.status import StatusType
from claragenomicsanalysis_tpu.cpu.poa_oracle import PoaGraph, poa
from claragenomicsanalysis_tpu.utils.genomeutils import (encode,
                                                         generate_random_genome,
                                                         mutate_sequence)


def test_single_sequence_consensus():
    cons, cov, _, status = poa(["ACGTACGT"])
    assert status == StatusType.SUCCESS
    assert cons == "ACGTACGT"
    assert cov == [1] * 8


def test_identical_sequences():
    cons, cov, _, status = poa(["ACGT"] * 5)
    assert cons == "ACGT"
    assert cov == [5] * 4


def test_majority_vote_substitution():
    # 3 reads say C at position 1, one says G -> consensus takes C
    cons, cov, _, _ = poa(["ACTT", "ACTT", "AGTT", "ACTT"])
    assert cons == "ACTT"


def test_insertion_consensus():
    cons, _, _, _ = poa(["ACGT", "ACGGT", "ACGGT"])
    assert cons == "ACGGT"


def test_deletion_consensus():
    cons, _, _, _ = poa(["ACGGT", "ACGT", "ACGT"])
    assert cons == "ACGT"


def test_msa_shape_and_content():
    cons, _, rows, status = poa(["ACGT", "AGT", "ACGT"], output_msa=True)
    assert status == StatusType.SUCCESS
    assert len(rows) == 3
    width = len(rows[0])
    assert all(len(r) == width for r in rows)
    assert rows[0].replace("-", "") == "ACGT"
    assert rows[1].replace("-", "") == "AGT"


def test_topological_order_is_valid(rng):
    g = PoaGraph()
    base = generate_random_genome(50, rng)
    g.add_first_sequence(list(encode(base)), [1] * 50)
    for _ in range(4):
        s = mutate_sequence(base, 5, rng)
        path = g.align_sequence(list(encode(s)))
        g.add_alignment(path, list(encode(s)), [1] * len(s))
    order = g.topological_order()
    pos = {u: i for i, u in enumerate(order)}
    assert sorted(order) == list(range(g.node_count))
    for v in range(g.node_count):
        for p in g.preds[v]:
            assert pos[p] < pos[v]


def test_noisy_window_recovers_base(rng):
    base = generate_random_genome(100, rng)
    reads = [base] + [mutate_sequence(base, 5, rng) for _ in range(7)]
    cons, cov, _, status = poa(reads)
    assert status == StatusType.SUCCESS
    # consensus should be much closer to base than any noisy read
    from claragenomicsanalysis_tpu.cpu import nw_oracle as nw
    _, dist, _ = nw.align(cons, base)
    assert dist <= 3


def test_sequence_overflow_status():
    bs = BatchSize(max_sequence_size=4)
    _, _, _, status = poa(["ACGTACGT"], batch_size=bs)
    assert status == StatusType.EXCEEDED_MAXIMUM_SEQUENCE_SIZE
    bs = BatchSize(max_sequences_per_poa=2)
    _, _, _, status = poa(["AC"] * 3, batch_size=bs)
    assert status == StatusType.EXCEEDED_MAXIMUM_SEQUENCES_PER_POA


def test_node_overflow_status():
    bs = BatchSize(max_sequence_size=64, max_nodes_per_window=8)
    reads = ["ACGTACGTACGT", "TTTTGGGGCCCC"]
    _, _, _, status = poa(reads, batch_size=bs)
    assert status == StatusType.NODE_COUNT_EXCEEDED_MAXIMUM_GRAPH_SIZE


def test_weights_bias_consensus():
    # one heavy read outvotes two light reads
    seqs = ["ACTT", "AGTT", "AGTT"]
    weights = [[5] * 4, [1] * 4, [1] * 4]
    cons, _, _, _ = poa(seqs, weights=weights)
    assert cons == "ACTT"


def test_dot_export():
    g = PoaGraph()
    g.add_first_sequence(list(encode("ACG")), [1, 1, 1])
    dot = g.to_directed_graph().serialize_to_dot()
    assert "digraph" in dot and "0 -> 1" in dot
