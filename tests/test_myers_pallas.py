"""Pallas Myers bit-vector kernel (interpret mode on CPU) vs the XLA scan
formulation: rows and scores bit-identical, including empty/degenerate
problems and multi-word queries."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.ops.myers import myers_bottom_row
from claragenomicsanalysis_tpu.ops.myers_pallas import myers_bottom_row_pallas
from claragenomicsanalysis_tpu.utils.genomeutils import (
    encode, generate_random_genome, mutate_sequence)


def _pack(pairs, Lq, Lt):
    q = np.stack([encode(a, Lq) for a, _ in pairs]).astype(np.int32)
    t = np.stack([encode(b, Lt) for _, b in pairs]).astype(np.int32)
    qlen = np.array([len(a) for a, _ in pairs], np.int32)
    tlen = np.array([len(b) for _, b in pairs], np.int32)
    return q, qlen, t, tlen


@pytest.mark.parametrize("unroll", [1, 2, 4])
def test_pallas_myers_matches_xla(rng, unroll):
    pairs = []
    for _ in range(6):
        a = generate_random_genome(int(rng.integers(1, 90)), rng)
        b = mutate_sequence(a, int(rng.integers(0, 12)), rng)[:100]
        pairs.append((a, b))
    pairs += [("", "ACG"), ("ACGT", ""), ("A", "A")]
    q, qlen, t, tlen = _pack(pairs, 96, 104)
    r1, s1 = myers_bottom_row(q, qlen, t, tlen)
    r2, s2 = myers_bottom_row_pallas(q, qlen, t, tlen, interpret=True,
                                     unroll=unroll)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_pallas_myers_multiword_boundaries(rng):
    # exercise qlen at/around 32-bit word boundaries (the msk extraction)
    pairs = []
    for n in (31, 32, 33, 63, 64, 65, 95):
        a = generate_random_genome(n, rng)
        pairs.append((a, mutate_sequence(a, 3, rng)[:100]))
    q, qlen, t, tlen = _pack(pairs, 96, 104)
    r1, s1 = myers_bottom_row(q, qlen, t, tlen)
    r2, s2 = myers_bottom_row_pallas(q, qlen, t, tlen, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
