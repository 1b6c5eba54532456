"""Bit-equality of the v2 split-kernel POA pipeline (ops/poa_pallas2.py)
against the XLA program (models/poa._build_program, itself oracle-verified)
and the v1 monolith kernel, in Pallas interpret mode on CPU."""

import numpy as np
import pytest

from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores
from claragenomicsanalysis_tpu.utils.genomeutils import (
    encode, generate_random_genome, mutate_sequence)


def make_batch(bs, W, S, base_len, n_mut, seed=0, short_first=False):
    rng = np.random.default_rng(seed)
    L = bs.padded_seq
    seqs = np.full((W, S, L), -1, np.int32)
    weights = np.zeros((W, S, L), np.int32)
    lens = np.zeros((W, S), np.int32)
    n_seqs = np.full(W, S, np.int32)
    for wi in range(W):
        base = generate_random_genome(base_len, rng)
        for si in range(S):
            s = mutate_sequence(base, n_mut, rng)[:bs.max_sequence_size]
            if short_first and si == 0:
                s = s[: max(4, len(s) // 3)]
            seqs[wi, si, : len(s)] = encode(s)
            weights[wi, si, : len(s)] = rng.integers(1, 4, size=len(s))
            lens[wi, si] = len(s)
    return seqs, weights, lens, n_seqs


def xla_reference(bs, sc, msa, banded, args):
    from claragenomicsanalysis_tpu.models.poa import _build_program
    return _build_program(bs, sc, msa, banded)(*args)


def run_v2(bs, sc, msa, banded, args, phases):
    from claragenomicsanalysis_tpu.ops.poa_pallas2 import poa_batch_pallas2
    return poa_batch_pallas2(*args, bs, sc, banded=banded, msa=msa,
                             interpret=True, phases=phases)


def assert_tuple_equal(got, want, names=("codes", "covs", "length", "rows",
                                         "n_cols", "status")):
    for g, w, n in zip(got, want, names):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=f"mismatch in {n}")


BS_SMALL = BatchSize(max_sequence_size=48, max_sequences_per_poa=4,
                     max_pred_per_node=4, max_aligned_per_node=4,
                     max_nodes_per_window=96)


@pytest.mark.parametrize("phases", [("nwtb",), ("add",), ("nwtb", "add"),
                                    ("topsort",), ("consensus",),
                                    ("nwtb", "add", "topsort", "consensus")])
def test_v2_phases_match_xla(phases):
    bs, sc = BS_SMALL, PoaScores()
    args = make_batch(bs, W=4, S=4, base_len=40, n_mut=4)
    want = xla_reference(bs, sc, False, False, args)
    got = run_v2(bs, sc, False, False, args, phases)
    assert_tuple_equal(got, want)


def test_v2_probe_traceback_matches_xla():
    """moves_tb=False (probe walk) must agree with the recorded-moves
    default and the XLA program."""
    from claragenomicsanalysis_tpu.ops.poa_pallas2 import poa_batch_pallas2
    bs, sc = BS_SMALL, PoaScores()
    args = make_batch(bs, W=4, S=4, base_len=40, n_mut=6, seed=23)
    want = xla_reference(bs, sc, False, False, args)
    got = poa_batch_pallas2(*args, bs, sc, interpret=True,
                            phases=("nwtb", "add"), moves_tb=False)
    assert_tuple_equal(got, want)


def test_v2_msa_matches_xla():
    bs, sc = BS_SMALL, PoaScores()
    args = make_batch(bs, W=3, S=4, base_len=36, n_mut=5, seed=3)
    want = xla_reference(bs, sc, True, False, args)
    got = run_v2(bs, sc, True, False, args, ("nwtb", "add"))
    assert_tuple_equal(got, want)


def test_v2_msa_kernel_matches_xla():
    """The lockstep MSA kernel (phases includes 'msa') must reproduce the
    vmapped XLA msa_columns/msa_rows bit-for-bit, including uneven
    window fill and padding sequences."""
    bs, sc = BS_SMALL, PoaScores()
    args = make_batch(bs, W=5, S=4, base_len=38, n_mut=6, seed=11)
    # unevenly-filled windows: drop sequences from some windows
    seqs, weights, lens, n_seqs = args
    n_seqs = n_seqs.copy()
    n_seqs[1] = 2
    n_seqs[3] = 1
    args = (seqs, weights, lens, n_seqs)
    want = xla_reference(bs, sc, True, False, args)
    got = run_v2(bs, sc, True, False, args,
                 ("nwtb", "add", "topsort", "consensus", "msa"))
    assert_tuple_equal(got, want)


def test_v2_wide_pred_config_matches_xla():
    """Correction-shaped windows use P = S (models/correct.py); every v2
    kernel unrolls over P, so P > 4 needs its own bit-equality check."""
    bs = BatchSize(max_sequence_size=32, max_sequences_per_poa=6,
                   max_pred_per_node=8, max_aligned_per_node=4,
                   max_nodes_per_window=64)
    sc = PoaScores()
    args = make_batch(bs, W=3, S=6, base_len=26, n_mut=5, seed=17)
    want = xla_reference(bs, sc, True, False, args)
    got = run_v2(bs, sc, True, False, args,
                 ("nwtb", "add", "topsort", "consensus", "msa"))
    assert_tuple_equal(got, want)


def test_v2_banded_matches_xla():
    bs = BatchSize(max_sequence_size=48, max_sequences_per_poa=4,
                   max_pred_per_node=4, max_aligned_per_node=4,
                   max_nodes_per_window=96, band_width=16)
    sc = PoaScores()
    args = make_batch(bs, W=4, S=4, base_len=40, n_mut=6, seed=5)
    want = xla_reference(bs, sc, False, True, args)
    got = run_v2(bs, sc, False, True, args, ("nwtb", "add"))
    assert_tuple_equal(got, want)
    # banding + the full lockstep pipeline incl. MSA
    want_m = xla_reference(bs, sc, True, True, args)
    got_m = run_v2(bs, sc, True, True, args,
                   ("nwtb", "add", "topsort", "consensus", "msa"))
    assert_tuple_equal(got_m, want_m)


def test_v2_overflow_corners_match_xla():
    # tight caps: node-count, clique and edge overflows all hit
    bs = BatchSize(max_sequence_size=32, max_sequences_per_poa=6,
                   max_pred_per_node=2, max_aligned_per_node=2,
                   max_nodes_per_window=40)
    sc = PoaScores()
    args = make_batch(bs, W=6, S=6, base_len=30, n_mut=8, seed=7)
    want = xla_reference(bs, sc, False, False, args)
    got = run_v2(bs, sc, False, False, args,
                 ("nwtb", "add", "topsort", "consensus"))
    assert_tuple_equal(got, want)


def test_topsort_pallas_matches_xla_on_evolved_state():
    """Direct unit check: _topsort_pallas on mid-scan graph states (built
    by the oracle-verified XLA pipeline) matches poa_ops.topsort exactly —
    level, order, rank AND ok."""
    import jax
    import jax.numpy as jnp
    from claragenomicsanalysis_tpu.ops import poa_ops
    from claragenomicsanalysis_tpu.ops.poa_pallas2 import _topsort_pallas

    bs, sc = BS_SMALL, PoaScores()
    N = bs.padded_nodes
    seqs, weights, lens, n_seqs = make_batch(bs, W=4, S=4, base_len=40,
                                             n_mut=6, seed=17)
    state = jax.vmap(lambda s0, w0, l0: poa_ops.init_state(
        bs, s0, w0, l0))(jnp.asarray(seqs[:, 0]), jnp.asarray(weights[:, 0]),
                         jnp.asarray(lens[:, 0]))
    level = jnp.where(jnp.arange(N)[None, :] < lens[:, :1],
                      jnp.arange(N, dtype=jnp.int32)[None, :], 0)
    for si in range(1, 4):
        want = jax.vmap(lambda st, lv: poa_ops.topsort(st, lv, N + 2))(
            state, level)
        got = _topsort_pallas(bs, True, state, level)
        for g, w, nm in zip(got, want, ("level", "order", "rank", "ok")):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=f"seq {si}: {nm}")
        level, order, rank, _ = want
        seq, w_, sl = (jnp.asarray(seqs[:, si]), jnp.asarray(weights[:, si]),
                       jnp.asarray(lens[:, si]))
        Smat = jax.vmap(lambda st, o, r, q, s_: poa_ops.graph_nw(
            st, o, r, q, s_, sc))(state, order, rank, seq, sl)
        pn, pp, k0, _ = jax.vmap(
            lambda st, o, r, sm, q, s_: poa_ops.nw_traceback(
                st, o, r, sm, q, s_, sc, N + bs.padded_seq))(
            state, order, rank, Smat, seq, sl)
        state = jax.vmap(
            lambda st, a, b_, q, ww, k: poa_ops.add_alignment(
                st, a, b_, q, ww, jnp.int32(si), bs, path_start=k))(
            state, pn, pp, seq, w_, k0)


def test_v2_backend_under_mesh_bit_identical():
    """backend="pallas2" with a data-sharded mesh (8 fake devices) must
    equal the 1-device pallas2 run and the XLA backend — sharded_poa now
    runs the selected kernel program inside shard_map."""
    from claragenomicsanalysis_tpu.core.status import OutputType
    from claragenomicsanalysis_tpu.models.poa import create_batch
    from claragenomicsanalysis_tpu.parallel import make_mesh
    rng = np.random.default_rng(31)
    windows = []
    for _ in range(5):
        base = generate_random_genome(40, rng)
        windows.append([mutate_sequence(base, 4, rng) for _ in range(4)])
    outs = {}
    for name, kw in (("xla", dict(backend="xla")),
                     ("p2", dict(backend="pallas2")),
                     ("p2mesh", dict(backend="pallas2", mesh=make_mesh()))):
        b = create_batch(batch_size=BS_SMALL,
                         output_mask=OutputType.CONSENSUS | OutputType.MSA,
                         **kw)
        for w in windows:
            b.add_poa_group(w)
        b.generate_poa()
        cons, covs, st = b.get_consensus()
        msa, mst = b.get_msa()
        outs[name] = (cons, covs, st, msa, mst)
    assert outs["p2"] == outs["xla"]
    assert outs["p2mesh"] == outs["xla"]


def test_v2_multiblock_window_axis():
    """W > 128 spans two lane blocks on the lockstep kernels' grid; the
    scratch column/level planes are per-block and must not leak between
    blocks.  nwtb/add run as XLA to keep interpret time sane — topsort,
    consensus and MSA are the kernels whose grids tile the window axis."""
    bs = BatchSize(max_sequence_size=16, max_sequences_per_poa=3,
                   max_pred_per_node=4, max_aligned_per_node=4,
                   max_nodes_per_window=32)
    sc = PoaScores()
    args = make_batch(bs, W=131, S=3, base_len=12, n_mut=2, seed=29)
    want = xla_reference(bs, sc, True, False, args)
    got = run_v2(bs, sc, True, False, args, ("topsort", "consensus", "msa"))
    assert_tuple_equal(got, want)


def test_v2_short_and_uneven_windows():
    bs, sc = BS_SMALL, PoaScores()
    seqs, weights, lens, n_seqs = make_batch(bs, W=5, S=4, base_len=40,
                                             n_mut=4, seed=11,
                                             short_first=True)
    n_seqs[1] = 1          # single-sequence window
    n_seqs[2] = 2
    want = xla_reference(bs, sc, False, False,
                         (seqs, weights, lens, n_seqs))
    got = run_v2(bs, sc, False, False, (seqs, weights, lens, n_seqs),
                 ("nwtb", "add", "topsort", "consensus"))
    assert_tuple_equal(got, want)


def test_v2_matches_v1_kernel():
    """End-to-end v2 vs the v1 monolith kernel on the semantic outputs
    (consensus codes/covs/length/status; widths differ by padding)."""
    from claragenomicsanalysis_tpu.ops.poa_pallas import poa_batch_pallas
    bs, sc = BS_SMALL, PoaScores()
    args = make_batch(bs, W=4, S=4, base_len=40, n_mut=4, seed=13)
    c1, v1cov, l1, _, _, st1 = poa_batch_pallas(
        *[np.asarray(a) for a in args], bs, sc, interpret=True, WPG=1)
    c2, cov2, l2, _, _, st2 = run_v2(bs, sc, False, False, args,
                                     ("nwtb", "add"))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(st1), np.asarray(st2))
    mc = min(c1.shape[1], np.asarray(c2).shape[1])
    np.testing.assert_array_equal(np.asarray(c1)[:, :mc],
                                  np.asarray(c2)[:, :mc])
    np.testing.assert_array_equal(np.asarray(v1cov)[:, :mc],
                                  np.asarray(cov2)[:, :mc])


def test_v2_model_backend():
    """backend="pallas2" through the public Batch surface matches the
    default (XLA on CPU) backend's consensus/coverage/status."""
    from claragenomicsanalysis_tpu.core.status import OutputType
    from claragenomicsanalysis_tpu.models.poa import create_batch
    rng = np.random.default_rng(5)
    windows = []
    for _ in range(3):
        base = generate_random_genome(40, rng)
        windows.append([mutate_sequence(base, 4, rng) for _ in range(4)])
    outs = {}
    for backend in ("xla", "pallas2"):
        b = create_batch(batch_size=BS_SMALL, backend=backend,
                         output_mask=OutputType.CONSENSUS)
        for w in windows:
            b.add_poa_group(w)
        outs[backend] = b.get_consensus()
    assert outs["pallas2"] == outs["xla"]


def test_topsort_guess_cuts_sweeps():
    """Regression guard for the visit-order guess: on evolved pileup-ish
    graphs the guided sweep must converge in <= 3 relaxation sweeps
    (1 productive + 1 clean, +1 slack for > 4-long new-node chains) while
    remaining bit-identical to the identity order.  Consumes the kernel's
    meta sweep-count diagnostic (with_iters)."""
    import jax
    import jax.numpy as jnp
    from claragenomicsanalysis_tpu.core.config import BatchSize
    from claragenomicsanalysis_tpu.ops import poa_ops
    from claragenomicsanalysis_tpu.ops.poa_pallas2 import (_topsort_pallas,
                                                           topsort_guess)

    bs = BatchSize(max_sequence_size=128, max_sequences_per_poa=6,
                   max_pred_per_node=8, max_aligned_per_node=4,
                   max_nodes_per_window=320)
    sc = PoaScores()
    N = bs.padded_nodes
    seqs, weights, lens, n_seqs = make_batch(bs, W=4, S=6, base_len=110,
                                             n_mut=10, seed=29)
    seqs, weights, lens = (jnp.asarray(seqs), jnp.asarray(weights),
                           jnp.asarray(lens))
    state = jax.vmap(lambda s0, w0, l0: poa_ops.init_state(
        bs, s0, w0, l0))(seqs[:, 0], weights[:, 0], lens[:, 0])
    level = jnp.where(jnp.arange(N)[None, :] < lens[:, :1],
                      jnp.arange(N, dtype=jnp.int32)[None, :], 0)
    for si in range(1, 6):
        nl, order, rank, _ = jax.vmap(
            lambda st, lv: poa_ops.topsort(st, lv, N + 2))(state, level)
        Smat = jax.vmap(lambda st, o, r, q, s_: poa_ops.graph_nw(
            st, o, r, q, s_, sc))(state, order, rank, seqs[:, si],
                                  lens[:, si])
        pn, pp, k0, _ = jax.vmap(
            lambda st, o, r, sm, q, s_: poa_ops.nw_traceback(
                st, o, r, sm, q, s_, sc, N + bs.padded_seq))(
            state, order, rank, Smat, seqs[:, si], lens[:, si])
        new_state = jax.vmap(
            lambda st, a, b_, q, ww, kk: poa_ops.add_alignment(
                st, a, b_, q, ww, jnp.int32(si), bs, path_start=kk))(
            state, pn, pp, seqs[:, si], weights[:, si], k0)
        guess = topsort_guess(state.node_count, new_state.node_count,
                              new_state.pred[:, :, 0].astype(jnp.int32),
                              nl, N)
        state, level = new_state, nl
        *out_id, it_id = _topsort_pallas(bs, True, state, level,
                                         with_iters=True)
        *out_g, it_g = _topsort_pallas(bs, True, state, level, guess,
                                       with_iters=True)
        for a, b in zip(out_id, out_g):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(np.asarray(it_g).max()) <= 3, (
            si, np.asarray(it_g), np.asarray(it_id))
        # the guess must actually pay once inversions accumulate
        if si >= 3:
            assert int(np.asarray(it_g).max()) < int(np.asarray(it_id).max())
