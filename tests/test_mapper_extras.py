"""Query-vs-target mapping, overlap fusion, and the PAF-vs-truth
evaluator (SURVEY.md §2.4 CLI row, OverlapperTriggered fusion, §2.5
evaluation scripts)."""

import json

import pytest

from claragenomicsanalysis_tpu.core.config import MapperConfig
from claragenomicsanalysis_tpu.core.types import Overlap
from claragenomicsanalysis_tpu.evaluation import (evaluate_paf, read_truth,
                                                  true_pairs, write_truth)
from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
from claragenomicsanalysis_tpu.io.paf import read_paf
from claragenomicsanalysis_tpu.models.mapper import (
    Overlapper, map_all_vs_all, map_query_vs_target, overlaps_to_paf)
from claragenomicsanalysis_tpu.simulators.genomesim import PoissonGenomeSimulator
from claragenomicsanalysis_tpu.simulators.readsim import NoisyReadSimulator


@pytest.fixture(scope="module")
def sim():
    genome = PoissonGenomeSimulator(seed=21).build_reference(20_000)
    reads = NoisyReadSimulator(seed=21, error_rate=0.05).generate_reads(
        genome, 40, 2000)
    parser = FastaParser("<mem>", records=[
        FastaSequence(r.name, r.seq) for r in reads])
    cfg = MapperConfig(kmer_size=15, window_size=5, min_overlap_len=100,
                       min_overlap_fraction=0.3, min_bases_per_residue=500)
    return genome, reads, parser, cfg


def test_query_vs_target_genome_placement(sim):
    """Mapping reads against their source genome recovers the simulated
    placements."""
    genome, reads, parser, cfg = sim
    gparser = FastaParser("<mem>", records=[FastaSequence("ref", genome)])
    res = map_query_vs_target(parser, gparser, cfg)
    placed = {}
    for o in res.overlaps:
        span = (o.target_end_position_in_read
                - o.target_start_position_in_read)
        prev = placed.get(o.query_read_id)
        if prev is None or span > prev[1]:
            placed[o.query_read_id] = (o, span)
    assert len(placed) >= 0.9 * len(reads)
    ok = 0
    for qid, (o, _) in placed.items():
        r = reads[qid]
        if (abs(o.target_start_position_in_read - r.reference_start) < 300
                and abs(o.target_end_position_in_read - r.reference_end)
                < 300):
            ok += 1
    assert ok >= 0.9 * len(placed)


def test_query_vs_target_paf_uses_both_parsers(sim):
    genome, _, parser, cfg = sim
    gparser = FastaParser("<mem>", records=[FastaSequence("ref", genome)])
    res = map_query_vs_target(parser, gparser, cfg)
    rows = overlaps_to_paf(res.overlaps, parser, gparser)
    assert rows
    for row in rows:
        cols = row.split("\t")
        assert cols[5] == "ref" and int(cols[6]) == len(genome)
        assert cols[0].startswith("read_")


def _ov(q, t, qs, qe, ts, te, strand="+", res=5):
    return Overlap(q, t, qs, qe, ts, te, res, strand)


def test_fuse_overlaps_plus_strand():
    a = _ov(1, 2, 100, 500, 1000, 1400)
    b = _ov(1, 2, 600, 900, 1500, 1800)     # gaps 100/100 -> fuse
    c = _ov(1, 2, 5000, 5400, 5900, 6300)   # far -> separate
    fused = Overlapper.fuse_overlaps([c, b, a], max_gap=500)
    assert len(fused) == 2
    f = fused[0]
    assert (f.query_start_position_in_read,
            f.query_end_position_in_read) == (100, 900)
    assert (f.target_start_position_in_read,
            f.target_end_position_in_read) == (1000, 1800)
    assert f.num_residues == 10
    assert fused[1] == c


def test_fuse_overlaps_minus_strand():
    # '-' chains walk target backwards in query order
    a = _ov(3, 4, 100, 500, 2000, 2400, "-")
    b = _ov(3, 4, 600, 900, 1500, 1900, "-")   # tgap = 2000-1900 = 100
    fused = Overlapper.fuse_overlaps([a, b], max_gap=500)
    assert len(fused) == 1
    f = fused[0]
    assert (f.query_start_position_in_read,
            f.query_end_position_in_read) == (100, 900)
    assert (f.target_start_position_in_read,
            f.target_end_position_in_read) == (1500, 2400)


def test_fuse_respects_strand_and_ids():
    a = _ov(1, 2, 100, 500, 1000, 1400, "+")
    b = _ov(1, 2, 600, 900, 1500, 1800, "-")
    c = _ov(1, 3, 600, 900, 1500, 1800, "+")
    assert len(Overlapper.fuse_overlaps([a, b, c])) == 3


def test_fuse_overlap_rows_matches_object_fusion(rng):
    """The rows-level fusion (the scale path the CLI uses) must reproduce
    fuse_overlaps exactly on randomized overlap sets, including multi-part
    chains, containments, both strands and strand/id group breaks."""
    import numpy as np
    for trial in range(20):
        ovs = []
        for _ in range(int(rng.integers(1, 60))):
            q, t = int(rng.integers(0, 4)), int(rng.integers(0, 4))
            qs = int(rng.integers(0, 4000))
            qe = qs + int(rng.integers(1, 800))
            ts = int(rng.integers(0, 4000))
            te = ts + int(rng.integers(1, 800))
            ovs.append(_ov(q, t, qs, qe, ts, te,
                           "+" if rng.integers(0, 2) == 0 else "-"))
        gap = int(rng.integers(0, 800))
        want = Overlapper.fuse_overlaps(ovs, max_gap=gap)
        ordered = sorted(ovs, key=lambda o: o.key())
        rows = np.array(
            [[o.query_read_id, o.target_read_id,
              o.query_start_position_in_read, o.query_end_position_in_read,
              o.target_start_position_in_read, o.target_end_position_in_read,
              o.num_residues, 0 if o.relative_strand == "+" else 1]
             for o in ordered], dtype=np.int32).T
        got = Overlapper.rows_to_overlaps(
            Overlapper.fuse_overlap_rows(rows, max_gap=gap))
        assert [o.key() + (o.num_residues,) for o in got] \
            == [o.key() + (o.num_residues,) for o in want], trial


def test_true_pairs_and_evaluator(sim, tmp_path):
    genome, reads, parser, cfg = sim
    truth_path = str(tmp_path / "truth.tsv")
    write_truth(reads, truth_path)
    truth = read_truth(truth_path)
    assert len(truth) == len(reads)
    tp = true_pairs(truth, 100)
    assert tp  # 40 x 2kb reads on 20kb genome must overlap somewhere

    res = map_all_vs_all(parser, cfg)
    paf_path = str(tmp_path / "out.paf")
    with open(paf_path, "w") as f:
        for row in overlaps_to_paf(res.overlaps, parser):
            f.write(row + "\n")
    metrics = evaluate_paf(read_paf(paf_path), truth, 100)
    assert metrics["recall"] >= 0.7, metrics
    assert metrics["precision"] >= 0.95, metrics


def test_cli_evaluate_and_two_file_map(sim, tmp_path, capsys):
    from claragenomicsanalysis_tpu.cli import main
    genome, reads, _, _ = sim
    qf = tmp_path / "q.fasta"
    qf.write_text("".join(f">{r.name}\n{r.seq}\n" for r in reads[:10]))
    tf = tmp_path / "t.fasta"
    tf.write_text(f">ref\n{genome}\n")
    rc = main(["map", str(qf), str(tf), "-k", "15", "-w", "5",
               "--min-overlap-len", "100", "--min-overlap-fraction", "0.3",
               "--min-bases-per-residue", "500", "--fuse-overlaps"])
    assert rc == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert out and all(r.split("\t")[5] == "ref" for r in out)

    truth_path = tmp_path / "truth.tsv"
    write_truth(reads, str(truth_path))
    paf_path = tmp_path / "o.paf"
    paf_path.write_text("")  # empty PAF -> recall 0 (or 1 if no truth)
    rc = main(["evaluate", str(truth_path), str(paf_path)])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out)
    assert metrics["reported_pairs"] == 0


def test_index_store_cache_roundtrip(sim, tmp_path):
    """map with index_store_dir persists indices; a fresh run loads them
    from disk (disk_hits > 0 via IndexCache) and yields identical output."""
    from claragenomicsanalysis_tpu.models.mapper import IndexCache
    _, _, parser, cfg = sim
    store = str(tmp_path / "idx")
    res1 = map_all_vs_all(parser, cfg, index_store_dir=store)
    import os
    assert any(f.startswith("index_") for f in os.listdir(store))
    res2 = map_all_vs_all(parser, cfg, index_store_dir=store)
    assert res2.overlaps == res1.overlaps
    # a fresh cache really reads from disk
    cache = IndexCache(store_dir=store)
    chunks = parser.get_chunks(cfg.index_size_mb * 1_000_000)
    idx = cache.get_or_create(parser, chunks[0][0], chunks[0][1], cfg)
    assert cache.disk_hits == 1
    assert idx.n_elems > 0


def test_match_expand_fill_matches_gather_reference(rng):
    """The delta-scatter fill inside match_expand must equal the plain
    src-gather formulation on adversarial segment structures: empty
    segments (incl. runs), trailing INVALID padding, and total == cap."""
    import numpy as np
    import jax.numpy as jnp
    from claragenomicsanalysis_tpu.ops import map_ops

    for trial in range(6):
        C = 64
        n_valid = int(rng.integers(1, C))
        cnt = rng.integers(0, 4, C).astype(np.int64)
        cnt[n_valid:] = 0                      # trailing padding: count 0
        cnt[rng.integers(0, max(n_valid, 1))] = 0   # mid empty runs
        cum = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
        total = int(cum[-1])
        cap = int(1 << max(int(total - 1).bit_length(), 3))
        if trial == 5:
            cap = max(total, 8)                # total == cap corner
        lo = np.sort(rng.integers(0, 128, C)).astype(np.int32)
        qidx = {
            "rep": np.arange(C, dtype=np.uint32),
            "read_id": rng.integers(0, 50, C).astype(np.int32),
            "pos": rng.integers(0, 1000, C).astype(np.int32),
            "dir": rng.integers(0, 2, C).astype(np.int32),
            "n_elems": np.int32(n_valid),
        }
        tidx = {
            "rep": np.arange(200, dtype=np.uint32),
            "read_id": rng.integers(0, 50, 200).astype(np.int32),
            "pos": rng.integers(0, 1000, 200).astype(np.int32),
            "dir": rng.integers(0, 2, 200).astype(np.int32),
            "n_elems": np.int32(200),
        }
        got = map_ops.match_expand(
            {k: jnp.asarray(v) for k, v in qidx.items()},
            {k: jnp.asarray(v) for k, v in tidx.items()},
            jnp.asarray(lo), jnp.asarray(cum), cap=cap, skip_self=False)
        # reference: plain searchsorted + gathers
        a = np.arange(cap)
        src = np.clip(np.searchsorted(cum, a, side="right") - 1, 0, C - 1)
        off = a - cum[src]
        tsel = np.clip(lo[src] + off, 0, 199)
        valid = a < min(total, cap)
        for name, want in [
                ("q_read", qidx["read_id"][src]),
                ("q_pos", qidx["pos"][src]),
                ("t_read", tidx["read_id"][tsel]),
                ("t_pos", tidx["pos"][tsel]),
                ("dir", qidx["dir"][src] ^ tidx["dir"][tsel])]:
            g = np.asarray(got[name])
            np.testing.assert_array_equal(
                g[valid], want[valid], err_msg=f"{name} trial {trial}")
        np.testing.assert_array_equal(np.asarray(got["valid"]), valid)


def test_chain_anchors_pack2_bit_equal():
    """pack2 (2-operand uint32 sort) must produce exactly the unpacked
    path's valid overlap rows, including duplicate anchors and both
    strands at the 15/16-bit boundary values."""
    import jax.numpy as jnp
    import numpy as np
    from claragenomicsanalysis_tpu.ops import map_ops

    rng = np.random.default_rng(42)
    C = 4096
    nq, nt, L = (1 << 15) - 1, (1 << 15) - 1, (1 << 16)
    anchors = {
        "q_read": rng.integers(0, nq, C, dtype=np.int32),
        "t_read": rng.integers(0, nt, C, dtype=np.int32),
        "q_pos": rng.integers(0, L, C, dtype=np.int32),
        "t_pos": rng.integers(0, L, C, dtype=np.int32),
        "dir": rng.integers(0, 2, C, dtype=np.int32),
        "valid": rng.random(C) < 0.9,
    }
    # clustered anchors so real chains form
    for s in range(0, C, 8):
        anchors["q_read"][s:s+8] = anchors["q_read"][s]
        anchors["t_read"][s:s+8] = anchors["t_read"][s]
        anchors["dir"][s:s+8] = anchors["dir"][s]
        base_q = int(anchors["q_pos"][s]) % (L - 200)
        base_t = int(anchors["t_pos"][s]) % (L - 200)
        step = rng.integers(1, 12, 8).cumsum()
        anchors["q_pos"][s:s+8] = base_q + step
        tstep = rng.integers(1, 12, 8).cumsum()
        anchors["t_pos"][s:s+8] = np.where(
            anchors["dir"][s] == 0, base_t + tstep, base_t + 200 - tstep)
    # inject exact duplicates
    anchors = {k: np.concatenate([v, v[:256]]) for k, v in anchors.items()}
    ja = {k: jnp.asarray(v) for k, v in anchors.items()}
    kw = dict(k=15, min_residues=2, min_overlap_len=10,
              min_bases_per_residue=100, min_overlap_fraction_num=0,
              min_overlap_fraction_den=1, max_gap=50)
    outs = {}
    for pack2 in (False, True):
        o = map_ops.chain_anchors(ja, pack2=pack2, **kw)
        rows, nv = map_ops.compact_overlaps(o)
        outs[pack2] = np.asarray(rows)[:, :int(nv)]
    assert outs[True].shape == outs[False].shape and outs[True].size > 0
    np.testing.assert_array_equal(outs[True], outs[False])


def test_build_index_packed_sort_bit_equal():
    """The 2-operand packed index sort must reproduce the 4-operand
    stable sort's arrays exactly (incl. the frequency-filtered path)."""
    import jax.numpy as jnp
    import numpy as np
    from claragenomicsanalysis_tpu.ops import map_ops
    from claragenomicsanalysis_tpu.ops.sketch import INVALID

    rng = np.random.default_rng(7)
    B, Lk = 32, 256
    rep = rng.integers(0, 50, (B, Lk), dtype=np.uint32)  # many duplicates
    dirs = rng.integers(0, 2, (B, Lk), dtype=np.int32)
    is_min = rng.random((B, Lk)) < 0.3
    for fnum, fden in ((1, 1), (1, 100)):
        a = map_ops.build_index(jnp.asarray(rep), jnp.asarray(dirs),
                                jnp.asarray(is_min), jnp.int32(5),
                                filter_thr_num=fnum, filter_thr_den=fden,
                                with_packed=False)
        b = map_ops.build_index(jnp.asarray(rep), jnp.asarray(dirs),
                                jnp.asarray(is_min), jnp.int32(5),
                                filter_thr_num=fnum, filter_thr_den=fden,
                                with_packed=True)
        n = int(a["n_elems"])
        assert n == int(b["n_elems"])
        for f in ("rep", "read_id", "pos", "dir"):
            np.testing.assert_array_equal(
                np.asarray(a[f])[:n], np.asarray(b[f])[:n], err_msg=f)
        pk = np.asarray(b["packed"])[:n]
        np.testing.assert_array_equal((pk >> 31).astype(np.int32),
                                      np.asarray(b["dir"])[:n])
        np.testing.assert_array_equal(
            ((pk >> 16) & 0x7FFF).astype(np.int32) + 5,
            np.asarray(b["read_id"])[:n])
        np.testing.assert_array_equal((pk & 0xFFFF).astype(np.int32),
                                      np.asarray(b["pos"])[:n])


def test_similarity_batch_trailing_n_and_empty_pairs():
    """Review regression: a trailing empty pair must not truncate the last
    non-empty flank's all-ACGT scan (an 'N' as its final character leaked a
    negative code into the packed k-mer values and scored spuriously)."""
    from claragenomicsanalysis_tpu.models.mapper import (_similarity_batch,
                                                         sequence_similarity)
    got = _similarity_batch([("AACN", "AAAT"), ("", "")], 4)
    assert list(got) == [sequence_similarity("AACN", "AAAT", 4), 0.0]
    assert got[0] == 0.0  # the N k-mer must not collide with "AAAT"


def test_start_fill16_equals_gather():
    """_start_fill16 (two-level cummax forward-fill) must equal the gather
    formulation val[cummax-start-idx] on masks that cross chunk boundaries,
    including chains longer than one 2^14 chunk and chunks with no start."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from claragenomicsanalysis_tpu.ops.map_ops import _start_fill16

    rng = np.random.default_rng(7)
    CH = 1 << 14
    for C, p_start in ((512, 0.3), (CH, 0.01), (3 * CH, 0.2),
                       (4 * CH, 0.0), (2 * CH + 100, 0.00005)):
        new_chain = rng.random(C) < p_start
        new_chain[0] = True                      # invariant of _chain_scan
        val = rng.integers(0, 1 << 16, C, dtype=np.int32)
        got = np.asarray(_start_fill16(jnp.asarray(new_chain),
                                       jnp.asarray(val)))
        idx = np.arange(C)
        s = np.maximum.accumulate(np.where(new_chain, idx, 0))
        np.testing.assert_array_equal(got, val[s], err_msg=f"C={C}")


def test_sketch_packed_bit_equal():
    """The 2-bit packed transfer path (pack_reads + sketch_batch_packed)
    must reproduce sketch_batch exactly, including N bases inside reads
    and -1 tail padding."""
    import jax.numpy as jnp
    import numpy as np
    from claragenomicsanalysis_tpu.ops import sketch

    rng = np.random.default_rng(11)
    B, L = 8, 256
    reads = np.full((B, L), -1, np.int8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        n = int(rng.integers(20, L))
        row = rng.integers(0, 4, n).astype(np.int8)
        row[rng.random(n) < 0.05] = -1        # N bases inside the span
        reads[i, :n] = row
        lens[i] = n
    for k, w, h in ((15, 5, True), (7, 4, False), (17, 6, True)):
        want = sketch.sketch_batch(jnp.asarray(reads), jnp.asarray(lens),
                                   k, w, h)
        packed, nr, nc = sketch.pack_reads(reads, lens)
        npad = max(8, 1 << (max(len(nr), 1) - 1).bit_length())
        nr = np.pad(nr, (0, npad - len(nr)), constant_values=B)
        nc = np.pad(nc, (0, npad - len(nc)))
        got = sketch.sketch_batch_packed(
            jnp.asarray(packed), jnp.asarray(nr), jnp.asarray(nc),
            jnp.asarray(lens), k, w, h)
        for g, wnt, nm in zip(got, want, ("rep", "dirs", "is_min")):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(wnt),
                                          err_msg=f"k={k} w={w} {nm}")


def test_chain_anchors_pack2_rebased_ids():
    """pack2 with q_base/t_base rebasing must equal the unpacked path when
    GLOBAL read ids exceed 15 bits (the Gbp-scale case: chunk-local ids
    fit, global ids do not)."""
    import jax.numpy as jnp
    import numpy as np
    from claragenomicsanalysis_tpu.ops import map_ops

    rng = np.random.default_rng(23)
    C, nq, L = 2048, 1000, 1 << 16
    qb, tb = 70_000, 90_000          # far past 2^15
    anchors = {
        "q_read": qb + rng.integers(0, nq, C, dtype=np.int32),
        "t_read": tb + rng.integers(0, nq, C, dtype=np.int32),
        "q_pos": rng.integers(0, L, C, dtype=np.int32),
        "t_pos": rng.integers(0, L, C, dtype=np.int32),
        "dir": rng.integers(0, 2, C, dtype=np.int32),
        "valid": rng.random(C) < 0.9,
    }
    for s in range(0, C, 8):         # clustered anchors -> real chains
        for f in ("q_read", "t_read", "dir"):
            anchors[f][s:s+8] = anchors[f][s]
        for f, sgn in (("q_pos", 1), ("t_pos", 1)):
            base = int(anchors[f][s]) % (L - 200)
            anchors[f][s:s+8] = base + rng.integers(1, 12, 8).cumsum()
    ja = {k: jnp.asarray(v) for k, v in anchors.items()}
    kw = dict(k=15, min_residues=2, min_overlap_len=10,
              min_bases_per_residue=100, min_overlap_fraction_num=0,
              min_overlap_fraction_den=1, max_gap=50)
    o_ref = map_ops.chain_anchors(ja, pack2=False, **kw)
    o_p2 = map_ops.chain_anchors(ja, pack2=True, q_base=qb, t_base=tb, **kw)
    r_ref, n_ref = map_ops.compact_overlaps(o_ref)
    r_p2, n_p2 = map_ops.compact_overlaps(o_p2)
    assert int(n_ref) == int(n_p2) and int(n_ref) > 0
    np.testing.assert_array_equal(np.asarray(r_ref)[:, :int(n_ref)],
                                  np.asarray(r_p2)[:, :int(n_p2)])


def test_native_pack2_matches_numpy():
    """native/pack2.cpp must be bit-identical to pack_reads' NumPy path
    (packed words AND the row-major in-span N-position lists)."""
    import numpy as np
    pytest.importorskip("claragenomicsanalysis_tpu.io.native_pack")
    from claragenomicsanalysis_tpu.io.native_pack import pack2

    rng = np.random.default_rng(21)
    B, L = 64, 256
    mat = rng.integers(-1, 4, (B, L)).astype(np.int8)
    lens = rng.integers(0, L, B).astype(np.int32)
    r = np.clip(mat, 0, 3).astype(np.uint8).reshape(B, L // 4, 4)
    ref = (r[:, :, 0] | (r[:, :, 1] << 2) | (r[:, :, 2] << 4)
           | (r[:, :, 3] << 6))
    nn = np.argwhere((mat < 0) & (np.arange(L)[None, :] < lens[:, None]))
    p, rows, cols = pack2(mat, lens)
    assert np.array_equal(p, ref)
    assert np.array_equal(rows, nn[:, 0].astype(np.int32))
    assert np.array_equal(cols, nn[:, 1].astype(np.int32))


def _chain_out_for_test(n_valid, cap):
    """A synthetic chain-output dict with n_valid valid rows scattered
    through a cap-sized buffer (the compact_dispatch input shape)."""
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.default_rng(5)
    valid = np.zeros(cap, bool)
    valid[rng.choice(cap, n_valid, replace=False)] = True
    out = {"valid": jnp.asarray(valid)}
    from claragenomicsanalysis_tpu.models.mapper import map_ops
    for i, f in enumerate(map_ops.OVERLAP_FIELDS):
        out[f] = jnp.asarray(rng.integers(0, 1000, cap).astype(np.int32))
    return out


@pytest.mark.parametrize("n_valid,cap,hint", [
    (300, 1 << 12, 512),     # hint generous: async slice path
    (300, 1 << 12, 64),      # hint TOO SMALL: must fall back, not truncate
    (300, 1 << 12, None),    # no hint: original path
])
def test_compact_dispatch_hint_paths_bit_identical(n_valid, cap, hint):
    """The nv_hint fast path (async pre-download of a pow2-capped row
    slice) must return EXACTLY the rows of the hint-less path — including
    when the hint is too small and the materialize step must redo the
    full download rather than silently truncate."""
    from claragenomicsanalysis_tpu.models.mapper import Overlapper

    out = _chain_out_for_test(n_valid, cap)
    rows_ref = Overlapper.compact_materialize(
        Overlapper.compact_dispatch(dict(out)))
    rows_hint = Overlapper.compact_materialize(
        Overlapper.compact_dispatch(dict(out), nv_hint=hint))
    import numpy as np
    assert rows_hint.shape == rows_ref.shape == (8, n_valid)
    assert np.array_equal(rows_hint, rows_ref)


def test_compact_dispatch_hint_gather_path():
    """Same contract on the large-capacity gather path (cap > 2^21)."""
    from claragenomicsanalysis_tpu.models.mapper import Overlapper

    out = _chain_out_for_test(200, (1 << 21) + (1 << 18))
    rows_ref = Overlapper.compact_materialize(
        Overlapper.compact_dispatch(dict(out)))
    for hint in (1024, 32):       # generous and too-small
        rows_hint = Overlapper.compact_materialize(
            Overlapper.compact_dispatch(dict(out), nv_hint=hint))
        import numpy as np
        assert np.array_equal(rows_hint, rows_ref)
