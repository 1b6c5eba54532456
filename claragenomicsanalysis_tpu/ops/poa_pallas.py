"""Pallas TPU kernel for the FULL per-window POA pipeline.

The XLA formulation (ops/poa_ops.py) pays ~20-100 us of loop/gather overhead
per node step because XLA lowers per-element gathers to scalar loops and
every lax.scan/while step round-trips its carry; a POA window is ~1000
sequential tiny steps, so windows run at milliseconds each.  This kernel runs
ONE WINDOW PER GRID STEP with every phase inside the kernel:

- ALL per-node graph state (bases, coverage, degree counts, pred/aligned
  lists, topological order/rank, consensus scores) lives in SMEM, where
  dynamic scalar indexing is a ~1-cycle load/store — the pointer-chasing
  phases (graph extension, traceback, consensus walk) become plain scalar
  loops, exactly like the reference's single-thread-per-window device code
  (cudapoa/src/cudapoa_add_alignment.cuh etc. [U]);
- only the DP scores matrix is vector data: a row-major (N+1, L1) VMEM
  buffer, where the per-node predecessor-row gather is a *dynamic sublane
  slice* (single vector load — the thing XLA cannot express) and the in-row
  gap chain is a lane-axis cummax;
- the topological sort is a warm-started Gauss-Seidel level relaxation plus
  a COUNTING SORT by (level, idx) — all in SMEM (the least fixpoint equals
  the XLA Jacobi sweep's, so results are bit-identical).

Phases mirror ops/poa_ops.py EXACTLY (same canonical tie-breaks, statuses,
overflow clipping) and are asserted bit-identical by tests, in interpret
mode and on device.  Handles both consensus and MSA output (msa=True path;
models/poa.py dispatches either to this kernel).

Reference counterpart: the one-CUDA-block-per-window generatePOAKernel
pipeline (cudapoa/src/cudapoa_kernels.cu + *.cuh [U]).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import BatchSize, PoaScores
from ..core.status import StatusType
from ..utils.mathutils import round_up

NEG = -(2**30)

# SMEM node-field rows
F_BASE, F_COV, F_NPRED, F_NSUCC, F_NALIG, F_LEVEL, F_ORDER, F_RANK, \
    F_SCORE, F_BP, F_VAL, F_SINK, F_CNT, F_TMP = range(14)


def _iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _lx(row, i):
    """Scalar at lane i of a (1, C) row (vector extract)."""
    return jnp.sum(jnp.where(_iota(row.shape[-1]) == i, row, 0))


def _st(row, i, v):
    """Row with lane i set to v (masked rewrite)."""
    return jnp.where(_iota(row.shape[-1]) == i, v, row)


def build_poa_kernel(bs: BatchSize, sc: PoaScores, banded: bool,
                     msa: bool = False, skip: tuple = ()):
    """Returns (kernel_fn, dims) for pl.pallas_call.

    skip: debug-only phase ablation for perf work ("nw", "tb", "add",
    "cons") — outputs are WRONG when non-empty."""
    N = round_up(bs.padded_nodes, 8)
    P = bs.max_pred_per_node
    A = bs.max_aligned_per_node
    S = bs.max_sequences_per_poa
    L = bs.padded_seq
    L1 = round_up(L + 1, 128)
    MC = round_up(bs.max_consensus_size, 128)
    TL = N + L
    MATCH = int(sc.match_score)
    MISM = int(sc.mismatch_score)
    GAP = int(sc.gap_score)
    MAXN = bs.max_nodes_per_window
    BW = bs.band_width if banded else 0

    MCOL = round_up(N, 128)

    SCAN_QS = max(1, (L1 - 1).bit_length())

    def kernel(*refs):
        """WPG windows per grid step.  The scalar (SMEM) phases — topsort,
        traceback, graph extension, consensus — run per window; the
        graph-NW rows of all WPG windows run in LOCKSTEP, window on the
        sublane axis of one (WPG, L1) block, so the vector work amortizes
        across windows (a (1, L1) row uses 1/8 of each tile)."""
        n_in = 7
        n_out = 4 if msa else 3
        ins = refs[:n_in]
        outs = refs[n_in: n_in + n_out]
        scratch = refs[n_in + n_out:]
        pg = scratch[-2]       # (WPG, L1) pred-max assembly buffer
        smat2 = scratch[-1]    # (N+1, WPG, L1) scores, window on sublanes
        wpg = scratch[0].shape[0]
        wins = [window_phases(wi,
                              [r.at[wi] for r in ins],
                              [r.at[wi] for r in outs],
                              [r.at[wi] for r in scratch[:-2]], smat2)
                for wi in range(wpg)]

        jj = _iota(L1)

        def sel_vec(vals):
            """(wpg, 1) vector holding per-window scalars on sublanes."""
            si = jax.lax.broadcasted_iota(jnp.int32, (wpg, 1), 0)
            acc = jnp.zeros((wpg, 1), jnp.int32)
            for k, v in enumerate(vals):
                acc = jnp.where(si == k, v, acc)
            return acc

        def graph_nw_lockstep(s, ncs, slens, acts):
            seq8 = ins[0][:, s, :]                    # (wpg, L1) shifted rows
            slen8 = sel_vec(slens)
            seq_ok = (jj >= 1) & (jj <= slen8)
            max_nc = jnp.int32(0)
            for nc, a in zip(ncs, acts):
                max_nc = jnp.maximum(max_nc, jnp.where(a, nc, 0))
            row0 = jnp.where(jj <= L, jj * GAP, NEG)
            smat2[pl.ds(0, 1)] = jnp.broadcast_to(row0[:, None, :],
                                                  (1, wpg, L1))
            if BW > 0:
                nc8 = sel_vec(ncs)

            def body(r, _):
                # per-window scalar part: pred-max rows assembled into pg
                bases = []
                for wi, w in enumerate(wins):
                    nf_w, pred_w = w["nf"], w["pred_s"]
                    u = jnp.clip(nf_w[F_ORDER, jnp.clip(r, 0, N - 1)],
                                 0, N - 1)
                    npred_u = nf_w[F_NPRED, u]
                    bases.append(nf_w[F_BASE, u])

                    def pred_step(p, pmax, nf_w=nf_w, pred_w=pred_w, u=u,
                                  wi=wi):
                        pi = pred_w[p, u]
                        pr = nf_w[F_RANK, jnp.clip(pi, 0, N - 1)] + 1
                        prow = smat2[pl.ds(jnp.clip(pr, 0, N), 1), wi, :]
                        return jnp.maximum(pmax, prow)

                    pmax0 = jnp.full((1, L1), NEG, jnp.int32)
                    pmax = jax.lax.fori_loop(0, npred_u, pred_step, pmax0)
                    pmax = jnp.where(npred_u == 0,
                                     smat2[pl.ds(0, 1), wi, :], pmax)
                    pg[pl.ds(wi, 1), :] = pmax

                # lockstep vector part on (wpg, L1) blocks
                pmax8 = pg[...]
                base8 = sel_vec(bases)
                sub = jnp.where((seq8 == base8) & (seq8 >= 0), MATCH, MISM)
                sub = jnp.where(seq_ok, sub, MISM)
                # vals[0] = pmax[0] + GAP falls out naturally: the rolled
                # lane 0 wraps lane L1-1, which is always NEG (beyond slen)
                pms = pltpu.roll(pmax8, shift=1, axis=1)   # pmax[j-1]
                vals = jnp.maximum(pms + sub, pmax8 + GAP)
                vals = jnp.where(jj <= slen8, vals, NEG)
                if BW > 0:
                    c = ((r + 1) * slen8) // (nc8 + 1)
                    in_band = jnp.abs(jj - c) <= BW // 2
                    vals = jnp.where(in_band, vals, NEG)
                acc = vals - jj * GAP
                for q in range(SCAN_QS):
                    sh = 1 << q
                    acc = jnp.maximum(
                        acc, jnp.where(jj >= sh,
                                       pltpu.roll(acc, shift=sh, axis=1),
                                       NEG))
                row = acc + jj * GAP
                if BW > 0:
                    row = jnp.where(in_band, row, NEG)
                row = jnp.where(jj <= slen8, row, NEG)
                smat2[pl.ds(r + 1, 1)] = row[None]
                return ()

            jax.lax.fori_loop(0, max_nc, body, ())

        # ---------------------------------------------------- window loop
        st_nc = [w["init"]() for w in wins]
        for s in range(1, S):
            acts, oks, slens = [], [], []
            for wi, w in enumerate(wins):
                nc, st = st_nc[wi]
                slen = w["slen"](s)
                active = w["active"](s, st)
                ok = jax.lax.cond(
                    active, lambda _, w=w, nc=nc: w["topsort"](nc),
                    lambda _: jnp.bool_(True), ())
                acts.append(active)
                oks.append(ok)
                slens.append(slen)
            if "nw" not in skip:
                graph_nw_lockstep(s, [nc for nc, _ in st_nc], slens, acts)
            for wi, w in enumerate(wins):
                def do_seq(nc_st, w=w, s=s, slen=slens[wi], ok=oks[wi]):
                    nc, st = nc_st
                    if "tb" not in skip:
                        k0, band_ok = w["traceback"](s, nc, slen)
                    else:
                        k0, band_ok = jnp.int32(TL), jnp.bool_(True)

                    def do_add(nc_st):
                        return w["add"](s, nc_st[0], nc_st[1], k0, slen)

                    def band_fail(nc_st):
                        return nc_st[0], jnp.int32(
                            StatusType.EXCEEDED_BAND_WIDTH)

                    if "add" in skip:
                        nc2, st2 = nc, st
                    else:
                        nc2, st2 = jax.lax.cond(band_ok, do_add, band_fail,
                                                (nc, st))
                    # precedence mirrors models/poa.py: band failure wins,
                    # then topsort non-convergence, then add-phase statuses
                    st2 = jnp.where(
                        band_ok & ~ok,
                        jnp.int32(StatusType.LOOP_COUNT_EXCEEDED_UPPER_BOUND),
                        st2)
                    return nc2, st2

                st_nc[wi] = jax.lax.cond(acts[wi], do_seq, lambda x: x,
                                         st_nc[wi])
        for wi, w in enumerate(wins):
            w["final"](*st_nc[wi])

    def window_phases(wi, ins_w, outs_w, scratch_w, smat2):
        """Per-window phase closures.  `wi` is a static sub-batch index;
        the window's score rows live at sublane wi of the shared smat2."""
        (seqsh_ref, seq_s, w_s, meta_s, base0_s, cov0_s, ew0_s) = ins_w
        if msa:
            codes_ref, covs_ref, meta_out_ref, rows_ref = outs_w
            nf, pred_s, predw_s, alig_s, pn_s, pp_s, paths_s = scratch_w
        else:
            codes_ref, covs_ref, meta_out_ref = outs_w
            nf, pred_s, predw_s, alig_s, pn_s, pp_s = scratch_w
        n_seqs = meta_s[0, S]
        len0 = meta_s[0, 0]

        def smat_row(i):
            return smat2[pl.ds(i, 1), wi, :]

        # ---------------------------------------------------------- init
        def init():
            if msa:
                def paths_init(i, _):
                    for s in range(S):
                        paths_s[s, i] = jnp.where((s == 0) & (i < len0),
                                                  i, -1)
                    return ()
                jax.lax.fori_loop(0, L, paths_init, ())

            def init_body(u, _):
                a = u < len0
                nf[F_BASE, u] = jnp.where(a, base0_s[0, u], -1)
                nf[F_COV, u] = jnp.where(a, cov0_s[0, u], 0)
                nf[F_NPRED, u] = jnp.where(a & (u > 0), 1, 0)
                nf[F_NSUCC, u] = jnp.where(a & (u < len0 - 1), 1, 0)
                nf[F_NALIG, u] = 0
                nf[F_LEVEL, u] = jnp.where(a, u, 0)
                nf[F_ORDER, u] = u
                nf[F_RANK, u] = u
                pred_s[0, u] = jnp.where(a & (u > 0), u - 1, -1)
                predw_s[0, u] = jnp.where(a & (u > 0), ew0_s[0, u], 0)
                for p in range(1, P):
                    pred_s[p, u] = -1
                    predw_s[p, u] = 0
                for q in range(A):
                    alig_s[q, u] = -1
                return ()

            jax.lax.fori_loop(0, N, init_body, ())
            status0 = jnp.where(
                len0 > MAXN,
                jnp.int32(StatusType.NODE_COUNT_EXCEEDED_MAXIMUM_GRAPH_SIZE),
                jnp.int32(StatusType.SUCCESS))
            return len0, status0

        # ------------------------------------------------------- topsort
        def topsort(node_count):
            """Warm Gauss-Seidel level relaxation + counting sort by
            (level, idx).  Writes F_LEVEL/F_ORDER/F_RANK; returns ok.

            All loops run [0, node_count), not [0, N): order/rank/levels of
            never-created nodes are unread (every pred/order access is
            masked by npred/node_count), and the trim halves the scalar
            cost of the per-sequence re-sort."""
            # a DAG's levels stay < node_count; the clamp only matters for
            # the (defensive, non-DAG) divergence path, keeping CNT accesses
            # inside the zeroed range
            lv_hi = jnp.maximum(node_count - 1, 0)

            def sweep_body(u, changed):
                npred_u = nf[F_NPRED, u]

                def pstep(p, best):
                    pi = pred_s[p, u]
                    return jnp.maximum(
                        best, nf[F_LEVEL, jnp.clip(pi, 0, N - 1)])

                best = jax.lax.fori_loop(0, npred_u, pstep, jnp.int32(-1))
                new = jnp.maximum(best + 1, 0)
                old = nf[F_LEVEL, u]
                nf[F_LEVEL, u] = new
                return changed | (new != old)

            def sweeps_cond(c):
                return c[0] & (c[1] < N + 2)

            def sweeps_body(c):
                _, it = c
                ch = jax.lax.fori_loop(0, node_count, sweep_body,
                                       jnp.bool_(False))
                return ch, it + 1

            changed, _ = jax.lax.while_loop(
                sweeps_cond, sweeps_body, (jnp.bool_(True), jnp.int32(0)))
            ok = ~changed

            # counting sort by (level, idx): stable, ascending
            def zero_cnt(b, _):
                nf[F_CNT, b] = 0
                return ()
            jax.lax.fori_loop(0, node_count, zero_cnt, ())

            def count(u, _):
                lv = jnp.clip(nf[F_LEVEL, u], 0, lv_hi)
                nf[F_CNT, lv] = nf[F_CNT, lv] + 1
                return ()
            jax.lax.fori_loop(0, node_count, count, ())

            def prefix(b, off):
                c = nf[F_CNT, b]
                nf[F_CNT, b] = off
                return off + c
            jax.lax.fori_loop(0, node_count, prefix, jnp.int32(0))

            def place(u, _):
                lv = jnp.clip(nf[F_LEVEL, u], 0, lv_hi)
                r = nf[F_CNT, lv]
                nf[F_CNT, lv] = r + 1
                nf[F_ORDER, r] = u
                nf[F_RANK, u] = r
                return ()
            jax.lax.fori_loop(0, node_count, place, ())
            return ok

        # ------------------------------------------------------- graph NW
        jj = _iota(L1)

        # ------------------------------------------------------ traceback
        def traceback(s, node_count, slen):
            """Fills pn_s/pp_s; returns (k, band_ok)."""
            def find_end(r, c):
                # sinks are rare (1-3 per graph): the score lane-extract
                # runs only on the sink branch
                u = nf[F_ORDER, r]
                is_sink = nf[F_NSUCC, u] == 0

                def at_sink(c):
                    vmax, first = c
                    v = _lx(smat_row(r + 1), slen)
                    better = v > vmax
                    first = jnp.where(better, r,
                                      jnp.where((v == vmax) & (r < first),
                                                r, first))
                    vmax = jnp.where(better, v, vmax)
                    return vmax, first

                return jax.lax.cond(is_sink, at_sink, lambda c: c, c)
            vmax, first = jax.lax.fori_loop(
                0, node_count, find_end, (jnp.int32(NEG), jnp.int32(2**30)))
            band_ok = vmax > NEG // 2
            r_end = jnp.where(node_count > 0, first, -1)

            def cond(c):
                r, j, k = c
                return ((r >= 0) | (j > 0)) & (k > 0)

            def body(c):
                r, j, k = c
                u = jnp.where((r >= 0) & (r < N),
                              nf[F_ORDER, jnp.clip(r, 0, N - 1)], -1)
                uc = jnp.clip(u, 0, N - 1)
                here_row = smat_row(jnp.clip(r + 1, 0, N))
                here = _lx(here_row, j)
                sc_ch = seq_s[s, jnp.clip(j - 1, 0, L - 1)]
                sc_ch = jnp.where((j >= 1) & (j <= L), sc_ch, -1)
                base_u = jnp.where(u >= 0, nf[F_BASE, uc], -2)
                sub = jnp.where((sc_ch == base_u) & (sc_ch >= 0), MATCH, MISM)
                npred_u = jnp.where(u >= 0, nf[F_NPRED, uc], 0)
                at_virtual = r < 0

                # probe pred slots unconditionally: the extracts of all
                # slots pipeline on the vector unit, which beats wrapping
                # them in scalar branches (measured)
                # tiered probes: first slots unrolled (their lane-extracts
                # pipeline on the vector unit), tail slots of deep-P
                # configs behind a rarely-taken branch
                def probe_slots(lo, hi, carry):
                    any_diag, any_vert, sel_d, sel_v = carry
                    for p in range(lo, hi):
                        pi = pred_s[p, uc]
                        slot_ok = ((p < npred_u)
                                   | ((p == 0) & (npred_u == 0)))
                        pr = jnp.where((p == 0) & (npred_u == 0), 0,
                                       nf[F_RANK, jnp.clip(pi, 0, N - 1)]
                                       + 1)
                        prow = smat_row(jnp.clip(pr, 0, N))
                        pv_jm1 = _lx(prow, jnp.clip(j - 1, 0, L1 - 1))
                        pv_j = _lx(prow, j)
                        d_ok = slot_ok & (j > 0) & (pv_jm1 + sub == here)
                        v_ok = slot_ok & (pv_j + GAP == here)
                        sel_d = jnp.where(d_ok & ~any_diag, pr - 1, sel_d)
                        sel_v = jnp.where(v_ok & ~any_vert, pr - 1, sel_v)
                        any_diag = any_diag | d_ok
                        any_vert = any_vert | v_ok
                    return any_diag, any_vert, sel_d, sel_v

                T0 = min(P, 4)
                carry = probe_slots(0, T0, (jnp.bool_(False),
                                            jnp.bool_(False),
                                            jnp.int32(0), jnp.int32(0)))
                if P > T0:
                    carry = jax.lax.cond(
                        npred_u > T0, functools.partial(probe_slots, T0, P),
                        lambda c: c, carry)
                any_diag, any_vert, sel_d, sel_v = carry
                any_diag = any_diag & ~at_virtual
                any_vert = any_vert & ~at_virtual

                move = jnp.where(at_virtual, 3,
                                 jnp.where(any_diag, 0,
                                           jnp.where(any_vert, 1, 3)))
                new_r = jnp.where(move == 0, sel_d,
                                  jnp.where(move == 1, sel_v, r))
                new_j = jnp.where((move == 0) | (move == 3), j - 1, j)
                k2 = k - 1
                pn_s[0, k2] = jnp.where(move == 3, -1, u)
                pp_s[0, k2] = jnp.where(move == 1, -1, j - 1)
                return new_r, new_j, k2

            _, _, k = jax.lax.while_loop(
                cond, body, (r_end, slen, jnp.int32(TL)))
            return k, band_ok

        # -------------------------------------------------- add alignment
        def add_alignment(s, node_count_in, status_in, k0, slen):
            """Graph extension, organized around scalar BRANCHES: the common
            step (matched base, existing edge) runs ~25 SMEM ops; candidate
            scans, node creation, clique linking and sorted edge insertion
            only execute on their (error-rate-frequency) branches.  Ref-write
            order inside each branch matches the masked formulation, so
            results are bit-identical to ops/poa_ops.add_alignment."""
            def body(j, c):
                node = pn_s[0, j]
                pos = pp_s[0, j]
                pc = jnp.clip(pos, 0, L - 1)
                b = seq_s[s, pc]
                node_c = jnp.clip(node, 0, N - 1)
                base_n = nf[F_BASE, node_c]
                # the single fused fast-path predicate: a consumed column
                # whose base matches the aligned node (the overwhelmingly
                # common step) takes ONE branch into finish()
                fast = (pos >= 0) & (base_n == b) & (b >= 0) & (node >= 0)

                def finish(target, target_c, status, prev, prev_pos):
                    """Coverage/MSA update + the prev->target edge.  Shared
                    tail of the fast and slow paths; returns status."""
                    w = w_s[s, pc]
                    nf[F_COV, target_c] = nf[F_COV, target_c] + w
                    if msa:
                        paths_s[s, pc] = target

                    if "edge" in skip:        # ablation only: no edge work
                        return status

                    def do_edge(status):
                        ppc = jnp.clip(prev_pos, 0, L - 1)
                        wp = jnp.where(prev_pos >= 0, w_s[s, ppc], 0)
                        ew = jnp.minimum(wp, w)
                        prev_c = jnp.clip(prev, 0, N - 1)
                        npred_t = nf[F_NPRED, target_c]

                        # tiered scan: first 4 slots unrolled (typical
                        # nodes have 1-2 preds; unrolled independent SMEM
                        # ops pipeline well), deep-P tails behind a branch
                        def scan_slots(lo, hi, c):
                            found, slot = c
                            for p in range(lo, hi):
                                hit = ((npred_t > p)
                                       & (pred_s[p, target_c] == prev_c))
                                slot = jnp.where(hit & ~found, p, slot)
                                found = found | hit
                            return found, slot

                        T0 = min(P, 4)
                        found, slot = scan_slots(
                            0, T0, (jnp.bool_(False), jnp.int32(0)))
                        if P > T0:
                            found, slot = jax.lax.cond(
                                npred_t > T0,
                                functools.partial(scan_slots, T0, P),
                                lambda c: c, (found, slot))

                        # existing-edge weight bump as a MASKED RMW (adds 0
                        # at slot 0 when not found) — cheaper than a branch
                        predw_s[slot, target_c] = (
                            predw_s[slot, target_c]
                            + jnp.where(found, ew, 0))

                        def insert(st):
                            def do_ins(st):
                                pvals = [pred_s[p, target_c]
                                         for p in range(P)]
                                wvals = [predw_s[p, target_c]
                                         for p in range(P)]
                                pos_ins = jnp.int32(0)
                                for p in range(P):
                                    pos_ins = pos_ins + jnp.where(
                                        (p < npred_t)
                                        & (pvals[p] < prev_c), 1, 0)
                                for p in range(P):
                                    new_p = jnp.where(
                                        p < pos_ins, pvals[p],
                                        jnp.where(p == pos_ins, prev_c,
                                                  pvals[p - 1] if p >= 1
                                                  else jnp.int32(-1)))
                                    new_w = jnp.where(
                                        p < pos_ins, wvals[p],
                                        jnp.where(p == pos_ins, ew,
                                                  wvals[p - 1] if p >= 1
                                                  else jnp.int32(0)))
                                    pred_s[p, target_c] = new_p
                                    predw_s[p, target_c] = new_w
                                nf[F_NPRED, target_c] = npred_t + 1
                                nf[F_NSUCC, prev_c] = (
                                    nf[F_NSUCC, prev_c] + 1)
                                return st

                            def edge_overflow(st):
                                return jnp.where(
                                    st == StatusType.SUCCESS,
                                    jnp.int32(
                                        StatusType.
                                        EDGE_COUNT_EXCEEDED_MAXIMUM_GRAPH_SIZE),
                                    st)

                            return jax.lax.cond(npred_t >= P, edge_overflow,
                                                do_ins, st)

                        return jax.lax.cond(found, lambda st: st, insert,
                                            status)

                    return jax.lax.cond(prev >= 0, do_edge,
                                        lambda st: st, status)

                def fast_step(c):
                    node_count, status, prev, prev_pos = c
                    status = finish(node, node_c, status, prev, prev_pos)
                    return node_count, status, node, pos

                def other(c):
                    # non-fast: deletion/inert no-ops, or the slow path
                    # (mismatch / insertion / new node)
                    if "slow" in skip:        # ablation only
                        return c
                    return jax.lax.cond(pos >= 0, slow_step, lambda c: c, c)

                def slow_step(c):
                    node_count, status, prev, prev_pos = c
                    nalig_n = nf[F_NALIG, node_c]

                    def scan_cands(_):
                        any_c = jnp.bool_(False)
                        sel = jnp.int32(-1)
                        for a in range(A):
                            ca = alig_s[a, node_c]
                            okc = (a < nalig_n) & (b >= 0)
                            mb = jnp.where(
                                okc & (ca >= 0),
                                nf[F_BASE, jnp.clip(ca, 0, N - 1)], -2)
                            hit = okc & (mb == b)
                            sel = jnp.where(hit & ~any_c, ca, sel)
                            any_c = any_c | hit
                        return any_c, sel

                    any_cand, cand_sel = jax.lax.cond(
                        node < 0,
                        lambda _: (jnp.bool_(False), jnp.int32(-1)),
                        scan_cands, ())

                    need_new = ~((node >= 0) & any_cand)
                    new_id = jnp.clip(node_count, 0, N - 1)
                    overflow_node = need_new & (node_count >= MAXN)
                    link = need_new & (node >= 0)
                    group_sz = nalig_n + 1
                    overflow_clique = link & (group_sz > A)
                    target = jnp.where(
                        (node >= 0) & any_cand, cand_sel, new_id)

                    @pl.when(need_new)
                    def _():
                        nf[F_BASE, new_id] = b

                    @pl.when(link)
                    def _():
                        # new node's aligned list = sorted(node_c +
                        # cands); append new_id to each member's list
                        cands = [alig_s[a, node_c] for a in range(A)]
                        memv = [jnp.where(a < nalig_n, cands[a],
                                          jnp.int32(2**30))
                                for a in range(A)]
                        carry = node_c
                        for a in range(A):
                            lo = jnp.minimum(carry, memv[a])
                            carry = jnp.maximum(carry, memv[a])
                            alig_s[a, new_id] = jnp.where(
                                lo >= 2**30, -1, lo)
                        nf[F_NALIG, new_id] = jnp.minimum(group_sz, A)
                        members = [node_c] + cands
                        m_ok = [jnp.bool_(True)] + [a < nalig_n
                                                    for a in range(A)]
                        for mi in range(A + 1):
                            mc = jnp.clip(members[mi], 0, N - 1)
                            mn = nf[F_NALIG, mc]
                            do = (m_ok[mi] & (members[mi] >= 0)
                                  & (mn < A))
                            for a in range(A):
                                alig_s[a, mc] = jnp.where(
                                    do & (mn == a), new_id,
                                    alig_s[a, mc])
                            nf[F_NALIG, mc] = jnp.where(
                                do, mn + 1, nf[F_NALIG, mc])

                    node_count = jnp.where(need_new & ~overflow_node,
                                           node_count + 1, node_count)
                    status = jnp.where(
                        (status == StatusType.SUCCESS)
                        & (overflow_node | overflow_clique),
                        jnp.int32(StatusType.
                                  NODE_COUNT_EXCEEDED_MAXIMUM_GRAPH_SIZE),
                        status)
                    status = finish(target, jnp.clip(target, 0, N - 1),
                                    status, prev, prev_pos)
                    return node_count, status, target, pos

                return jax.lax.cond(fast, fast_step, other, c)

            node_count, status, _, _ = jax.lax.fori_loop(
                k0, TL, body,
                (node_count_in, status_in, jnp.int32(-1), jnp.int32(-1)))
            return node_count, status

        # --------------------------------------------- kernel-facing hooks
        def slen_of(s):
            return meta_s[0, s]

        def active_of(s, status):
            return (s < n_seqs) & (status == StatusType.SUCCESS)

        # ------------------------------------------------------- consensus
        def final_body(node_count, status):
            _ = topsort(node_count)

            def cons_body(r, _):
                u = nf[F_ORDER, r]
                npred_u = nf[F_NPRED, u]
                wmax = jnp.int32(NEG)
                for p in range(P):
                    wmax = jnp.maximum(
                        wmax, jnp.where(p < npred_u, predw_s[p, u], NEG))
                smax = jnp.int32(NEG)
                for p in range(P):
                    ps = nf[F_SCORE, jnp.clip(pred_s[p, u], 0, N - 1)]
                    smax = jnp.maximum(
                        smax, jnp.where((p < npred_u) & (predw_s[p, u] == wmax),
                                        ps, NEG))
                bp = jnp.int32(-1)
                found = jnp.bool_(False)
                for p in range(P):
                    pi = pred_s[p, u]
                    ps = nf[F_SCORE, jnp.clip(pi, 0, N - 1)]
                    hit = ((p < npred_u) & (predw_s[p, u] == wmax)
                           & (ps == smax) & ~found)
                    bp = jnp.where(hit, pi, bp)
                    found = found | hit
                has = npred_u > 0
                nf[F_SCORE, u] = jnp.where(has, wmax + smax, 0)
                nf[F_BP, u] = bp
                return ()

            def cons_init(u, _):
                nf[F_SCORE, u] = NEG
                nf[F_BP, u] = -1
                return ()

            jax.lax.fori_loop(0, N, cons_init, ())
            if "cons" not in skip:
                jax.lax.fori_loop(0, node_count, cons_body, ())

            # end node: max score, tie -> smallest rank
            def find_best(u, c):
                smax, end = c
                act = u < node_count
                v = jnp.where(act, nf[F_SCORE, u], NEG)
                rk = nf[F_RANK, u]
                better = v > smax
                tie = (v == smax) & (rk < jnp.where(
                    end >= 0, nf[F_RANK, jnp.clip(end, 0, N - 1)],
                    jnp.int32(2**30)))
                end = jnp.where(act & (better | tie), u, end)
                smax = jnp.where(act & better, v, smax)
                return smax, end

            _, end = jax.lax.fori_loop(0, N, find_best,
                                       (jnp.int32(NEG), jnp.int32(-1)))

            def bt_cond(c):
                u, k, _, _ = c
                return (u >= 0) & (k > 0)

            def bt_body(c):
                u, k, codes, covs = c
                uc = jnp.clip(u, 0, N - 1)
                codes = _st(codes, k - 1, nf[F_BASE, uc])
                covs = _st(covs, k - 1, nf[F_COV, uc])
                return nf[F_BP, uc], k - 1, codes, covs

            codes0 = jnp.full((1, MC), -1, jnp.int32)
            covs0 = jnp.zeros((1, MC), jnp.int32)
            u0 = jnp.where(node_count > 0, end, jnp.int32(-1))
            _, kk, codes, covs = jax.lax.while_loop(
                bt_cond, bt_body, (u0, jnp.int32(MC), codes0, covs0))
            length = MC - kk
            codes = pltpu.roll(codes, shift=MC - kk, axis=1)
            covs = pltpu.roll(covs, shift=MC - kk, axis=1)
            mcl = _iota(MC)
            codes_ref[0] = jnp.where(mcl < length, codes, -1)[0]
            covs_ref[0] = jnp.where(mcl < length, covs, 0)[0]

            # ------------------------------------------------------------ MSA
            n_cols = jnp.int32(0)
            if msa:
                # columns (F_TMP): aligned cliques share a column; column =
                # 1 + max over all group members' preds' columns, assigned at
                # the first member in topological order (poa_ops.msa_columns)
                def col_init(u, _):
                    nf[F_TMP, u] = -1
                    return ()
                jax.lax.fori_loop(0, N, col_init, ())

                def col_body(r, ncols):
                    u = nf[F_ORDER, r]

                    def assign(ncols):
                        nalig_u = nf[F_NALIG, u]
                        members = [u] + [alig_s[a, u] for a in range(A)]
                        m_ok = [jnp.bool_(True)] + [a < nalig_u
                                                    for a in range(A)]
                        c = jnp.int32(-1)
                        for mi in range(A + 1):
                            mc = jnp.clip(members[mi], 0, N - 1)
                            np_m = jnp.where(m_ok[mi], nf[F_NPRED, mc], 0)
                            for p in range(P):
                                pc = nf[F_TMP,
                                        jnp.clip(pred_s[p, mc], 0, N - 1)]
                                c = jnp.maximum(c, jnp.where(p < np_m, pc, -1))
                        c = c + 1
                        for mi in range(A + 1):
                            mc = jnp.clip(members[mi], 0, N - 1)
                            do = m_ok[mi] & (members[mi] >= 0)
                            nf[F_TMP, mc] = jnp.where(do, c, nf[F_TMP, mc])
                        return jnp.maximum(ncols, c + 1)

                    return jax.lax.cond(nf[F_TMP, u] < 0, assign,
                                        lambda n: n, ncols)

                n_cols = jax.lax.fori_loop(0, node_count, col_body, jnp.int32(0))

                for s in range(S):
                    def row_body(i, row, s=s):
                        u = paths_s[s, i]

                        def put(row):
                            uc = jnp.clip(u, 0, N - 1)
                            c = jnp.clip(nf[F_TMP, uc], 0, MCOL - 1)
                            return _st(row, c, nf[F_BASE, uc])

                        return jax.lax.cond(u >= 0, put, lambda r: r, row)

                    row = jax.lax.fori_loop(
                        0, L, row_body, jnp.full((1, MCOL), -1, jnp.int32))
                    rows_ref[s] = row[0]

            meta_out = jnp.zeros((1, 128), jnp.int32)
            meta_out = _st(meta_out, 0, length)
            meta_out = _st(meta_out, 1, status)
            meta_out = _st(meta_out, 2, node_count)
            meta_out = _st(meta_out, 3, n_cols)
            meta_out_ref[0] = meta_out[0]

        return dict(nf=nf, pred_s=pred_s, init=init, slen=slen_of,
                    active=active_of, topsort=topsort, traceback=traceback,
                    add=add_alignment, final=final_body)

    dims = dict(N=N, P=P, A=A, S=S, L=L, L1=L1, MC=MC, TL=TL)
    return kernel, dims


def smem_bytes_per_window(bs: BatchSize, msa: bool = False) -> int:
    """SMEM bytes one window's scratch + double-buffered scalar inputs
    need inside the kernel.  models/poa uses this to route window plans
    that cannot fit the ~1 MiB/core SMEM to the XLA backend."""
    N = round_up(bs.padded_nodes, 8)
    L = bs.padded_seq
    NS = round_up(N, 128)
    TLS = round_up(N + L, 128)
    S8 = round_up(bs.max_sequences_per_poa, 8)
    L128 = round_up(L, 128)
    N128 = round_up(N, 128)
    return 4 * (
        16 * NS + 2 * round_up(bs.max_pred_per_node, 8) * NS
        + round_up(bs.max_aligned_per_node, 8) * NS
        + 2 * TLS + (S8 * L128 if msa else 0)
        + 2 * (2 * S8 * L128 + 128 + 3 * N128))  # inputs, 2x buffered


@functools.partial(jax.jit, static_argnames=("bs", "sc", "banded", "msa",
                                             "interpret", "skip", "WPG"))
def poa_batch_pallas(seqs, weights, lens, n_seqs, bs: BatchSize,
                     sc: PoaScores, banded: bool = False, msa: bool = False,
                     interpret: bool = False, skip: tuple = (),
                     WPG: int = 8):
    """Consensus (+ optional MSA) for a batch of windows.  Same contract as
    the XLA program in models/poa.py: returns (codes (W, MCp),
    covs (W, MCp), length (W,), rows (W, S, MCOLp), n_cols (W,),
    status (W,))."""
    W = seqs.shape[0]
    if interpret:
        # interpret mode is the semantics check; default to WPG=1 to keep
        # interpreted traces small (WPG=8 is a device throughput choice,
        # not a semantic one).  Tests pass WPG=2 explicitly once to cover
        # the lockstep multi-window path.
        WPG = min(WPG, 1) if WPG >= 8 else WPG
    if bs.max_sequences_per_poa >= 128:
        # n_seqs lives at lane S of the 128-lane meta row; S >= 128 would
        # silently drop the .at[] set and the kernel would read garbage.
        raise ValueError(
            f"max_sequences_per_poa={bs.max_sequences_per_poa} >= 128 is not "
            "supported by the Pallas POA kernel (meta row is one 128-lane "
            "vector); use the XLA backend for wider windows")
    kernel, d = build_poa_kernel(bs, sc, banded, msa, skip)
    N, S, L, L1, MC = d["N"], d["S"], d["L"], d["L1"], d["MC"]
    MCOL = round_up(N, 128)

    # Scale the window sub-batch down until both on-chip memories fit:
    # - VMEM (~16 MB/core): scores scratch (N+1, WPG, L1) int32;
    # - SMEM (1 MB/core): the per-window node-field/pred/alig/path scratch
    #   plus the double-buffered scalar input windows.
    smem_per_win = smem_bytes_per_window(bs, msa)
    while WPG > 1 and (WPG * (N + 1) * L1 * 4 > 12 * 2**20
                       or WPG * smem_per_win > 900 * 2**10):
        WPG //= 2
    if smem_per_win > 900 * 2**10:
        raise ValueError(
            f"POA window plan needs {smem_per_win >> 10} KiB of SMEM "
            "(> the ~1 MiB/core capacity) — shrink BatchSize "
            "(max_nodes_per_window / max_pred_per_node / "
            "max_sequences_per_poa) or use the XLA backend")

    # VMEM: shifted lane-oriented char rows (lane j holds seq[j-1])
    pad1 = jnp.full((W, S, 1), -1, jnp.int32)
    seqsh = jnp.concatenate([pad1, seqs.astype(jnp.int32)], axis=2)
    seqsh = jnp.pad(seqsh, ((0, 0), (0, 0), (0, L1 - L - 1)),
                    constant_values=-1)
    meta = jnp.zeros((W, 1, 128), jnp.int32)
    meta = meta.at[:, 0, :S].set(lens.astype(jnp.int32))
    meta = meta.at[:, 0, S].set(n_seqs.astype(jnp.int32))

    # Per-window sub-refs (block.at[wi]) must slice on aligned extents:
    # sublane dims 8-aligned, lane dims 128-aligned (Mosaic tiles storage
    # to (8,128) and rejects unaligned memref slices).  Kernel reads stay
    # within the logical S/L/N so tail padding is never observed.
    N128 = round_up(N, 128)
    S8 = round_up(S, 8)
    L128 = round_up(L, 128)

    def to_n(x, fill):
        x = x.astype(jnp.int32)
        if L >= N128:
            return x[:, :N128][:, None, :]
        return jnp.pad(x, ((0, 0), (0, N128 - L)),
                       constant_values=fill)[:, None, :]

    base0 = to_n(seqs[:, 0, :], -1)
    cov0 = to_n(weights[:, 0, :], 0)
    w0 = weights[:, 0, :].astype(jnp.int32)
    w0m = jnp.concatenate([w0[:, :1], jnp.minimum(w0[:, 1:], w0[:, :-1])],
                          axis=1)
    ew0 = to_n(w0m, 0)

    # WPG independent windows per grid step: their traced op streams are
    # dependency-free, letting the scheduler overlap one window's scalar
    # (SMEM) phases with another's vector (VMEM) work
    Wp = round_up(W, WPG)

    def padw(x):
        return jnp.pad(x, ((0, Wp - W),) + ((0, 0),) * (x.ndim - 1))

    def vspec(*shape):
        return pl.BlockSpec((WPG,) + shape,
                            lambda w: (w,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def sspec(*shape):
        return pl.BlockSpec((WPG,) + shape,
                            lambda w: (w,) + (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    def pad_s(x):
        return jnp.pad(x, ((0, 0), (0, S8 - S)) + ((0, 0),) * (x.ndim - 2))

    def pad_l(x, fill=0):
        return jnp.pad(x, ((0, 0), (0, 0), (0, L128 - L)),
                       constant_values=fill)

    out_specs = [vspec(1, MC), vspec(1, MC), vspec(1, 128)]
    out_shape = [jax.ShapeDtypeStruct((Wp, 1, MC), jnp.int32),
                 jax.ShapeDtypeStruct((Wp, 1, MC), jnp.int32),
                 jax.ShapeDtypeStruct((Wp, 1, 128), jnp.int32)]
    # sub-ref slicing (scratch[i].at[wi]) requires sublane dims 8-aligned
    # and lane dims 128-aligned; kernel loops stay at the logical N/TL
    NS = round_up(N, 128)
    TLS = round_up(d["TL"], 128)
    scratch = [
        pltpu.SMEM((WPG, 16, NS), jnp.int32),                  # node fields
        pltpu.SMEM((WPG, round_up(d["P"], 8), NS), jnp.int32),  # pred
        pltpu.SMEM((WPG, round_up(d["P"], 8), NS), jnp.int32),  # predw
        pltpu.SMEM((WPG, round_up(d["A"], 8), NS), jnp.int32),  # alig
        pltpu.SMEM((WPG, 1, TLS), jnp.int32),                  # path nodes
        pltpu.SMEM((WPG, 1, TLS), jnp.int32),                  # path posns
    ]
    if msa:
        out_specs.append(vspec(S8, MCOL))
        out_shape.append(jax.ShapeDtypeStruct((Wp, S8, MCOL), jnp.int32))
        scratch.append(pltpu.SMEM((WPG, S8, L128), jnp.int32))  # paths
    scratch += [
        pltpu.VMEM((WPG, L1), jnp.int32),                # pred-max assembly
        # scores: window sub-batch on the SUBLANE axis so the lockstep NW
        # row ops run on full (WPG, L1) tiles
        pltpu.VMEM((round_up(N + 1, 8), WPG, L1), jnp.int32),
    ]

    outs = pl.pallas_call(
        kernel,
        grid=(Wp // WPG,),
        in_specs=[vspec(S8, L1),                    # seqsh (vector rows)
                  sspec(S8, L128), sspec(S8, L128),  # seq/weights scalars
                  sspec(1, 128),                    # lens + n_seqs
                  sspec(1, N128), sspec(1, N128), sspec(1, N128)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(padw(pad_s(seqsh)), padw(pad_s(pad_l(seqs.astype(jnp.int32), -1))),
      padw(pad_s(pad_l(weights.astype(jnp.int32)))), padw(meta),
      padw(base0), padw(cov0), padw(ew0))

    codes, covs, meta_out = outs[0], outs[1], outs[2]
    length = meta_out[:W, 0, 0]
    status = meta_out[:W, 0, 1]
    if msa:
        rows = outs[3][:W, :S]
        n_cols = meta_out[:W, 0, 3]
    else:
        rows = jnp.zeros((W, S, 1), jnp.int32)
        n_cols = jnp.zeros((W,), jnp.int32)
    return codes[:W, 0, :], covs[:W, 0, :], length, rows, n_cols, status
