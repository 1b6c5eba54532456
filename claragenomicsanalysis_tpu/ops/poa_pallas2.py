"""POA pipeline v2: lockstep-over-windows Pallas kernels.

v1 (ops/poa_pallas.py) runs the whole POA per-window inside one kernel
with graph state in SMEM; its wall is the ONE scalar unit (add ~45 ms,
traceback ~14 ms, topsort ~12 ms per 128-window small batch — see
docs/POA_V2.md and scripts/ablate_poa_add.py).  v2 splits the pipeline
into per-phase kernels orchestrated at the XLA level (state flows through
HBM between kernels; the per-sequence loop is a lax.scan, exactly like
models/poa._graph_scan):

- graph-NW + traceback: v1's sublane-lockstep NW (windows of a sub-batch
  on the sublane axis of one (WPG, L1) block) with the per-window scalar
  walk, as a standalone kernel taking the graph state as SMEM inputs and
  returning the (W, TL) alignment paths.
- add-alignment: the v2 centerpiece — windows on the LANE axis, graph
  state as (N, W) VMEM planes, sequential in path step j, LOCKSTEP over
  all windows.  A per-window scalar read becomes an (N, W) masked
  sublane-reduce (~66 VPU cycles for ALL windows vs ~123 scalar
  cycles/window measured in v1); writes are masked lane-owned scatters
  that cannot collide.  Three passes per sequence (fast columns /
  compacted slow columns / edges) keep the worst-case branch work off
  the common path; pass separation is semantics-preserving because each
  graph node is target of at most one column per sequence (see
  docs/POA_V2.md).
- topsort / consensus: lockstep kernels too (the on-chip bisection showed
  the XLA versions' gathers/argsort/walk dominating the batch at ~900 ms
  of 1186 ms) — monotone Gauss-Seidel v-sweeps for levels/scores, a
  lockstep counting sort, and a lockstep backtrack walk.
- MSA: lockstep column assignment (sequential over rank, clique gathers
  as plane reduces) + per-sequence gapped-row emission on a grid dim, so
  the whole v2 pipeline is Pallas end to end.

Phases are bit-identical to ops/poa_ops.py (the executable spec is
cpu/poa_oracle.py) and asserted so by tests/test_poa_pallas2.py.

Reference counterpart: cudapoa/src/cudapoa_kernels.cu pipeline
(topsort/nw/add_alignment/consensus .cuh [U]) — one CUDA block per
window there; here the whole batch advances in lockstep so the VPU, not
the scalar unit, does the pointer chasing.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import BatchSize, PoaScores
from ..core.status import StatusType
from ..utils.mathutils import round_up
from . import poa_ops

NEG = -(2**30)


def _iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _siota(n, w):
    """(n, w) iota along the sublane axis."""
    return jax.lax.broadcasted_iota(jnp.int32, (n, w), 0)


def _lx(row, i):
    """Scalar at lane i of a (1, C) row (vector extract)."""
    return jnp.sum(jnp.where(_iota(row.shape[-1]) == i, row, 0))


def _st(row, i, v):
    """Row with lane i set to v (masked rewrite)."""
    return jnp.where(_iota(row.shape[-1]) == i, v, row)


# --------------------------------------------------------------------------
# Lockstep helpers for the (N, W) plane world of the add kernel.
# Planes put nodes on SUBLANES and windows on LANES; `row` values are
# (1, W) int32 with one scalar per window.
# --------------------------------------------------------------------------

def _gather(plane, mask):
    """(1, W) per-window gather plane[idx_w, w] given mask from _eqmask."""
    return jnp.sum(jnp.where(mask, plane, 0), axis=0, keepdims=True)


def _eqmask(n, idx_row):
    """(n, W) mask selecting sublane idx_w on lane w (idx must be in
    [0, n); clip before calling)."""
    return _siota(n, idx_row.shape[-1]) == idx_row


def _scatter(plane, mask, do_row, val_row):
    """plane with plane[idx_w, w] = val_w where do_w (mask from _eqmask)."""
    return jnp.where(mask & (do_row != 0), val_row, plane)


def _scatter_add(plane, mask, do_row, val_row):
    return plane + jnp.where(mask & (do_row != 0), val_row, 0)


# --------------------------------------------------------------------------
# Kernel 1: graph-NW + traceback for one added sequence, sub-batch of WPG
# windows per grid step (windows on the sublane axis of the NW row block,
# exactly v1's lockstep formulation; reference: cudapoa_nw.cuh [U]).
# --------------------------------------------------------------------------

def _build_nwtb_kernel(bs: BatchSize, sc: PoaScores, banded: bool,
                       WPG: int, moves_tb: bool = True,
                       tb_mode: str = "sweep"):
    N = round_up(bs.padded_nodes, 8)
    P = bs.max_pred_per_node
    L = bs.padded_seq
    L1 = round_up(L + 1, 128)
    TL = N + L
    TLS = round_up(TL, 128)
    MATCH = int(sc.match_score)
    MISM = int(sc.mismatch_score)
    GAP = int(sc.gap_score)
    BW = bs.band_width if banded else 0
    SCAN_QS = max(1, (L1 - 1).bit_length())
    if tb_mode == "sweep" and not moves_tb:
        raise ValueError("sweep traceback requires recorded moves")

    def _sweep_traceback(carry, sel_vec, slen8, nc8v, act8, order_s,
                         moves2, pn_out, pp_out, meta_out):
        """Lockstep traceback over the WPG sub-batch.  Pred ranks are
        strictly below a node's own rank (topological order), so every
        window's row index is monotonically non-increasing along its walk:
        a single top-down sweep serves all windows — each iteration steps
        every window sitting at the current maximum row, so the moves-word
        extraction, the path emission and the state updates are one vector
        op each instead of WPG scalar walks.  Transition rules are exactly
        the per-window walk's (body_moves), so outputs are bit-identical."""
        vmax8, first8 = carry
        kk = jax.lax.broadcasted_iota(jnp.int32, (WPG, TLS), 1)
        r8 = jnp.where(nc8v > 0, first8, -1)
        j8 = slen8
        k8 = jnp.full((WPG, 1), TL, jnp.int32)
        pn8 = jnp.zeros((WPG, TLS), jnp.int32)
        pp8 = jnp.zeros((WPG, TLS), jnp.int32)

        def alive_of(r8, j8, k8):
            return (act8 != 0) & (k8 > 0) & ((r8 >= 0) | (j8 > 0))

        def cond(c):
            r8, j8, k8 = c[:3]
            return jnp.any(alive_of(r8, j8, k8) & (r8 >= 0))

        def body(c):
            r8, j8, k8, pn8, pp8 = c
            alive = alive_of(r8, j8, k8)
            rmax = jnp.max(jnp.where(alive & (r8 >= 0), r8, NEG))
            here = alive & (r8 == rmax)
            rowvec = moves2[pl.ds(jnp.clip(rmax + 1, 0, N), 1)][0]
            word8 = jnp.sum(jnp.where(_iota(L1) == j8, rowvec, 0),
                            axis=1, keepdims=True)
            u8 = sel_vec([order_s[wi, jnp.clip(rmax, 0, N - 1)]
                          for wi in range(WPG)])
            u8 = jnp.where((rmax >= 0) & (rmax < N), u8, -1)
            move8 = word8 & 3
            sel8 = (word8 >> 2) - 1
            pn_val = jnp.where(move8 == 3, -1, u8)
            pp_val = jnp.where(move8 == 1, -1, j8 - 1)
            k2 = k8 - 1
            m = here & (kk == k2)
            pn8 = jnp.where(m, pn_val, pn8)
            pp8 = jnp.where(m, pp_val, pp8)
            r8 = jnp.where(here & (move8 <= 1), sel8, r8)
            j8 = jnp.where(here & ((move8 == 0) | (move8 == 3)),
                           j8 - 1, j8)
            k8 = jnp.where(here, k2, k8)
            return r8, j8, k8, pn8, pp8

        r8, j8, k8, pn8, pp8 = jax.lax.while_loop(
            cond, body, (r8, j8, k8, pn8, pp8))
        # virtual-row tail: every remaining move of a window at r < 0 is
        # horizontal — emit them all in one masked fill (step t of the
        # tail writes pn[k-t] = -1, pp[k-t] = j-t, stopping when k hits 0)
        tail = alive_of(r8, j8, k8)
        kfin = jnp.where(tail, jnp.maximum(k8 - j8, 0), k8)
        fill = tail & (kk >= kfin) & (kk < k8)
        pn8 = jnp.where(fill, -1, pn8)
        pp8 = jnp.where(fill, kk + j8 - k8, pp8)
        pn_out[...] = pn8
        pp_out[...] = pp8
        band8 = jnp.where(act8 != 0,
                          (vmax8 > NEG // 2).astype(jnp.int32), 1)
        for wi in range(WPG):
            meta_out[wi, 0] = kfin[wi, 0]
            meta_out[wi, 1] = band8[wi, 0]

    def kernel(seqsh_ref, seq_s, meta_s, order_s, rank_s, npred_s, base_s,
               nsucc_s, pred_s, pn_out, pp_out, meta_out, smat2,
               moves2=None):
        jj = _iota(L1)
        sweep = tb_mode == "sweep"

        def sel_vec(vals):
            si = jax.lax.broadcasted_iota(jnp.int32, (WPG, 1), 0)
            acc = jnp.zeros((WPG, 1), jnp.int32)
            for k, v in enumerate(vals):
                acc = jnp.where(si == k, v, acc)
            return acc

        slens = [meta_s[wi, 0] for wi in range(WPG)]
        ncs = [meta_s[wi, 1] for wi in range(WPG)]
        acts = [meta_s[wi, 2] != 0 for wi in range(WPG)]

        # ------------------------------------------------------ NW rows
        seq8 = seqsh_ref[...]                       # (WPG, L1) shifted
        slen8 = sel_vec(slens)
        seq_ok = (jj >= 1) & (jj <= slen8)
        max_nc = jnp.int32(0)
        for nc, a in zip(ncs, acts):
            max_nc = jnp.maximum(max_nc, jnp.where(a, nc, 0))
        row0 = jnp.where(jj <= L, jj * GAP, NEG)
        smat2[pl.ds(0, 1)] = jnp.broadcast_to(row0[:, None, :],
                                              (1, WPG, L1))
        if BW > 0:
            nc8 = sel_vec(ncs)
        if sweep:
            # find_end folds into the row loop: running (vmax, first) per
            # window over sink rows, exactly the per-window walk's
            # tie-break (strictly-better replaces; equal keeps earlier r)
            nc8v = sel_vec(ncs)
            act8 = sel_vec([a.astype(jnp.int32) for a in acts])

        T0 = min(P, 4)
        ASM = N + 3                   # T0 assembly rows live in the 8-row
                                      # padding above N+2 (round_up slack)

        def nw_body(r, carry):
            bases, sinks, npreds, us = [], [], [], []
            # per (window, static-slot) rank scalars, reused by the moves
            # pass; slots past T0 are handled by the dynamic tail loops
            prs = [[None] * T0 for _ in range(WPG)]
            oks = [[None] * T0 for _ in range(WPG)]
            # tail contributions accumulate in row N+2 (init NEG); the
            # static T0 slots are ASSEMBLED into rows ASM..ASM+T0-1 so the
            # pmax AND the moves algebra below run on full-width
            # (WPG, L1) planes instead of per-window (1, L1) slices (the
            # 1/8-sublane-utilization wall of the pileup profile)
            smat2[pl.ds(N + 2, 1)] = jnp.full((1, WPG, L1), NEG, jnp.int32)
            for wi in range(WPG):
                u = jnp.clip(order_s[wi, jnp.clip(r, 0, N - 1)], 0, N - 1)
                npred_u = npred_s[wi, u]
                npreds.append(npred_u)
                us.append(u)
                bases.append(base_s[wi, u])
                if sweep:
                    sinks.append((nsucc_s[wi, u] == 0).astype(jnp.int32))
                for p in range(T0):
                    pi = pred_s[wi, p, u]
                    virt = (p == 0) & (npred_u == 0)
                    prs[wi][p] = jnp.where(
                        virt, 0, rank_s[wi, jnp.clip(pi, 0, N - 1)] + 1)
                    oks[wi][p] = (p < npred_u) | virt
                    smat2[pl.ds(ASM + p, 1), wi, :] = smat2[
                        pl.ds(jnp.clip(prs[wi][p], 0, N), 1), wi, :]

                # wide-P configs (P = S = 16 pileups) keep the common case
                # cheap: the first T0 slots are static reads; the tail runs
                # as a dynamic fori that trips only for nodes that actually
                # accumulated many preds (Mosaic rejects scf.if with vector
                # carries, but dynamic fori with a row carry lowers fine)
                if P > T0:
                    def pmax_tail(p, pmax, wi=wi, u=u):
                        pi = pred_s[wi, p, u]
                        pr = rank_s[wi, jnp.clip(pi, 0, N - 1)] + 1
                        prow = smat2[pl.ds(jnp.clip(pr, 0, N), 1), wi, :]
                        return jnp.maximum(pmax, prow)

                    tail = jax.lax.fori_loop(
                        T0, npred_u, pmax_tail,
                        jnp.full((1, L1), NEG, jnp.int32))
                    smat2[pl.ds(N + 2, 1), wi, :] = tail

            ok8 = [sel_vec([oks[wi][p].astype(jnp.int32)
                            for wi in range(WPG)]) for p in range(T0)]
            pr8 = [sel_vec([prs[wi][p] for wi in range(WPG)])
                   for p in range(T0)]
            pmax8 = smat2[pl.ds(N + 2, 1)][0]        # tail part (or NEG)
            for p in range(T0):
                asm = smat2[pl.ds(ASM + p, 1)][0]
                pmax8 = jnp.where(ok8[p] != 0,
                                  jnp.maximum(pmax8, asm), pmax8)
            base8 = sel_vec(bases)
            sub = jnp.where((seq8 == base8) & (seq8 >= 0), MATCH, MISM)
            sub = jnp.where(seq_ok, sub, MISM)
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

            if moves_tb:
                # Record a packed move word per cell: 2-bit move (0 diag,
                # 1 vert, 3 horiz) | (chosen pred rank) << 2, derived with
                # exactly the traceback probe's first-slot tie-break, so
                # the walk later reads ONE word per step.  Diagonal flags
                # accumulate in shifted (j-1) space — d_ok[j] tests
                # prow[j-1] + sub[j] == row[j], i.e. prow[t] == rsub[t]
                # with rsub = roll_left(row - sub) — so each pred slot
                # costs zero rolls; one roll realigns at the end.
                # The static T0 slots reuse the assembled (WPG, L1) planes
                # so the whole tie-break algebra is window-vectorized; the
                # rare > T0 tail stays a per-window (1, L1) loop whose
                # result is re-inserted by a sublane select.
                rsub8 = pltpu.roll(row - sub, shift=L1 - 1,
                                   axis=1)  # roll left by one
                # any_dm is int32, not bool: Mosaic cannot rotate i1
                # vectors, and it gets rolled back to j space below
                any_dm8 = jnp.zeros((WPG, L1), jnp.int32)
                any_v8 = jnp.zeros((WPG, L1), jnp.int32)
                sel_dm8 = jnp.zeros((WPG, L1), jnp.int32)
                sel_v8 = jnp.zeros((WPG, L1), jnp.int32)
                for p in range(T0):
                    prow8 = smat2[pl.ds(ASM + p, 1)][0]
                    okp = ok8[p] != 0
                    dm_ok = okp & (prow8 == rsub8)
                    v_ok = okp & (prow8 + GAP == row)
                    sel_dm8 = jnp.where(dm_ok & (any_dm8 == 0),
                                        pr8[p] - 1, sel_dm8)
                    sel_v8 = jnp.where(v_ok & (any_v8 == 0),
                                       pr8[p] - 1, sel_v8)
                    any_dm8 = jnp.where(dm_ok, 1, any_dm8)
                    any_v8 = jnp.where(v_ok, 1, any_v8)
                if P > T0:
                    si8 = jax.lax.broadcasted_iota(
                        jnp.int32, (WPG, L1), 0)
                    for wi in range(WPG):
                        rsub = rsub8[wi][None]
                        row_wi = row[wi][None]

                        def move_tail(p, mc, wi=wi, rsub=rsub,
                                      row_wi=row_wi):
                            any_dm, any_v, sel_dm, sel_v = mc
                            pi = pred_s[wi, p, us[wi]]
                            pr = rank_s[wi, jnp.clip(pi, 0, N - 1)] + 1
                            prow = smat2[pl.ds(jnp.clip(pr, 0, N), 1),
                                         wi, :]
                            dm_ok = prow == rsub
                            v_ok = prow + GAP == row_wi
                            sel_dm = jnp.where(dm_ok & (any_dm == 0),
                                               pr - 1, sel_dm)
                            sel_v = jnp.where(v_ok & (any_v == 0),
                                              pr - 1, sel_v)
                            any_dm = jnp.where(dm_ok, 1, any_dm)
                            any_v = jnp.where(v_ok, 1, any_v)
                            return any_dm, any_v, sel_dm, sel_v

                        a_dm, a_v, s_dm, s_v = jax.lax.fori_loop(
                            T0, npreds[wi], move_tail,
                            (any_dm8[wi][None], any_v8[wi][None],
                             sel_dm8[wi][None], sel_v8[wi][None]))
                        here = si8 == wi
                        any_dm8 = jnp.where(here, a_dm, any_dm8)
                        any_v8 = jnp.where(here, a_v, any_v8)
                        sel_dm8 = jnp.where(here, s_dm, sel_dm8)
                        sel_v8 = jnp.where(here, s_v, sel_v8)
                any_d8 = ((jj >= 1)
                          & (pltpu.roll(any_dm8, shift=1, axis=1) != 0))
                sel_d8 = pltpu.roll(sel_dm8, shift=1, axis=1)
                move8 = jnp.where(any_d8, 0,
                                  jnp.where(any_v8 != 0, 1, 3))
                sel8 = jnp.where(any_d8, sel_d8,
                                 jnp.where(any_v8 != 0, sel_v8, 0))
                moves2[pl.ds(r + 1, 1)] = (move8 | ((sel8 + 1) << 2))[None]

            if not sweep:
                return carry
            vmax8, first8 = carry
            v8 = jnp.sum(jnp.where(jj == slen8, row, 0), axis=1,
                         keepdims=True)
            sink8 = sel_vec(sinks)
            upd = (sink8 != 0) & (r < nc8v) & (act8 != 0)
            better = upd & (v8 > vmax8)
            tie = upd & (v8 == vmax8) & (r < first8)
            first8 = jnp.where(better | tie, r, first8)
            vmax8 = jnp.where(better, v8, vmax8)
            return vmax8, first8

        carry0 = ((jnp.full((WPG, 1), NEG, jnp.int32),
                   jnp.full((WPG, 1), 2**30, jnp.int32))
                  if sweep else ())
        end_carry = jax.lax.fori_loop(0, max_nc, nw_body, carry0)

        if sweep:
            _sweep_traceback(end_carry, sel_vec, slen8, nc8v, act8,
                             order_s, moves2, pn_out, pp_out, meta_out)
            return

        # ---------------------------------------------------- traceback
        for wi in range(WPG):
            slen = slens[wi]
            node_count = ncs[wi]

            def smat_row(i, wi=wi):
                return smat2[pl.ds(i, 1), wi, :]

            def walk(_, wi=wi, slen=slen, node_count=node_count):
                def find_end(r, c):
                    u = order_s[wi, jnp.clip(r, 0, N - 1)]
                    is_sink = nsucc_s[wi, jnp.clip(u, 0, N - 1)] == 0

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
                    0, node_count, find_end,
                    (jnp.int32(NEG), jnp.int32(2**30)))
                band_ok = vmax > NEG // 2
                r_end = jnp.where(node_count > 0, first, -1)

                def cond(c):
                    r, j, k = c
                    return ((r >= 0) | (j > 0)) & (k > 0)

                def body_moves(c, wi=wi):
                    r, j, k = c
                    u = jnp.where((r >= 0) & (r < N),
                                  order_s[wi, jnp.clip(r, 0, N - 1)], -1)
                    at_virtual = r < 0
                    word = _lx(moves2[pl.ds(jnp.clip(r + 1, 0, N), 1),
                                      wi, :], j)
                    move = jnp.where(at_virtual, 3, word & 3)
                    sel = (word >> 2) - 1
                    new_r = jnp.where((move == 0) | (move == 1), sel, r)
                    new_j = jnp.where((move == 0) | (move == 3), j - 1, j)
                    k2 = k - 1
                    pn_out[wi, k2] = jnp.where(move == 3, -1, u)
                    pp_out[wi, k2] = jnp.where(move == 1, -1, j - 1)
                    return new_r, new_j, k2

                def body(c, wi=wi):
                    r, j, k = c
                    u = jnp.where((r >= 0) & (r < N),
                                  order_s[wi, jnp.clip(r, 0, N - 1)], -1)
                    uc = jnp.clip(u, 0, N - 1)
                    here_row = smat_row(jnp.clip(r + 1, 0, N))
                    here = _lx(here_row, j)
                    sc_ch = seq_s[wi, jnp.clip(j - 1, 0, L - 1)]
                    sc_ch = jnp.where((j >= 1) & (j <= L), sc_ch, -1)
                    base_u = jnp.where(u >= 0, base_s[wi, uc], -2)
                    sub = jnp.where((sc_ch == base_u) & (sc_ch >= 0),
                                    MATCH, MISM)
                    npred_u = jnp.where(u >= 0, npred_s[wi, uc], 0)
                    at_virtual = r < 0

                    def probe_slots(lo, hi, carry):
                        any_diag, any_vert, sel_d, sel_v = carry
                        for p in range(lo, hi):
                            pi = pred_s[wi, p, uc]
                            slot_ok = ((p < npred_u)
                                       | ((p == 0) & (npred_u == 0)))
                            pr = jnp.where(
                                (p == 0) & (npred_u == 0), 0,
                                rank_s[wi, jnp.clip(pi, 0, N - 1)] + 1)
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
                    pn_out[wi, k2] = jnp.where(move == 3, -1, u)
                    pp_out[wi, k2] = jnp.where(move == 1, -1, j - 1)
                    return new_r, new_j, k2

                _, _, k = jax.lax.while_loop(
                    cond, body_moves if moves_tb else body,
                    (r_end, slen, jnp.int32(TL)))
                meta_out[wi, 0] = k
                meta_out[wi, 1] = jnp.where(band_ok, 1, 0)
                return ()

            def inactive(_, wi=wi):
                meta_out[wi, 0] = TL
                meta_out[wi, 1] = 1
                return ()

            jax.lax.cond(acts[wi], walk, inactive, ())

    return kernel, dict(N=N, P=P, L=L, L1=L1, TL=TL, TLS=TLS)


def _nwtb_pallas(bs: BatchSize, sc: PoaScores, banded: bool, interpret: bool,
                 WPG: int, seq, order, rank, npred, base, nsucc, pred,
                 slen, node_count, alive, moves_tb: bool = True,
                 tb_mode: str = "sweep"):
    """Run the NW+traceback kernel for one added sequence over all windows.

    seq: (W, L) int32 codes; pred: (W, N, P); scalar per-window rows are
    (W,).  Returns (pn (W, TL), pp (W, TL), k0 (W,), band_ok (W,))."""
    W = seq.shape[0]
    if not moves_tb:
        tb_mode = "walk"
    kernel, d = _build_nwtb_kernel(bs, sc, banded, WPG, moves_tb, tb_mode)
    N, P, L, L1, TL, TLS = (d["N"], d["P"], d["L"], d["L1"], d["TL"],
                            d["TLS"])
    NS = round_up(N, 128)
    L128 = round_up(L, 128)
    P8 = round_up(P, 8)
    Wp = round_up(W, WPG)

    def padw(x):
        return jnp.pad(x, ((0, Wp - W),) + ((0, 0),) * (x.ndim - 1))

    def padlane(x, n, fill=0):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1])),
                       constant_values=fill)

    seq = seq.astype(jnp.int32)
    seqsh = jnp.concatenate(
        [jnp.full((W, 1), -1, jnp.int32), seq], axis=1)
    seqsh = jnp.pad(seqsh, ((0, 0), (0, L1 - L - 1)), constant_values=-1)
    meta = jnp.zeros((W, 128), jnp.int32)
    meta = meta.at[:, 0].set(slen.astype(jnp.int32))
    meta = meta.at[:, 1].set(node_count.astype(jnp.int32))
    meta = meta.at[:, 2].set(alive.astype(jnp.int32))
    predT = jnp.transpose(pred.astype(jnp.int32), (0, 2, 1))   # (W, P, N)
    predT = jnp.pad(predT, ((0, 0), (0, P8 - P), (0, NS - N)))

    def vspec(*shape):
        return pl.BlockSpec((WPG,) + shape,
                            lambda w: (w,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def sspec(*shape):
        return pl.BlockSpec((WPG,) + shape,
                            lambda w: (w,) + (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    path_spec = vspec(TLS) if tb_mode == "sweep" else sspec(TLS)
    pn, pp, meta_out = pl.pallas_call(
        kernel,
        grid=(Wp // WPG,),
        in_specs=[vspec(L1), sspec(L128), sspec(128), sspec(NS), sspec(NS),
                  sspec(NS), sspec(NS), sspec(NS), sspec(P8, NS)],
        out_specs=(path_spec, path_spec, sspec(128)),
        out_shape=(jax.ShapeDtypeStruct((Wp, TLS), jnp.int32),
                   jax.ShapeDtypeStruct((Wp, TLS), jnp.int32),
                   jax.ShapeDtypeStruct((Wp, 128), jnp.int32)),
        scratch_shapes=(
            [pltpu.VMEM((round_up(N + 3, 8), WPG, L1), jnp.int32)]
            + ([pltpu.VMEM((round_up(N + 3, 8), WPG, L1), jnp.int32)]
               if moves_tb else [])),
        interpret=interpret,
    )(padw(seqsh), padw(padlane(seq, L128, -1)), padw(meta),
      padw(padlane(order.astype(jnp.int32), NS)),
      padw(padlane(rank.astype(jnp.int32), NS)),
      padw(padlane(npred.astype(jnp.int32), NS)),
      padw(padlane(base.astype(jnp.int32), NS, -1)),
      padw(padlane(nsucc.astype(jnp.int32), NS)),
      padw(predT))
    return (pn[:W, :TL], pp[:W, :TL], meta_out[:W, 0],
            meta_out[:W, 1] != 0)


# --------------------------------------------------------------------------
# Kernel 2: add-alignment, lockstep over windows (the v2 centerpiece;
# reference: cudapoa_add_alignment.cuh [U], semantics poa_ops.add_alignment).
#
# Graph state is (N, W) planes: nodes on sublanes, windows on lanes.  Three
# passes per sequence:
#   pass 1 (j = 0..TL): classify columns; apply the fast path (existing
#          node, matching base: coverage bump) and compact the slow column
#          indices per window;
#   pass 2 (i = 0..max slow count): resolve slow columns in j order —
#          candidate scan, node creation, clique linking;
#   pass 3 (j = 0..TL): edges (prev -> target): existing-edge weight bump
#          or sorted insert, successor counts, edge-overflow tracking.
# Pass separation preserves bit-exact j-order semantics: each node is the
# target of at most one column per sequence, `fast` depends only on
# immutable node bases, and all slow-path mutations happen j-ordered in
# pass 2 (docs/POA_V2.md).
# --------------------------------------------------------------------------

def _build_add_kernel(bs: BatchSize, msa: bool):
    N = round_up(bs.padded_nodes, 8)
    P = bs.max_pred_per_node
    A = bs.max_aligned_per_node
    L = bs.padded_seq
    TL = N + L
    TLS = round_up(TL, 128)
    L128 = round_up(L, 128)
    MAXN = bs.max_nodes_per_window
    BIG = 2**30
    SUCCESS = int(StatusType.SUCCESS)
    ST_NODE = int(StatusType.NODE_COUNT_EXCEEDED_MAXIMUM_GRAPH_SIZE)
    ST_EDGE = int(StatusType.EDGE_COUNT_EXCEEDED_MAXIMUM_GRAPH_SIZE)

    def kernel(pnT, ppT, seqT, wT, meta, baseT, covT, npredT, nsuccT,
               naligT, predT, predwT, aligT, meta_out, pathsT, targT, sjT):
        W = meta.shape[1]
        k0r = meta[pl.ds(0, 1)]
        actr = meta[pl.ds(1, 1)] != 0
        iN = _siota(N, W)
        iTL = _siota(TLS, W)
        iL = _siota(L128, W)

        if msa:
            pathsT[...] = jnp.full((L128, W), -1, jnp.int32)

        # ------------------------------------------------------- pass 1
        def pass1(j, scnt):
            node = pnT[pl.ds(j, 1)]
            pos = ppT[pl.ds(j, 1)]
            live = (j >= k0r) & actr
            inert = (node == -2) | ((node == -1) & (pos == -1)) | ~live
            is_del = (node >= 0) & (pos == -1)
            consume = ~inert & ~is_del
            posc = jnp.clip(pos, 0, L - 1)
            mask_pos = iL == posc
            b = jnp.sum(jnp.where(mask_pos, seqT[...], 0), axis=0,
                        keepdims=True)
            b = jnp.where(pos >= 0, b, -1)
            w = jnp.sum(jnp.where(mask_pos, wT[...], 0), axis=0,
                        keepdims=True)
            w = jnp.where(pos >= 0, w, 0)
            nodec = jnp.clip(node, 0, N - 1)
            mask_node = iN == nodec
            base_n = jnp.sum(jnp.where(mask_node, baseT[...], 0), axis=0,
                             keepdims=True)
            base_n = jnp.where(node >= 0, base_n, -2)
            same = (base_n == b) & (b >= 0) & (node >= 0)
            fast = consume & same
            covT[...] = covT[...] + jnp.where(mask_node & fast, w, 0)
            targT[pl.ds(j, 1)] = jnp.where(fast, node, -3)
            if msa:
                pathsT[...] = jnp.where(mask_pos & fast, node, pathsT[...])
            slow = consume & ~same
            mask_sc = iTL == scnt
            sjT[...] = jnp.where(mask_sc & slow, j, sjT[...])
            return scnt + jnp.where(slow, 1, 0)

        scnt = jax.lax.fori_loop(
            0, TL, pass1, jnp.zeros((1, W), jnp.int32))

        # ------------------------------------------------------- pass 2
        ncr0 = meta[pl.ds(2, 1)]

        def pass2(i, c):
            ncr, fnc = c
            ok = i < scnt
            j_row = sjT[pl.ds(i, 1)]
            mask_j = iTL == jnp.clip(j_row, 0, TLS - 1)
            node = jnp.sum(jnp.where(mask_j, pnT[...], 0), axis=0,
                           keepdims=True)
            pos = jnp.sum(jnp.where(mask_j, ppT[...], 0), axis=0,
                          keepdims=True)
            posc = jnp.clip(pos, 0, L - 1)
            mask_pos = iL == posc
            b = jnp.sum(jnp.where(mask_pos, seqT[...], 0), axis=0,
                        keepdims=True)
            b = jnp.where(pos >= 0, b, -1)
            w = jnp.sum(jnp.where(mask_pos, wT[...], 0), axis=0,
                        keepdims=True)
            w = jnp.where(pos >= 0, w, 0)
            nodec = jnp.clip(node, 0, N - 1)
            mask_node = iN == nodec
            nalig_n = jnp.sum(jnp.where(mask_node, naligT[...], 0), axis=0,
                              keepdims=True)
            # candidate scan (first aligned node with a matching base)
            any_c = jnp.zeros((1, W), jnp.bool_)
            cand_sel = jnp.full((1, W), -1, jnp.int32)
            cas = []
            for a in range(A):
                ca = jnp.sum(jnp.where(mask_node, aligT[a], 0), axis=0,
                             keepdims=True)
                cas.append(ca)
                mb = jnp.sum(jnp.where(iN == jnp.clip(ca, 0, N - 1),
                                       baseT[...], 0), axis=0, keepdims=True)
                mb = jnp.where((ca >= 0) & (ca < N), mb, -2)
                hit = (a < nalig_n) & (b >= 0) & (mb == b)
                cand_sel = jnp.where(hit & ~any_c, ca, cand_sel)
                any_c = any_c | hit
            any_cand = any_c & (node >= 0)

            need_new = ok & ~((node >= 0) & any_cand)
            new_id = jnp.clip(ncr, 0, N - 1)
            overflow_node = need_new & (ncr >= MAXN)
            target = jnp.where((node >= 0) & any_cand, cand_sel, new_id)
            targT[...] = jnp.where(mask_j & ok, target, targT[...])
            tgtc = jnp.clip(target, 0, N - 1)
            mask_tgt = iN == tgtc
            baseT[...] = jnp.where(mask_tgt & need_new, b, baseT[...])
            covT[...] = covT[...] + jnp.where(mask_tgt & ok, w, 0)
            if msa:
                pathsT[...] = jnp.where(mask_pos & ok, target, pathsT[...])

            # clique linking
            link = need_new & (node >= 0)
            group_sz = nalig_n + 1
            overflow_clique = link & (group_sz > A)
            # new node's aligned list = ascending sort of (node_c, cands)
            vals = [jnp.where(node >= 0, nodec, BIG)] + [
                jnp.where((a < nalig_n) & (cas[a] >= 0), cas[a], BIG)
                for a in range(A)]
            for hi in range(A, 0, -1):          # odd-even sort network
                for lo in range(hi):
                    a, bb = vals[lo], vals[lo + 1]
                    vals[lo] = jnp.minimum(a, bb)
                    vals[lo + 1] = jnp.maximum(a, bb)
            for a in range(A):
                v = jnp.where(vals[a] >= BIG, -1, vals[a])
                aligT[a] = jnp.where(mask_tgt & link, v, aligT[a])
            naligT[...] = jnp.where(mask_tgt & link,
                                    jnp.minimum(group_sz, A), naligT[...])
            # append new_id to each member's list (member-owned slots; the
            # nalig PLANE supplies each member's slot, so no extra gathers)
            memb = jnp.zeros((N, W), jnp.bool_)
            memb = memb | (mask_node & link)
            for a in range(A):
                m_ok = link & (a < nalig_n) & (cas[a] >= 0)
                memb = memb | ((iN == jnp.clip(cas[a], 0, N - 1)) & m_ok)
            cond_m = memb & (naligT[...] < A)
            for a in range(A):
                aligT[a] = jnp.where(cond_m & (naligT[...] == a), new_id,
                                     aligT[a])
            naligT[...] = jnp.where(cond_m, naligT[...] + 1, naligT[...])

            ncr = ncr + jnp.where(need_new & ~overflow_node, 1, 0)
            fnc = jnp.minimum(
                fnc, jnp.where(overflow_node | overflow_clique, j_row, BIG))
            return ncr, fnc

        max_slow = jnp.max(scnt)
        ncr, fnc = jax.lax.while_loop(
            lambda c: c[0] < max_slow,
            lambda c: (c[0] + 1,) + pass2(c[0], c[1:]),
            (jnp.int32(0), ncr0, jnp.full((1, W), BIG, jnp.int32)))[1:]

        # ------------------------------------------------------- pass 3
        def pass3(j, c):
            prev, wprev, fe = c
            targ = targT[pl.ds(j, 1)]
            consume = targ >= 0
            pos = ppT[pl.ds(j, 1)]
            posc = jnp.clip(pos, 0, L - 1)
            mask_pos = iL == posc
            w = jnp.sum(jnp.where(mask_pos, wT[...], 0), axis=0,
                        keepdims=True)
            w = jnp.where(pos >= 0, w, 0)
            ew = jnp.minimum(wprev, w)
            has_edge = (prev >= 0) & consume
            prevc = jnp.clip(prev, 0, N - 1)
            mask_tgt = iN == jnp.clip(targ, 0, N - 1)
            npred_t = jnp.sum(jnp.where(mask_tgt, npredT[...], 0), axis=0,
                              keepdims=True)
            plist = [jnp.sum(jnp.where(mask_tgt, predT[p], 0), axis=0,
                             keepdims=True) for p in range(P)]
            plist = [jnp.where(p < npred_t, plist[p], -1) for p in range(P)]
            found = jnp.zeros((1, W), jnp.bool_)
            slot = jnp.zeros((1, W), jnp.int32)
            for p in range(P):
                hit = (p < npred_t) & (plist[p] == prevc)
                slot = jnp.where(hit & ~found, p, slot)
                found = found | hit
            bump = has_edge & found
            for p in range(P):
                predwT[p] = predwT[p] + jnp.where(
                    mask_tgt & bump & (slot == p), ew, 0)
            ins = has_edge & ~found
            overflow_edge = ins & (npred_t >= P)
            do_ins = ins & ~overflow_edge
            pos_ins = jnp.zeros((1, W), jnp.int32)
            for p in range(P):
                pos_ins = pos_ins + jnp.where(
                    (p < npred_t) & (plist[p] < prevc), 1, 0)
            wlist = [jnp.sum(jnp.where(mask_tgt, predwT[p], 0), axis=0,
                             keepdims=True) for p in range(P)]
            for p in range(P):
                new_p = jnp.where(p < pos_ins, plist[p],
                                  jnp.where(p == pos_ins, prevc,
                                            plist[p - 1] if p >= 1
                                            else jnp.full_like(prevc, -1)))
                new_w = jnp.where(p < pos_ins, wlist[p],
                                  jnp.where(p == pos_ins, ew,
                                            wlist[p - 1] if p >= 1
                                            else jnp.zeros_like(ew)))
                predT[p] = jnp.where(mask_tgt & do_ins, new_p, predT[p])
                predwT[p] = jnp.where(mask_tgt & do_ins, new_w, predwT[p])
            npredT[...] = jnp.where(mask_tgt & do_ins, npred_t + 1,
                                    npredT[...])
            mask_prev = iN == prevc
            nsuccT[...] = nsuccT[...] + jnp.where(mask_prev & do_ins, 1, 0)
            fe = jnp.minimum(fe, jnp.where(overflow_edge, j, BIG))
            prev = jnp.where(consume, targ, prev)
            wprev = jnp.where(consume, w, wprev)
            return prev, wprev, fe

        _, _, fe = jax.lax.fori_loop(
            0, TL, pass3,
            (jnp.full((1, W), -1, jnp.int32), jnp.zeros((1, W), jnp.int32),
             jnp.full((1, W), BIG, jnp.int32)))

        # --------------------------------------------- status + meta out
        statr = meta[pl.ds(3, 1)]
        stat = jnp.where((statr == SUCCESS) & (fnc <= fe) & (fnc < BIG),
                         ST_NODE, statr)
        stat = jnp.where((stat == SUCCESS) & (fe < fnc), ST_EDGE, stat)
        mo = jnp.zeros((8, W), jnp.int32)
        si = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
        mo = jnp.where(si == 0, jnp.broadcast_to(ncr, (8, W)), mo)
        mo = jnp.where(si == 1, jnp.broadcast_to(stat, (8, W)), mo)
        meta_out[...] = mo

    return kernel, dict(N=N, P=P, A=A, L=L, TL=TL, TLS=TLS, L128=L128)


def _add_pallas(bs: BatchSize, msa: bool, interpret: bool, state, pn, pp,
                seq, weights, k0, act):
    """Run the add kernel over all windows; returns the updated PoaState
    pieces (base, cov, npred, pred, predw, nsucc, nalig, alig, node_count,
    status, path_row (W, L))."""
    W = seq.shape[0]
    kernel, d = _build_add_kernel(bs, msa)
    N, P, A, L, TL, TLS, L128 = (d["N"], d["P"], d["A"], d["L"], d["TL"],
                                 d["TLS"], d["L128"])
    LANES = 128
    Wp = round_up(W, LANES)

    def t2(x, rows, fill=0):
        """(W, n) -> (rows, Wp) transposed + padded plane."""
        x = jnp.transpose(x.astype(jnp.int32))
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, Wp - W)),
                       constant_values=fill)

    baseT = t2(state.base, N, -1)
    covT = t2(state.cov, N)
    npredT = t2(state.npred, N)
    nsuccT = t2(state.nsucc, N)
    naligT = t2(state.nalig, N)
    predT = jnp.transpose(state.pred.astype(jnp.int32), (2, 1, 0))
    predT = jnp.pad(predT, ((0, 0), (0, N - predT.shape[1]), (0, Wp - W)),
                    constant_values=-1)
    predwT = jnp.transpose(state.predw.astype(jnp.int32), (2, 1, 0))
    predwT = jnp.pad(predwT, ((0, 0), (0, N - predwT.shape[1]),
                              (0, Wp - W)))
    aligT = jnp.transpose(state.alig.astype(jnp.int32), (2, 1, 0))
    aligT = jnp.pad(aligT, ((0, 0), (0, N - aligT.shape[1]), (0, Wp - W)),
                    constant_values=-1)
    pnT = t2(pn, TLS, -2)
    ppT = t2(pp, TLS, -2)
    seqT = t2(seq, L128, -1)
    wT = t2(weights, L128)
    meta = jnp.zeros((8, Wp), jnp.int32)
    meta = meta.at[0, :W].set(k0.astype(jnp.int32))
    meta = meta.at[1, :W].set(act.astype(jnp.int32))
    meta = meta.at[2, :W].set(state.node_count.astype(jnp.int32))
    meta = meta.at[3, :W].set(state.status.astype(jnp.int32))

    def spec(*shape):
        return pl.BlockSpec(shape + (LANES,),
                            lambda w: (0,) * len(shape) + (w,),
                            memory_space=pltpu.VMEM)

    ins = [pnT, ppT, seqT, wT, meta, baseT, covT, npredT, nsuccT, naligT,
           predT, predwT, aligT]
    # state planes stay in HBM (ANY) and are DMA-seeded into the aliased
    # VMEM output blocks by _wrap_add — one VMEM copy of the graph state
    # instead of two, which is what lets correction-shaped configs
    # (P = S = 16) fit the per-core VMEM budget
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [spec(TLS), spec(TLS), spec(L128), spec(L128), spec(8)] + \
        [any_spec] * 8
    out_specs = [spec(8), spec(L128), spec(N), spec(N), spec(N), spec(N),
                 spec(N), spec(P, N), spec(P, N), spec(A, N)]
    out_shape = [jax.ShapeDtypeStruct((8, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((L128, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((N, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((N, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((N, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((N, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((N, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((P, N, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((P, N, Wp), jnp.int32),
                 jax.ShapeDtypeStruct((A, N, Wp), jnp.int32)]
    # state planes are updated in place inside the kernel: alias them to
    # outputs so the kernel's ref mutations ARE the results (ins 5..12)
    aliases = {5: 2, 6: 3, 7: 4, 8: 5, 9: 6, 10: 7, 11: 8, 12: 9}

    outs = pl.pallas_call(
        _wrap_add(kernel, LANES),
        grid=(Wp // LANES,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((TLS, LANES), jnp.int32),
                        pltpu.VMEM((TLS, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases=aliases,
        interpret=interpret,
    )(*ins)
    (meta_out, pathsT, baseT, covT, npredT, nsuccT, naligT,
     predT, predwT, aligT) = outs

    NP = state.pred.shape[1]

    def ut(x, n):
        return jnp.transpose(x)[:W, :n]

    return dict(
        base=ut(baseT, NP), cov=ut(covT, NP), npred=ut(npredT, NP),
        nsucc=ut(nsuccT, NP), nalig=ut(naligT, NP),
        pred=jnp.transpose(predT, (2, 1, 0))[:W, :NP],
        predw=jnp.transpose(predwT, (2, 1, 0))[:W, :NP],
        alig=jnp.transpose(aligT, (2, 1, 0))[:W, :NP],
        node_count=meta_out[0, :W], status=meta_out[1, :W],
        path_row=ut(pathsT, L))


def _wrap_add(kernel, LANES):
    """Seed the mutable state-plane OUTPUT refs from their HBM input twins
    (one DMA per plane — the inputs are ANY-space so the graph state holds
    VMEM only once), then run the kernel against the output refs — its
    in-place mutations are the updated state."""
    def wrapped(pnT, ppT, seqT, wT, meta, base_in, cov_in, npred_in,
                nsucc_in, nalig_in, pred_in, predw_in, alig_in,
                meta_out, pathsT, baseT, covT, npredT, nsuccT, naligT,
                predT, predwT, aligT, targT, sjT, dma_sem):
        w = pl.program_id(0)
        lanes = pl.ds(w * LANES, LANES)
        for dst, src in ((baseT, base_in), (covT, cov_in),
                         (npredT, npred_in), (nsuccT, nsucc_in),
                         (naligT, nalig_in), (predT, pred_in),
                         (predwT, predw_in), (aligT, alig_in)):
            sl = (slice(None),) * (len(src.shape) - 1) + (lanes,)
            cp = pltpu.make_async_copy(src.at[sl], dst, dma_sem)
            cp.start()
            cp.wait()
        kernel(pnT, ppT, seqT, wT, meta, baseT, covT, npredT, nsuccT,
               naligT, predT, predwT, aligT, meta_out, pathsT, targT, sjT)
    return wrapped


# --------------------------------------------------------------------------
# Kernel 3: topological sort, lockstep over windows (semantics:
# poa_ops.topsort; reference: cudapoa_topsort.cuh [U]).
#
# Levels by monotone Gauss-Seidel max-relaxation, SEQUENTIAL over source
# node id v, lockstep over windows: node v's level is a sublane-slice read
# (free), and "raise every node u with pred v" is a (N, W) masked select.
# Monotone relaxation reaches the same longest-path fixpoint as the XLA
# Jacobi because the warm start is always a lower bound (levels only grow
# as the graph gains nodes/edges).  Ids are near-topological in POA
# graphs, so ascending-id sweeps converge in ~2 passes.
# Then a lockstep counting sort by (level, id) — inactive nodes get
# level N so they land after all active ones in id order — reproducing
# poa_ops.topsort's argsort(level*N + idx) order bit-for-bit.
# --------------------------------------------------------------------------

def _build_topsort_kernel(bs: BatchSize):
    N = round_up(bs.padded_nodes, 8)
    P = bs.max_pred_per_node
    NL = round_up(N + 1, 8)

    def kernel(visitT, prev_lvl, npredT, predT, meta, lvlT, orderT, rankT,
               meta_out, lvlE, cntT, offT):
        W = npredT.shape[-1]
        iN = _siota(N, W)
        iNL = _siota(NL, W)
        ncr = meta[pl.ds(0, 1)]
        act = iN < ncr
        lvlT[...] = jnp.where(act, jnp.maximum(prev_lvl[...], 0), 0)
        slot_ok = [p < npredT[...] for p in range(P)]

        def sweep(c):
            _, it = c

            def vstep(i, ch):
                # visitT supplies a PER-WINDOW processing order (a guess
                # at the new topological order, see topsort_guess): when
                # the guess is valid the Gauss-Seidel relaxation converges
                # in ONE sweep instead of one sweep per id-order inversion
                # on the longest path (~#branch insertions — the 56 ms
                # pileup wall).  v becomes a (1, W) row, so the pushed
                # level is a one-hot masked max instead of a row read; the
                # fixpoint (and hence all outputs) is order-independent.
                v_row = visitT[pl.ds(i, 1)]
                m_v = iN == v_row
                cand = jnp.max(jnp.where(m_v, lvlT[...], -1),
                               axis=0, keepdims=True) + 1
                upd = jnp.zeros((N, W), jnp.bool_)
                for p in range(P):
                    upd = upd | ((predT[p] == v_row) & slot_ok[p])
                need = upd & act & (lvlT[...] < cand)
                lvlT[...] = jnp.where(need, jnp.broadcast_to(cand, (N, W)),
                                      lvlT[...])
                return ch | jnp.any(need)

            ch = jax.lax.fori_loop(0, N, vstep, jnp.bool_(False))
            return ch, it + 1

        changed, iters = jax.lax.while_loop(
            lambda c: c[0] & (c[1] < N + 2), sweep,
            (jnp.bool_(True), jnp.int32(0)))
        ok = ~changed

        # counting sort by (level, id): count / exclusive-prefix / place
        lvlE[...] = jnp.where(act, lvlT[...], N)
        cntT[...] = jnp.zeros((NL, W), jnp.int32)

        def count_step(u, _):
            m = iNL == lvlE[pl.ds(u, 1)]
            cntT[...] = cntT[...] + jnp.where(m, 1, 0)
            return ()

        jax.lax.fori_loop(0, N, count_step, ())

        def prefix_step(l, carry):
            c = cntT[pl.ds(l, 1)]
            offT[pl.ds(l, 1)] = carry
            return carry + c

        jax.lax.fori_loop(0, NL, prefix_step, jnp.zeros((1, W), jnp.int32))

        def place_step(u, _):
            m = iNL == lvlE[pl.ds(u, 1)]
            off = jnp.sum(jnp.where(m, offT[...], 0), axis=0, keepdims=True)
            offT[...] = offT[...] + jnp.where(m, 1, 0)
            rankT[pl.ds(u, 1)] = off
            orderT[...] = jnp.where(iN == off, u, orderT[...])
            return ()

        orderT[...] = jnp.zeros((N, W), jnp.int32)
        jax.lax.fori_loop(0, N, place_step, ())

        mo = jnp.zeros((8, W), jnp.int32)
        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
        mo = jnp.where(r8 == 0, jnp.where(ok, 1, 0), mo)
        # row 1: relaxation sweeps used (diagnostic for the visit-order
        # guess; 2 = converged in one productive sweep)
        mo = jnp.where(r8 == 1, iters, mo)
        meta_out[...] = mo

    return kernel, dict(N=N, P=P, NL=NL)


def topsort_guess(nc_pre, nc_post, pred0, level, N: int):
    """Visit-order hint for the next _topsort_pallas call after an
    add-alignment step: old nodes in their old topological (level, id)
    order; each NEW node keyed just after its anchor (first old ancestor
    through first-pred links) with its chain position as tiebreak.  The
    key layout makes the order provably topological for the new graph
    (an alignment path visits old nodes in increasing rank, so a new
    node's old successor always has a strictly larger anchor key), which
    lets the kernel's relaxation converge in one sweep.  Pure hint: an
    imperfect guess (chains > 4 after the two doubling steps) only costs
    extra sweeps, never correctness."""
    ids = jnp.arange(N, dtype=jnp.int32)[None, :]
    is_new = (ids >= nc_pre[:, None]) & (ids < nc_post[:, None])
    anc = jnp.where(is_new, jnp.clip(pred0, 0, N - 1), ids)
    pos = jnp.where(is_new, 1, 0)
    for _ in range(2):               # resolves new-node chains <= 4
        a = jnp.clip(anc, 0, N - 1)
        pos = pos + jnp.take_along_axis(pos, a, axis=1)
        anc = jnp.take_along_axis(anc, a, axis=1)
    a = jnp.clip(anc, 0, N - 1)
    lvl_a = jnp.take_along_axis(jnp.maximum(level.astype(jnp.int32), 0),
                                a, axis=1)
    # (lvl, id) is the old counting-sort rank order; x8 leaves room for
    # chain positions (<= 4 resolved; longer chains clamp — still a hint)
    key = (lvl_a * N + a) * 8 + jnp.minimum(pos, 7)
    return jnp.argsort(key, axis=1).astype(jnp.int32)


def _topsort_pallas(bs: BatchSize, interpret: bool, state, level,
                    visit=None, with_iters: bool = False):
    """Lockstep topsort over all windows.  state fields are (W, N)-major;
    returns (level (W, N), order (W, N), rank (W, N), ok (W,)) matching
    poa_ops.topsort(state, level, N + 2) bit-for-bit on DAGs.

    visit: optional (W, N) per-window processing order (topsort_guess);
    outputs are identical for ANY permutation — it only changes how many
    relaxation sweeps the kernel needs."""
    W = level.shape[0]
    kernel, d = _build_topsort_kernel(bs)
    N, P, NL = d["N"], d["P"], d["NL"]
    LANES = 128
    Wp = round_up(W, LANES)
    if visit is None:
        visit = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                                 (W, N))

    def t2(x, rows, fill=0):
        x = jnp.transpose(x.astype(jnp.int32))
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, Wp - W)),
                       constant_values=fill)

    predT = jnp.transpose(state.pred.astype(jnp.int32), (2, 1, 0))
    predT = jnp.pad(predT, ((0, 0), (0, N - predT.shape[1]), (0, Wp - W)),
                    constant_values=-1)
    meta = jnp.zeros((8, Wp), jnp.int32)
    meta = meta.at[0, :W].set(state.node_count.astype(jnp.int32))

    def spec(*shape):
        return pl.BlockSpec(shape + (LANES,),
                            lambda w: (0,) * len(shape) + (w,),
                            memory_space=pltpu.VMEM)

    lvlT, orderT, rankT, meta_out = pl.pallas_call(
        kernel,
        grid=(Wp // LANES,),
        in_specs=[spec(N), spec(N), spec(N), spec(P, N), spec(8)],
        out_specs=(spec(N), spec(N), spec(N), spec(8)),
        out_shape=(jax.ShapeDtypeStruct((N, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((N, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((N, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((8, Wp), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((N, LANES), jnp.int32),
                        pltpu.VMEM((NL, LANES), jnp.int32),
                        pltpu.VMEM((NL, LANES), jnp.int32)],
        interpret=interpret,
    )(t2(visit, N), t2(level, N), t2(state.npred, N), predT, meta)

    NP = state.pred.shape[1]

    def ut(x):
        return jnp.transpose(x)[:W, :NP]

    if with_iters:
        return (ut(lvlT), ut(orderT), ut(rankT), meta_out[0, :W] != 0,
                meta_out[1, :W])
    return ut(lvlT), ut(orderT), ut(rankT), meta_out[0, :W] != 0


# --------------------------------------------------------------------------
# Kernel 4: heaviest-bundle consensus, lockstep over windows (semantics:
# poa_ops.consensus; reference: cudapoa_generate_consensus.cuh [U]).
#
# Scores by the same monotone Gauss-Seidel v-sweep as topsort (score[u] =
# wmax[u] + max over heaviest-edge preds' scores; the unique DAG fixpoint,
# reached monotonically from NEG since real scores are >= 0).  best_pred
# needs score[pred] per slot — one more v-sweep fills (P, N, W) planes
# without gathers.  The backtrack walk runs lockstep across windows: each
# step is one (N, W) masked gather of best_pred + one (MC, W) masked
# write, so 128 windows chase pointers for the cost of ~2 plane ops/step.
# --------------------------------------------------------------------------

def _build_consensus_kernel(bs: BatchSize):
    N = round_up(bs.padded_nodes, 8)
    P = bs.max_pred_per_node
    MC = bs.max_consensus_size
    MCS = round_up(MC, 8)
    BIG = 2**30

    def kernel(orderT, npredT, pred_in, predw_in, baseT, covT, rankT, meta,
               codesT, covsT, meta_out, scoreT, psT, bpT, bufT, predS,
               dma_sem):
        W = npredT.shape[-1]
        # The (P, N, W) pred/predw planes stay in HBM (ANY space) and are
        # DMA-seeded into scratch ONCE per grid step — the _wrap_add
        # pattern.  As double-buffered VMEM inputs they cost 4 plane
        # copies (2 x 2); as scratch they cost 2 (pred persists in predS,
        # predw stages through psT, which is dead weight after the tie
        # planes are derived below).  At the product correction-polish
        # shape (P=16, N=384) that is the difference between 18.5 MiB
        # (compile-time Mosaic OOM, bench_logs/0820_0621_correct_scale.log)
        # and ~10.6 MiB.
        g = pl.program_id(0)
        lanes = pl.ds(g * W, W)
        cp = pltpu.make_async_copy(pred_in.at[:, :, lanes], predS, dma_sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(predw_in.at[:, :, lanes], psT, dma_sem)
        cp.start()
        cp.wait()
        iN = _siota(N, W)
        iMC = _siota(MCS, W)
        ncr = meta[pl.ds(0, 1)]
        act = iN < ncr
        npv = npredT[...]

        # Setup runs as fori_loops over the pred slot, NOT unrolled
        # straight-line code: Mosaic reuses scoped-stack slots across a
        # loop REGION's iterations but allocates every top-level SSA
        # temporary uniquely — the unrolled P=16 setup held ~2P (N, W)
        # planes live (w_p + slot masks), measured 16.32 MiB at the
        # product polish shape (0820_0947_correct_w128.log) and still
        # over-limit at N=512 after inline recomputation
        # (0820_1318_poa_phases3.log).  A loop body is traced once, so
        # only ~2 temporary planes exist regardless of P.
        def _slot_w_dyn(p):
            # psT[p] with a TRACED index: (1, N, W) dynamic slice -> (N, W)
            wp = psT[pl.ds(p, 1)][0]
            return jnp.where((p < npv) & act, wp, NEG)

        wmax = jax.lax.fori_loop(
            0, P,
            lambda p, wm: jnp.maximum(wm, _slot_w_dyn(p)),
            jnp.full((N, W), NEG, jnp.int32))
        # tie bits packed into int32 planes (bit p%32 of plane p//32 =
        # "slot p achieves wmax") so P live bool planes don't sit in VMEM
        # across the sweep loops; unpacked per-p at each use site.
        ntie = (P + 31) // 32
        if ntie == 1:
            tie_planes = [jax.lax.fori_loop(
                0, P,
                lambda p, tp: tp | jnp.where(_slot_w_dyn(p) == wmax,
                                             jnp.left_shift(1, p), 0),
                jnp.zeros((N, W), jnp.int32))]
        else:
            # P > 32 (no product shape): unrolled per-plane accumulation
            tie_planes = [jnp.zeros((N, W), jnp.int32) for _ in range(ntie)]
            for p in range(P):
                tie_planes[p // 32] = tie_planes[p // 32] | jnp.where(
                    _slot_w_dyn(jnp.int32(p)) == wmax, 1 << (p % 32), 0)

        def tie1(p):
            return ((tie_planes[p // 32] >> (p % 32)) & 1) != 0

        has = npv > 0

        scoreT[...] = jnp.where(act & ~has, 0, NEG)

        def sweep(c):
            _, it = c

            def vstep(i, ch):
                # consensus runs AFTER the final topsort, so orderT is an
                # EXACT per-window topological order: the monotone score
                # relaxation converges in one productive sweep (vs one
                # sweep per id-order inversion — the 16 ms pileup cost).
                # sv via one-hot masked max == the old scoreT[v] row read
                # (scoreT >= NEG always, see topsort kernel note).
                v_row = orderT[pl.ds(i, 1)]
                m_v = iN == v_row
                sv = jnp.max(jnp.where(m_v, scoreT[...], NEG),
                             axis=0, keepdims=True)
                cand = wmax + sv
                upd = jnp.zeros((N, W), jnp.bool_)
                for p in range(P):
                    upd = upd | (tie1(p) & (predS[p] == v_row))
                need = upd & has & (scoreT[...] < cand)
                scoreT[...] = jnp.where(need, cand, scoreT[...])
                return ch | jnp.any(need)

            ch = jax.lax.fori_loop(0, N, vstep, jnp.bool_(False))
            return ch, it + 1

        jax.lax.while_loop(lambda c: c[0] & (c[1] < N + 2), sweep,
                           (jnp.bool_(True), jnp.int32(0)))

        # fill per-slot pred scores (final), then pick the first slot
        # achieving the lexicographic max (slots are pred-index-sorted)
        for p in range(P):
            psT[p] = jnp.full((N, W), NEG, jnp.int32)

        def fill(v, _):
            sv = scoreT[pl.ds(v, 1)]
            for p in range(P):
                psT[p] = jnp.where(tie1(p) & (predS[p] == v),
                                   jnp.broadcast_to(sv, (N, W)), psT[p])
            return ()

        jax.lax.fori_loop(0, N, fill, ())
        # best-pred pick: fori_loops for the same scoped-stack reason as
        # the setup above (top-level unrolled P-chains don't get their
        # temporaries reused)
        smax = jax.lax.fori_loop(
            0, P,
            lambda p, sm: jnp.maximum(sm, psT[pl.ds(p, 1)][0]),
            jnp.full((N, W), NEG, jnp.int32))
        if ntie == 1:
            # `found` rides as an int32 0/1 plane: a vector-mask (i1)
            # loop carry fails Mosaic's scf.for legalization
            # (0820_1512_correct_full4.log)
            def pick(p, c):
                found, bp = c
                tb = ((tie_planes[0] >> p) & 1) != 0
                hit = tb & (psT[pl.ds(p, 1)][0] == smax) & (found == 0)
                return (jnp.where(hit, 1, found),
                        jnp.where(hit, predS[pl.ds(p, 1)][0], bp))

            found, bp = jax.lax.fori_loop(
                0, P, pick, (jnp.zeros((N, W), jnp.int32),
                             jnp.full((N, W), -1, jnp.int32)))
        else:
            found = jnp.zeros((N, W), jnp.bool_)
            bp = jnp.full((N, W), -1, jnp.int32)
            for p in range(P):
                hit = tie1(p) & (psT[p] == smax) & ~found
                bp = jnp.where(hit, predS[p], bp)
                found = found | hit
        bpT[...] = jnp.where(act & has, bp, -1)

        # end node: max score, tie -> smallest rank
        smax_all = jnp.max(jnp.where(act, scoreT[...], NEG), axis=0,
                           keepdims=True)
        tie_end = act & (scoreT[...] == smax_all)
        minr = jnp.min(jnp.where(tie_end, rankT[...], BIG), axis=0,
                       keepdims=True)
        end = jnp.sum(jnp.where(tie_end & (rankT[...] == minr), iN, 0),
                      axis=0, keepdims=True)

        # lockstep backtrack walk
        bufT[...] = jnp.full((MCS, W), -1, jnp.int32)

        def wstep(_, c):
            u_row, k_row = c
            aliveW = (u_row >= 0) & (k_row > 0)
            mask_k = iMC == jnp.clip(k_row - 1, 0, MCS - 1)
            bufT[...] = jnp.where(mask_k & aliveW,
                                  jnp.broadcast_to(u_row, (MCS, W)),
                                  bufT[...])
            m_u = iN == jnp.clip(u_row, 0, N - 1)
            bp_u = jnp.sum(jnp.where(m_u, bpT[...], 0), axis=0,
                           keepdims=True)
            u_row = jnp.where(aliveW, bp_u, u_row)
            k_row = k_row - jnp.where(aliveW, 1, 0)
            return u_row, k_row

        u0 = jnp.where(ncr > 0, end, -1)
        _, k_row = jax.lax.fori_loop(
            0, MC, wstep, (u0, jnp.full((1, W), MC, jnp.int32)))
        length = MC - k_row

        # emit codes/covs shifted to the front
        def estep(i, _):
            valid = i < length
            src = jnp.clip(i + k_row, 0, MCS - 1)
            m_s = iMC == src
            node = jnp.sum(jnp.where(m_s, bufT[...], 0), axis=0,
                           keepdims=True)
            m_n = iN == jnp.clip(node, 0, N - 1)
            b = jnp.sum(jnp.where(m_n, baseT[...], 0), axis=0,
                        keepdims=True)
            c = jnp.sum(jnp.where(m_n, covT[...], 0), axis=0,
                        keepdims=True)
            codesT[pl.ds(i, 1)] = jnp.where(valid, b, -1)
            covsT[pl.ds(i, 1)] = jnp.where(valid, c, 0)
            return ()

        jax.lax.fori_loop(0, MC, estep, ())
        if MCS > MC:
            codesT[pl.ds(MC, MCS - MC)] = jnp.full((MCS - MC, W), -1,
                                                   jnp.int32)
            covsT[pl.ds(MC, MCS - MC)] = jnp.zeros((MCS - MC, W),
                                                   jnp.int32)

        mo = jnp.zeros((8, W), jnp.int32)
        mo = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (8, W), 0) == 0,
                       jnp.broadcast_to(length, (8, W)), mo)
        meta_out[...] = mo

    return kernel, dict(N=N, P=P, MC=MC, MCS=MCS)


def _consensus_pallas(bs: BatchSize, interpret: bool, state, rank):
    """Lockstep consensus over all windows.  Returns (codes (W, MC),
    covs (W, MC), length (W,)) matching poa_ops.consensus bit-for-bit.

    The score sweep's visit order is argsort(rank) — an EXACT topological
    order at consensus time, always a permutation even on overflow
    windows (unlike the topsort kernel's `order` output, whose
    non-converged levels can overflow the counting-sort buckets) — so
    the relaxation converges in one productive sweep."""
    W = rank.shape[0]
    kernel, d = _build_consensus_kernel(bs)
    N, P, MC, MCS = d["N"], d["P"], d["MC"], d["MCS"]
    LANES = 128
    Wp = round_up(W, LANES)
    order = jnp.argsort(rank.astype(jnp.int32), axis=1)

    def t2(x, rows, fill=0):
        x = jnp.transpose(x.astype(jnp.int32))
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, Wp - W)),
                       constant_values=fill)

    def t3(x, fill=0):
        x = jnp.transpose(x.astype(jnp.int32), (2, 1, 0))
        return jnp.pad(x, ((0, 0), (0, N - x.shape[1]), (0, Wp - W)),
                       constant_values=fill)

    meta = jnp.zeros((8, Wp), jnp.int32)
    meta = meta.at[0, :W].set(state.node_count.astype(jnp.int32))

    def spec(*shape):
        return pl.BlockSpec(shape + (LANES,),
                            lambda w: (0,) * len(shape) + (w,),
                            memory_space=pltpu.VMEM)

    # pred/predw ride in HBM (ANY) and are kernel-DMA'd into scratch once:
    # see the VMEM note in _build_consensus_kernel.
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    codesT, covsT, meta_out = pl.pallas_call(
        kernel,
        grid=(Wp // LANES,),
        in_specs=[spec(N), spec(N), any_spec, any_spec, spec(N),
                  spec(N), spec(N), spec(8)],
        out_specs=(spec(MCS), spec(MCS), spec(8)),
        out_shape=(jax.ShapeDtypeStruct((MCS, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((MCS, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((8, Wp), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((N, LANES), jnp.int32),
                        pltpu.VMEM((P, N, LANES), jnp.int32),
                        pltpu.VMEM((N, LANES), jnp.int32),
                        pltpu.VMEM((MCS, LANES), jnp.int32),
                        pltpu.VMEM((P, N, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(t2(order, N), t2(state.npred, N), t3(state.pred, -1), t3(state.predw),
      t2(state.base, N, -1), t2(state.cov, N), t2(rank, N), meta)

    def ut(x, n):
        return jnp.transpose(x)[:W, :n]

    return ut(codesT, MC), ut(covsT, MC), meta_out[0, :W]


# --------------------------------------------------------------------------
# Kernel 5: MSA column assignment + gapped rows, lockstep over windows
# (semantics: poa_ops.msa_columns + msa_rows; reference:
# cudapoa_generate_msa.cuh [U]).
#
# Columns: sequential over rank r (u = order[r] is a direct sublane-row
# read), lockstep over windows.  The clique gather (u's aligned members,
# their preds' columns) is ~50 (N, W) masked reduces per step — the same
# plane idiom as the add kernel, so 128 windows pay together what one
# window's XLA gather chain costs.  Rows: grid dim s walks the per-
# sequence paths; each path step is one column gather + one masked
# row-plane write.  col lives in scratch across the s-steps of a window
# block (computed once at s == 0), so the whole phase is one kernel and
# col never round-trips HBM.
# --------------------------------------------------------------------------

def _build_msa_kernel(bs: BatchSize):
    N = round_up(bs.padded_nodes, 8)
    P = bs.max_pred_per_node
    A = bs.max_aligned_per_node
    L = bs.padded_seq

    def kernel(orderT, npredT, naligT, baseT, predT, aligT, pathsT, meta,
               rowsT, meta_out, colT):
        W = npredT.shape[-1]
        s = pl.program_id(1)
        iN = _siota(N, W)
        ncr = meta[pl.ds(0, 1)]
        act = iN < ncr

        @pl.when(s == 0)
        def _columns():
            colT[...] = jnp.full((N, W), -1, jnp.int32)

            def rstep(r, _):
                u = orderT[pl.ds(r, 1)]               # (1, W), in [0, N)
                m_u = _eqmask(N, u)
                unassigned = _gather(colT[...], m_u) < 0
                nal = _gather(naligT[...], m_u)
                do = (r < ncr) & unassigned
                # group = u + its aligned clique; column = 1 + max over
                # all members' preds' columns (invalid slots -> -1)
                members = [(u, jnp.ones((1, W), jnp.bool_))]
                for a in range(A):
                    members.append((_gather(aligT[a], m_u), a < nal))
                c = jnp.full((1, W), -1, jnp.int32)
                for mem, ok_m in members:
                    in_rng = (mem >= 0) & (mem < N)
                    m_m = _eqmask(N, jnp.clip(mem, 0, N - 1))
                    np_m = jnp.where(in_rng, _gather(npredT[...], m_m), 0)
                    for p in range(P):
                        gp = jnp.where(in_rng, _gather(predT[p], m_m), -1)
                        pok = ok_m & (p < np_m)
                        gp_rng = (gp >= 0) & (gp < N)
                        m_gp = _eqmask(N, jnp.clip(gp, 0, N - 1))
                        pc = jnp.where(gp_rng, _gather(colT[...], m_gp), -1)
                        c = jnp.maximum(c, jnp.where(pok, pc, -1))
                c = c + 1
                for mem, ok_m in members:
                    wmask = ok_m & do & (mem >= 0)
                    m_m = _eqmask(N, jnp.clip(mem, 0, N - 1))
                    colT[...] = jnp.where(
                        m_m & wmask, jnp.broadcast_to(c, (N, W)), colT[...])
                return ()

            jax.lax.fori_loop(0, N, rstep, ())

        # n_cols (recomputed every s-step from the persistent scratch —
        # idempotent, keeps the output block defined on every visit)
        ncols = jnp.max(jnp.where(act, colT[...], -1), axis=0,
                        keepdims=True) + 1
        mo = jnp.zeros((8, W), jnp.int32)
        mo = jnp.where(_siota(8, W) == 0, jnp.broadcast_to(ncols, (8, W)),
                       mo)
        meta_out[...] = mo

        # gapped row for sequence s: row[col[path[j]]] = base[path[j]]
        rowsT[0] = jnp.full((N, W), -1, jnp.int32)

        def jstep(j, _):
            pn = pathsT[0, pl.ds(j, 1), :]            # (1, W)
            pn_ok = pn >= 0
            m_pn = _eqmask(N, jnp.clip(pn, 0, N - 1))
            c = jnp.where(pn_ok, _gather(colT[...], m_pn), -1)
            b = _gather(baseT[...], m_pn)
            c_ok = pn_ok & (c >= 0) & (c < N)
            m_c = _eqmask(N, jnp.clip(c, 0, N - 1))
            rowsT[0] = jnp.where(m_c & c_ok, jnp.broadcast_to(b, (N, W)),
                                 rowsT[0])
            return ()

        jax.lax.fori_loop(0, L, jstep, ())

    return kernel, dict(N=N, P=P, A=A, L=L)


def _msa_pallas(bs: BatchSize, interpret: bool, state, order):
    """Lockstep MSA over all windows.  Returns (rows (W, S, NP), n_cols
    (W,)) matching vmapped poa_ops.msa_columns + msa_rows(max_cols=NP)."""
    W = order.shape[0]
    S = state.paths.shape[1]
    kernel, d = _build_msa_kernel(bs)
    N, P, A, L = d["N"], d["P"], d["A"], d["L"]
    LANES = 128
    Wp = round_up(W, LANES)

    def t2(x, rows, fill=0):
        x = jnp.transpose(x.astype(jnp.int32))
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, Wp - W)),
                       constant_values=fill)

    def t3(x, fill=0):
        x = jnp.transpose(x.astype(jnp.int32), (2, 1, 0))
        return jnp.pad(x, ((0, 0), (0, N - x.shape[1]), (0, Wp - W)),
                       constant_values=fill)

    pathsT = jnp.transpose(state.paths.astype(jnp.int32), (1, 2, 0))
    pathsT = jnp.pad(pathsT, ((0, 0), (0, 0), (0, Wp - W)),
                     constant_values=-1)
    meta = jnp.zeros((8, Wp), jnp.int32)
    meta = meta.at[0, :W].set(state.node_count.astype(jnp.int32))

    def spec(*shape):
        return pl.BlockSpec(shape + (LANES,),
                            lambda w, s: (0,) * len(shape) + (w,),
                            memory_space=pltpu.VMEM)

    def sspec(rows):
        return pl.BlockSpec((1, rows, LANES), lambda w, s: (s, 0, w),
                            memory_space=pltpu.VMEM)

    rowsT, meta_out = pl.pallas_call(
        kernel,
        grid=(Wp // LANES, S),
        in_specs=[spec(N), spec(N), spec(N), spec(N), spec(P, N),
                  spec(A, N), sspec(L), spec(8)],
        out_specs=(sspec(N), spec(8)),
        out_shape=(jax.ShapeDtypeStruct((S, N, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((8, Wp), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((N, LANES), jnp.int32)],
        interpret=interpret,
    )(t2(order, N), t2(state.npred, N), t2(state.nalig, N),
      t2(state.base, N, -1), t3(state.pred, -1), t3(state.alig, -1),
      pathsT, meta)

    NP = state.pred.shape[1]
    rows = jnp.transpose(rowsT, (2, 0, 1))[:W, :, :NP]
    return rows, meta_out[0, :W]


#: VMEM budget for the v2 plane layout (one v5e core has ~16 MiB; leave
#: headroom for Mosaic temporaries).  Shared by models/poa's backend
#: routing and scripts/bench_poa_v2.py's skip guard.
VMEM_BUDGET = 14 * 2**20


def vmem_bytes_estimate(bs: BatchSize, msa: bool = False,
                        WPG: int = 8) -> int:
    """Peak VMEM one grid step of the fattest v2 kernel needs, modeling
    ALL FIVE kernels.  (The round-4 version returned max(add, nwtb) only;
    the unmodeled consensus kernel OOM'd at Mosaic compile time on the
    product w128/depth-16 correction shape — 18.50 MiB vs the 16 MiB
    scoped limit, bench_logs/0820_0621_correct_scale.log — so `cli
    correct` crashed on chip at default settings.  Same estimator mistake
    as the diag-NW one fixed in cbaba98.)

    Accounting rules, matched by tests/test_vmem_estimator.py's
    structural bound test and calibrated against four measured Mosaic
    allocations (18.50/16.32/19.50 MiB OOMs at grid 32/16/16; grid=1
    profiler runs that fit): at grid == 1 every VMEM block is held ONCE;
    at grid > 1 the Pallas pipeline double-buffers EVERY grid-indexed
    VMEM in/out block (input_output_aliases included).  models/poa
    therefore dispatches the lane-axis kernels in 128-window slices
    (grid=1); only the nwtb kernel (grid Wp/WPG) and MSA (grid (1, S))
    still pay the x2.  Scratch is single; ANY-space (HBM) operands are
    zero; SMEM is a separate budget.  Live value planes Mosaic keeps on
    the scoped stack beyond the spec-visible blocks get modeled
    allowances.  models/poa routes configs whose estimate exceeds the
    ~14 MiB/core budget away from this backend (WPG 16 -> 8 -> v1/XLA)."""
    N = round_up(bs.padded_nodes, 8)
    P = bs.max_pred_per_node
    A = bs.max_aligned_per_node
    L = bs.padded_seq
    L1 = round_up(L + 1, 128)
    L128 = round_up(L, 128)
    TLS = round_up(N + L, 128)
    MCS = round_up(bs.max_consensus_size, 8)
    NL = round_up(N + 1, 8)
    N3 = round_up(N + 3, 8)
    W = 128
    # add (grid=1): state planes ONCE (ANY ins DMA-seeded into aliased
    # out blocks) + pn/pp/seq/w/meta ins + meta_out/paths outs + targ/sj
    # scratch + ~4 live value planes (pass temporaries)
    add_bytes = 4 * W * (N * (5 + 2 * P + A)
                         + 4 * TLS + 3 * L128 + 24
                         + 4 * N)
    # nwtb (grid Wp/WPG > 1): scores + moves scratch volumes + dbuf
    # seq-in and pn/pp-out blocks
    nwtb_bytes = 4 * (2 * N3 * WPG * L1
                      + 2 * WPG * L1
                      + 2 * 2 * WPG * TLS)
    # topsort (grid=1): visit/prev/npred (N) x3 + pred (P,N) + meta +
    # lvl/order/rank (N) x3 + meta_out + lvlE/cnt/off scratch + ~4 live
    topsort_bytes = 4 * W * (6 * N + P * N + 16
                             + N + 2 * NL + 4 * N)
    # consensus (grid=1): order/npred/base/cov/rank (N) x5 + meta +
    # codes/covs (MCS) x2 + meta_out + score/ps/bp/buf/predS scratch
    # (pred and predw are ANY-space, DMA-staged through predS/psT) +
    # ~7 live value planes (wmax/tie/has/act + loop temporaries)
    cons_bytes = 4 * W * (5 * N + 2 * MCS + 16
                          + 2 * N + 2 * P * N + MCS
                          + (7 + (P + 31) // 32) * N)
    # msa (grid (1, S) — still multi-step, so dbuf stands): order/npred/
    # nalig/base (N) x4 + pred (P,N) + alig (A,N) + paths (L) + meta +
    # rows (N) + meta_out, x2 + col scratch
    msa_bytes = (4 * W * (2 * (5 * N + P * N + A * N + L + 16) + N)
                 if msa else 0)
    return max(add_bytes, nwtb_bytes, topsort_bytes, cons_bytes, msa_bytes)


# --------------------------------------------------------------------------
# Orchestrator: the per-sequence pipeline of models/poa._graph_scan with
# the hot phases swapped to the lockstep kernels.  `phases` selects which
# phases run as Pallas kernels (the rest stay vmapped poa_ops XLA) — the
# dev/bisection surface; production uses the default.
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("bs", "sc", "banded", "msa",
                                             "interpret", "phases", "WPG",
                                             "moves_tb", "tb_mode"))
def poa_batch_pallas2(seqs, weights, lens, n_seqs, bs: BatchSize,
                      sc: PoaScores, banded: bool = False, msa: bool = False,
                      interpret: bool = False,
                      phases: tuple = ("nwtb", "add", "topsort",
                                       "consensus", "msa"),
                      WPG: int = 8, moves_tb: bool = True,
                      tb_mode: str = "sweep"):
    """Same contract as models/poa._build_program(bs, sc, msa, banded):
    returns (codes (W, MC), covs (W, MC), length (W,), rows (W, S, MCOL),
    n_cols (W,), status (W,))."""
    N = bs.padded_nodes
    S = bs.max_sequences_per_poa
    MC = bs.max_consensus_size
    TL = N + bs.padded_seq
    seqs = jnp.asarray(seqs, jnp.int32)
    weights = jnp.asarray(weights, jnp.int32)
    lens = jnp.asarray(lens, jnp.int32)
    n_seqs = jnp.asarray(n_seqs, jnp.int32)

    state = jax.vmap(lambda s0, w0, l0: poa_ops.init_state(bs, s0, w0, l0))(
        seqs[:, 0], weights[:, 0], lens[:, 0])
    level0 = jnp.where(jnp.arange(N)[None, :] < lens[:, :1],
                       jnp.arange(N, dtype=jnp.int32)[None, :], 0)

    # visit-order guessing pays on deep-pileup shapes where id-order
    # inversions pile up (the 56 ms/step topsort wall at P=S=16); on the
    # small consensus config the identity sweep already converges fast and
    # the guess's XLA argsort/gathers would be pure overhead
    use_guess = ("topsort" in phases
                 and (N >= 384 or bs.max_pred_per_node > 4))

    def run_topsort(state, level, visit=None):
        if "topsort" in phases:
            return _topsort_pallas(bs, interpret, state, level, visit)
        return jax.vmap(
            lambda st, lv: poa_ops.topsort(st, lv, N + 2))(state, level)

    def add_seq(carry, x):
        state, level, visit = carry
        seq, w, slen, s_idx = x
        alive = (s_idx < n_seqs) & (state.status == StatusType.SUCCESS)
        new_level, order, rank, ok = run_topsort(state, level, visit)

        if "nwtb" in phases:
            pn, pp, k0, band_ok = _nwtb_pallas(
                bs, sc, banded, interpret, WPG, seq, order, rank,
                state.npred, state.base, state.nsucc, state.pred,
                slen, state.node_count, alive, moves_tb, tb_mode)
        else:
            bw = bs.band_width if banded else 0
            Smat = jax.vmap(
                lambda st, o, r, sq, sl: poa_ops.graph_nw(
                    st, o, r, sq, sl, sc, band_width=bw))(
                state, order, rank, seq, slen)
            pn, pp, k0, band_ok = jax.vmap(
                lambda st, o, r, sm, sq, sl: poa_ops.nw_traceback(
                    st, o, r, sm, sq, sl, sc, TL))(
                state, order, rank, Smat, seq, slen)

        act = alive & band_ok
        if "add" in phases:
            upd = _add_pallas(bs, msa, interpret, state, pn, pp, seq, w,
                              k0, act)
            paths = state.paths
            if msa:
                paths = jax.vmap(
                    lambda pth, row: pth.at[jnp.clip(s_idx, 0, S - 1)]
                    .set(row))(paths, upd["path_row"])
                paths = jnp.where(act[:, None, None], paths, state.paths)
            new_state = poa_ops.PoaState(
                base=upd["base"], cov=upd["cov"], npred=upd["npred"],
                pred=upd["pred"], predw=upd["predw"], nsucc=upd["nsucc"],
                nalig=upd["nalig"], alig=upd["alig"],
                node_count=upd["node_count"], status=upd["status"],
                paths=paths)
        else:
            new_state = jax.vmap(
                lambda st, a, b_, sq, ww, k: poa_ops.add_alignment(
                    st, a, b_, sq, ww, s_idx, bs, path_start=k))(
                state, pn, pp, seq, w, k0)
            # mirror the kernel's gating: no mutation unless act
            new_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    act.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
                new_state, state)

        status = new_state.status
        status = jnp.where(alive & band_ok & ~ok,
                           jnp.int32(StatusType.LOOP_COUNT_EXCEEDED_UPPER_BOUND),
                           status)
        status = jnp.where(alive & ~band_ok,
                           jnp.int32(StatusType.EXCEEDED_BAND_WIDTH), status)
        status = jnp.where(alive, status, state.status)
        new_state = new_state._replace(status=status)
        level = jnp.where(alive[:, None], new_level, level)
        if use_guess:
            visit = topsort_guess(state.node_count, new_state.node_count,
                                  new_state.pred[:, :, 0].astype(jnp.int32),
                                  level, N)
        return (new_state, level, visit), ()

    xs = (jnp.swapaxes(seqs[:, 1:], 0, 1), jnp.swapaxes(weights[:, 1:], 0, 1),
          jnp.swapaxes(lens[:, 1:], 0, 1), jnp.arange(1, S, dtype=jnp.int32))
    W0 = seqs.shape[0]
    visit0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                              (W0, N))
    (state, level, visit), _ = jax.lax.scan(
        add_seq, (state, level0, visit0), xs)

    _, order, rank, _ = run_topsort(state, level, visit)
    if "consensus" in phases:
        codes, covs, length = _consensus_pallas(bs, interpret, state, rank)
    else:
        codes, covs, length = jax.vmap(
            lambda st, o, r: poa_ops.consensus(st, o, r, MC))(
            state, order, rank)
    if msa and "msa" in phases:
        rows, n_cols = _msa_pallas(bs, interpret, state, order)
    elif msa:
        col, n_cols = jax.vmap(poa_ops.msa_columns)(state, order, rank)
        rows = jax.vmap(
            lambda st, c, n: poa_ops.msa_rows(st, c, n, N))(
            state, col, n_cols)
    else:
        W = seqs.shape[0]
        rows = jnp.zeros((W, S, 1), jnp.int32)
        n_cols = jnp.zeros((W,), jnp.int32)
    return codes, covs, length, rows, n_cols, state.status
