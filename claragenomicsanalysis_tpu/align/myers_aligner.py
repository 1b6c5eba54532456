"""Myers-scored alignment with banded traceback.

The reference's Myers aligner stores full PV/MV delta columns and backtraces
them on-device (reference: cudaaligner/src/myers_gpu.cu [U]).  The TPU design
avoids materializing O(n*m/32) bit columns entirely:

1. run the Myers bit-vector kernel (ops/myers.py) to get each pair's exact
   edit distance s;
2. re-run the canonical banded-NW kernel with band radius r >= s — except
   pairs whose banded traceback array would exceed TB_BYTES_PER_PROBLEM,
   which route to the linear-memory Hirschberg driver instead (optimal but
   not canonical-tie-break paths; same caveat as the reference's
   Hirschberg path).

Any optimal path stays within |i-j| <= s (each off-diagonal step costs 1),
and for every cell on an optimal path the banded DP value equals the dense
value, while banded values elsewhere only increase — so the banded traceback
reproduces the *dense canonical* path exactly.  Pairs are bucketed by
power-of-two band radius so only O(log L) XLA executables exist.
"""

import numpy as np

from ..core.config import AlignerConfig
from ..core.status import StatusType
from ..ops import nw_band
from ..ops.myers import myers_bottom_row_best as myers_bottom_row


#: per-problem traceback budget for the XLA backend: above this, the
#: UNPACKED banded tb array (Lq x W bytes each) costs more to materialize
#: than a Hirschberg re-solve — long pairs route to the linear-memory path
#: (the reference's own long-pair answer, hirschberg_myers_gpu.cu [U]).
TB_BYTES_PER_PROBLEM = 1 << 18

#: per-problem budget for the Pallas backend, counted on the PACKED tb
#: (4 codes/byte).  Sized by the device decode kernel's VMEM arithmetic:
#: per grid step it holds the packed block double-buffered (2x PB int8)
#: plus the (Lq/4, W) int32 expansion scratch (4x PB), so PB <=
#: 14 MiB / 6.  Routing matters twice over: a 3 kb overlap span at
#: ~10 % combined error needs r ~= 512 (787 KiB packed), and a 5 kb
#: span in the Lq=8192 bucket at r=512 needs 2.13 MiB — 1.7 % over the
#: old flat 2 MiB cap, which pushed HALF the 1000x5kb correction spans
#: onto the O(Lq*Lt) Hirschberg path (129 s of a 228 s run,
#: 0820_1512_correct_full_s8.log).  Hirschberg costs 2x the FULL dense
#: DP; the banded path at r=512 is ~30,000x fewer cells.
TB_BYTES_PER_PROBLEM_PACKED = (14 << 20) // 6

#: device-memory budget per banded re-run dispatch (bounds tb bytes in
#: flight; mirrors Aligner.MEM_BUDGET_PER_DISPATCH)
MEM_BUDGET_PER_DISPATCH = 1 << 28


def banded_escalate_align_batch(q, qlen, t, tlen, cfg: AlignerConfig,
                                backend: str = "auto",
                                queries: list[str] | None = None,
                                targets: list[str] | None = None):
    """Score-free variant of myers_align_batch: SKIP the O(Lq*Lt) Myers
    scoring pass and run the banded kernel directly at escalating pow2
    band radii.

    Soundness: the banded score s' always satisfies s' >= s (the dense
    edit distance), and if s' <= r then every dense-optimal path stays
    within |i - j| <= s <= r, so the band contains the dense optimum:
    s' == s and the banded traceback IS the canonical dense path —
    identical to what myers_align_batch would return.  Pairs with
    s' > r double the radius and redo; radii whose banded layouts are
    VMEM/tb-budget-infeasible route to Hirschberg (optimal paths,
    non-canonical tie-breaks — the same long-span contract as the Myers
    path).

    Why: the Myers pass costs Lq*Lt cells per pair regardless of
    similarity — 36 Tcells for one 400x3kb correction part, ~9 s of its
    11.65 s align stage — while the banded pass it gates costs
    Lq*W(r) ~ 100x less on well-matched overlap spans.  The start
    radius pow2(max(|lq-lt|, (lq+lt)/12)) resolves ~10 %-divergent
    spans in one round."""
    from ..utils.profiling import trace_range
    from ..ops.banded import resolve, tb_bytes_per_problem
    kind, nw_fn, decode_fn = resolve(backend)
    use_pallas = kind != "xla"
    B = q.shape[0]
    Lq, Lt = q.shape[1], t.shape[1]
    qlen = np.asarray(qlen)
    tlen = np.asarray(tlen)
    paths: list[list[int]] = [[] for _ in range(B)]
    dists = np.zeros(B, np.int32)
    statuses = np.full(B, int(StatusType.SUCCESS))
    tb_cap = (TB_BYTES_PER_PROBLEM_PACKED if use_pallas
              else TB_BYTES_PER_PROBLEM)

    def infeasible(r):
        if (queries is not None
                and tb_bytes_per_problem(Lq, Lt, r, kind) > tb_cap):
            return True
        if not use_pallas:
            return False
        from ..ops.nw_band_pallas import ROW_VMEM_BUDGET, vmem_row_bytes
        from ..ops.nw_diag_pallas import VMEM_BLOCK_BUDGET, vmem_block_bytes
        return (queries is not None
                and vmem_block_bytes(Lq, Lt, r) > VMEM_BLOCK_BUDGET
                and vmem_row_bytes(Lq, Lt, r) > ROW_VMEM_BUDGET)

    r_of: dict[int, int] = {}
    hirsch: list[int] = []
    for b in range(B):
        if qlen[b] == 0 and tlen[b] == 0:
            continue
        guess = max(abs(int(qlen[b]) - int(tlen[b])),
                    (int(qlen[b]) + int(tlen[b])) // 12, 8)
        r = 1 << int(guess - 1).bit_length()
        while infeasible(r) and r > 8:
            r //= 2        # start at the largest feasible radius instead
        if infeasible(r):
            hirsch.append(b)
        else:
            r_of[b] = r

    while r_of:
        buckets: dict[int, list[int]] = {}
        for b, r in r_of.items():
            buckets.setdefault(r, []).append(b)
        next_r: dict[int, int] = {}
        for r, idxs in sorted(buckets.items()):
            per = max(1, tb_bytes_per_problem(Lq, Lt, r, kind))
            chunk = max(8, min(len(idxs), MEM_BUDGET_PER_DISPATCH // per))
            for s0 in range(0, len(idxs), chunk):
                sel = np.array(idxs[s0: s0 + chunk])
                with trace_range("aligner.banded_escalate.nw"):
                    sc, tb = nw_fn(q[sel], qlen[sel], t[sel], tlen[sel], r)
                    sc = np.asarray(sc)[: len(sel)]
                resolved = sc <= r
                if resolved.any():
                    with trace_range("aligner.banded_escalate.decode"):
                        sub = decode_fn(tb, qlen[sel], tlen[sel], r)
                    for k, b in enumerate(sel):
                        if resolved[k]:
                            paths[b] = sub[k]
                            dists[b] = sc[k]
                for k, b in enumerate(sel):
                    if not resolved[k]:
                        r2 = 2 * r       # plain doubling: overshoot <= 2x
                        if infeasible(r2):
                            hirsch.append(int(b))
                        else:
                            next_r[int(b)] = r2
        r_of = next_r

    if hirsch:
        from .hirschberg import hirschberg_align_batch
        assert queries is not None and targets is not None, \
            "banded-escalate needs query/target strings for wide spans"
        with trace_range("aligner.myers.hirschberg"):
            h_paths, h_dists, _ = hirschberg_align_batch(
                [queries[b] for b in hirsch], [targets[b] for b in hirsch],
                cfg, backend=backend)
        for k, b in enumerate(hirsch):
            paths[b] = h_paths[k]
            dists[b] = h_dists[k]
    return paths, dists, statuses


def myers_align_batch(q, qlen, t, tlen, cfg: AlignerConfig,
                      backend: str = "auto",
                      queries: list[str] | None = None,
                      targets: list[str] | None = None):
    """Returns (paths, dists, statuses) for the packed batch."""
    from ..ops.banded import resolve, tb_bytes_per_problem
    # resolve() is the single validator: unknown backend strings raise
    # ValueError here exactly as in models/aligner._run_ukkonen (a typo
    # like "palas" must not silently become the XLA path)
    kind, nw_fn, decode_fn = resolve(backend)
    use_pallas = kind != "xla"

    from ..utils.profiling import trace_range
    B = q.shape[0]
    with trace_range("aligner.myers.score"):
        _, scores = myers_bottom_row(q, qlen, t, tlen)
        scores = np.asarray(scores)
    qlen = np.asarray(qlen)
    tlen = np.asarray(tlen)

    paths: list[list[int]] = [[] for _ in range(B)]
    statuses = np.full(B, int(StatusType.SUCCESS))
    # bucket by band radius = next pow2 >= s (s >= |n-m| always)
    radii = np.maximum(scores, 1)
    buckets: dict[int, list[int]] = {}
    hirsch: list[int] = []
    Lq = q.shape[1]
    tb_cap = (TB_BYTES_PER_PROBLEM_PACKED if use_pallas
              else TB_BYTES_PER_PROBLEM)
    # per-problem tb bytes of the SELECTED kernel layout (the Pallas kinds
    # pack 2-bit codes; sizing with the XLA 128-lane band_width would
    # overestimate up to ~5x and mis-route long low-error pairs to the
    # slow Hirschberg path)
    Lt = t.shape[1]

    def band_vmem_infeasible(r):
        # neither Pallas banded layout fits VMEM at this (Lq, Lt, r) —
        # e.g. r=1024 needs 20.77 MiB in the row layout (the round-5
        # correct_full crash, 0820_1318_correct_full.log).  Such wide-
        # band spans are exactly what the linear-memory Hirschberg path
        # exists for; routing them there also keeps them off banded.py's
        # slow XLA-twin safety net.
        if not use_pallas:
            return False
        from ..ops.nw_band_pallas import ROW_VMEM_BUDGET, vmem_row_bytes
        from ..ops.nw_diag_pallas import VMEM_BLOCK_BUDGET, vmem_block_bytes
        return (vmem_block_bytes(Lq, Lt, r) > VMEM_BLOCK_BUDGET
                and vmem_row_bytes(Lq, Lt, r) > ROW_VMEM_BUDGET)

    for b in range(B):
        if qlen[b] == 0 and tlen[b] == 0:
            continue                      # batch-padding rows: empty path
        r = 1 << int(radii[b] - 1).bit_length()
        r = max(r, 8)
        if (queries is not None and b < len(queries)
                and (tb_bytes_per_problem(Lq, Lt, r, kind) > tb_cap
                     or band_vmem_infeasible(r))):
            hirsch.append(b)
        else:
            buckets.setdefault(r, []).append(b)

    for r, idxs in sorted(buckets.items()):
        # chunk each bucket so per-dispatch tb bytes stay within budget
        per = max(1, tb_bytes_per_problem(Lq, Lt, r, kind))
        chunk = max(8, min(len(idxs), MEM_BUDGET_PER_DISPATCH // per))
        for s0 in range(0, len(idxs), chunk):
            sel = np.array(idxs[s0: s0 + chunk])
            with trace_range("aligner.myers.banded"):
                _, tb = nw_fn(q[sel], qlen[sel], t[sel], tlen[sel], r)
            with trace_range("aligner.myers.decode"):
                sub_paths = decode_fn(tb, qlen[sel], tlen[sel], r)
            for k, b in enumerate(idxs[s0: s0 + chunk]):
                paths[b] = sub_paths[k]

    if hirsch:
        from .hirschberg import hirschberg_align_batch
        with trace_range("aligner.myers.hirschberg"):
            h_paths, _, _ = hirschberg_align_batch(
                [queries[b] for b in hirsch], [targets[b] for b in hirsch],
                cfg, backend=backend)
        for k, b in enumerate(hirsch):
            paths[b] = h_paths[k]
    return paths, scores, statuses
