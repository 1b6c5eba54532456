"""Banded-NW device-kernel dispatch — ONE knob for the three consumers
(models/aligner._run_ukkonen, align/myers_aligner, align/hirschberg).

Two bit-identical Pallas kernels produce banded edit paths (reference
counterpart: the Ukkonen kernel + backtrace phases of
cudaaligner/src/ukkonen_gpu.cu [U]):

- "row"  (ops/nw_band_pallas.py): query-row sweep; pays a log2(W)-step
  min-plus prefix scan per row for the in-row deletion chain.
- "diag" (ops/nw_diag_pallas.py): anti-diagonal sweep; the chain
  disappears (cells on a diagonal are independent), one roll + 3-way min.

On-chip A/B (scripts/ablate_nw_diag.py, v5e 2026-08-19, B=1024 512 bp
r=64): diag 148.0 vs row 93.7 Gcells/s; e2e with host decode 480 vs 391
alignments/s.  Hence DEFAULT_KERNEL = "diag".  Both layouts decode on
device via ops/tb_decode_pallas (only packed path bytes leave the chip).

Backend strings accepted from the Aligner surface:
  "auto"        Pallas DEFAULT_KERNEL when a TPU is reachable, else XLA
  "pallas"      Pallas DEFAULT_KERNEL (interpret mode off-TPU)
  "pallas-row"  row kernel explicitly
  "pallas-diag" diag kernel explicitly
  "xla"         lax.scan twin + host decode
"""

from ..utils.mathutils import round_up

DEFAULT_KERNEL = "diag"


class _XlaTb:
    """Marker wrapping the XLA scan twin's traceback array when the
    'diag' kind fell back to it (both Pallas layouts VMEM-infeasible);
    decode_diag unwraps it for the host decoder."""

    def __init__(self, tb):
        self.tb = tb


def resolve(backend: str):
    """-> (kind, nw_fn, decode_fn) for a backend string.

    kind is 'row' | 'diag' | 'xla'.  nw_fn(q, qlen, t, tlen, r) returns
    (scores, tb); decode_fn(tb, qlen, tlen, r) returns path lists (device
    decode for the Pallas kinds, host decode for XLA)."""
    from . import nw_band
    from .nw_band_pallas import banded_nw_pallas, pallas_available

    if backend == "auto":
        kind = DEFAULT_KERNEL if pallas_available() else "xla"
    elif backend == "pallas":
        kind = DEFAULT_KERNEL
    elif backend in ("pallas-row", "pallas-diag"):
        kind = backend.split("-", 1)[1]
    elif backend == "xla":
        kind = "xla"
    else:
        raise ValueError(f"unknown banded-NW backend {backend!r}")

    if kind == "xla":
        def decode_xla(tb, qlen, tlen, r):
            import numpy as np
            return nw_band.traceback_paths(np.asarray(tb), qlen, tlen, r)
        return "xla", nw_band.banded_nw, decode_xla

    interpret = not pallas_available()
    from .tb_decode_pallas import traceback_paths_device
    if kind == "row":
        def nw_row(q, qlen, t, tlen, r):
            return banded_nw_pallas(q, qlen, t, tlen, r, interpret=interpret)

        def decode_row(tb, qlen, tlen, r):
            return traceback_paths_device(tb, qlen, tlen, r,
                                          interpret=interpret)
        return "row", nw_row, decode_row

    from .nw_diag_pallas import (VMEM_BLOCK_BUDGET, banded_nw_diag_pallas,
                                 vmem_block_bytes)
    from .nw_band_pallas import (ROW_VMEM_BUDGET, band_width_sub,
                                 vmem_row_bytes)

    allow_row_fallback = backend in ("auto", "pallas")

    def nw_diag(q, qlen, t, tlen, r):
        # long buckets (Lq+Lt ~> 12K) overflow the diag kernel's scoped
        # VMEM — its q/t buffers are full-length double-buffered blocks
        # (measured 16.75M vs the 16M limit at 8192+8192/r=128, the
        # round-3/4 pipeline + correction crash).  The row kernel streams
        # the query, so it stays feasible there; fall back per bucket.
        # r < 4 also routes to row: there the two layouts' band widths
        # collide (both 8) and decode below could not tell them apart.
        # Buckets NEITHER kernel fits (very wide bands: r=1024 needs
        # 20.77 MiB in the row layout — 0820_1318_correct_full.log) fall
        # back to the XLA scan twin: slow but VMEM-unbounded.  Upstream
        # routing (align/myers_aligner) sends such spans to Hirschberg
        # before they get here, so the twin is the rare-tail safety net.
        # An explicit "pallas-diag" request skips the fallback and hits
        # the kernel's own loud assert instead.
        if (allow_row_fallback
                and (r < 4 or vmem_block_bytes(
                    q.shape[1], t.shape[1], r) > VMEM_BLOCK_BUDGET)):
            if (r >= 4 and vmem_row_bytes(
                    q.shape[1], t.shape[1], r) > ROW_VMEM_BUDGET):
                sc, tb = nw_band.banded_nw(q, qlen, t, tlen, r)
                return sc, _XlaTb(tb)
            return banded_nw_pallas(q, qlen, t, tlen, r,
                                    interpret=interpret)
        return banded_nw_diag_pallas(q, qlen, t, tlen, r,
                                     interpret=interpret)

    def decode_diag(tb, qlen, tlen, r):
        # mirror nw_diag's choice: the XLA twin's tb rides in an explicit
        # marker (shape-sniffing would collide at e.g. r=127 where
        # round_up(2r+1, 8) == band_width(r)); without the fallback the
        # tb is always the diag layout; with it, the packed band widths
        # disagree for every r >= 4 (diag: round_up(r+1, 8), row:
        # round_up(2r+1, 8)) and r < 4 always went to row above
        if isinstance(tb, _XlaTb):
            import numpy as np
            return nw_band.traceback_paths(np.asarray(tb.tb), qlen, tlen, r)
        if not allow_row_fallback:
            diag = True
        elif r < 4:
            diag = False
        else:
            w_diag, w_row = round_up(r + 1, 8), band_width_sub(r)
            assert tb.shape[2] in (w_diag, w_row), (tb.shape, r)
            diag = tb.shape[2] == w_diag
        return traceback_paths_device(tb, qlen, tlen, r,
                                      interpret=interpret, diag=diag)
    return "diag", nw_diag, decode_diag


def tb_bytes_per_problem(Lq: int, Lt: int, r: int, kind: str) -> int:
    """Packed traceback bytes one problem contributes to a dispatch —
    the number the routing/chunking budgets divide by."""
    if kind == "diag":
        W = round_up(r + 1, 8)                       # half-band sublanes
        return round_up(Lq + Lt + 1, 16) // 4 * W
    if kind == "row":
        from .nw_band_pallas import band_width_sub
        return round_up(Lq, 16) // 4 * band_width_sub(r)
    from . import nw_band
    return Lq * nw_band.band_width(r)                # uint8 host tb
