"""Batch-capacity planning — the spiritual port of the reference's slab
planners (reference: cudaaligner/src/batched_device_matrices.cuh [U],
cudapoa/src/allocate_block.cpp [U]).

XLA owns actual device memory, so nothing here allocates; what survives is the
*planning* arithmetic: given a device-memory budget, how many problems fit in
one statically-shaped batch.  Shape-static padding is the TPU analog of slab
carving.
"""

import os
from dataclasses import dataclass

from .config import AlignerConfig, BatchSize

#: usable per-core VMEM for planning: 16 MB hardware (v5e) minus compiler
#: headroom — the same figure ops/poa_pallas2.VMEM_BUDGET plans against.
#: CGA_VMEM_BUDGET_BYTES overrides it (other TPU generations; tests).
VMEM_BUDGET_BYTES = 14 * 2**20


@dataclass(frozen=True)
class BufferPlan:
    problems_per_batch: int
    bytes_per_problem: int
    total_bytes: int


def plan_aligner_batch(cfg: AlignerConfig, mem_budget_bytes: int) -> BufferPlan:
    """Bytes per alignment: packed sequences + band traceback + score band.

    Traceback stores one uint8 move code per (anti-diagonal, band cell):
    (Lq + Lt + 1) * band_width bytes; the rolling score state is 3 band rows
    of int32.
    """
    n_diags = cfg.padded_query_length + cfg.padded_target_length + 1
    seq_bytes = cfg.padded_query_length + cfg.padded_target_length  # int8 codes
    tb_bytes = n_diags * cfg.band_width
    score_bytes = 3 * cfg.band_width * 4
    per = seq_bytes + tb_bytes + score_bytes
    n = max(1, mem_budget_bytes // per)
    n = min(n, cfg.max_alignments)
    return BufferPlan(n, per, n * per)


def myers_max_query_len(vmem_budget_bytes: int | None = None) -> int:
    """Longest padded query whose Myers bit-vector state tile fits one
    core's VMEM: the kernel keeps Pv + Mv + 4 Peq planes + the last-word
    mask resident, each (Wq, 8, 128) uint32 (ops/myers_pallas.py), i.e.
    7 x 4 KiB per 32-base query word.  Beyond this the single-chip fast
    path is gone — exactly when Hirschberg levels should route to the
    'sp' ring-wavefront axis (align/hirschberg.py auto-routing,
    SURVEY §5.7)."""
    if vmem_budget_bytes is None:
        vmem_budget_bytes = int(os.environ.get("CGA_VMEM_BUDGET_BYTES", 0)
                                ) or VMEM_BUDGET_BYTES
    wq = max(1, vmem_budget_bytes // (7 * 8 * 128 * 4))
    return wq * 32


def plan_poa_batch(bs: BatchSize, mem_budget_bytes: int) -> BufferPlan:
    """Bytes per POA window: node SoA + score matrix + per-read paths.

    Node SoA: base (1B) + coverage (4B) + pred/succ index+weight
    (max_pred * 2 * 8B) + aligned links (max_aligned * 4B), per node.
    Score matrix: padded_nodes x padded_seq int16 (kept for traceback).
    """
    node_bytes = 1 + 4 + bs.max_pred_per_node * 16 + bs.max_aligned_per_node * 4
    soa = bs.padded_nodes * node_bytes
    scores = bs.padded_nodes * bs.padded_seq * 2
    paths = bs.max_sequences_per_poa * bs.padded_seq * 4
    per = soa + scores + paths
    n = max(1, mem_budget_bytes // per)
    return BufferPlan(n, per, n * per)
