"""Overlap -> alignment pipeline (BASELINE config #4).

A NEW composition (the reference's cudamapper emits PAF without invoking
cudaaligner; SURVEY.md §1): candidate overlaps from the mapper are re-aligned
base-exactly with the batched banded aligner, and PAF rows gain cg:Z CIGARs.
"""

from dataclasses import dataclass

from ..core.config import PipelineConfig
from ..core.status import StatusType
from ..core.types import Overlap
from ..io.fasta import FastaParser
from ..io.paf import format_paf_row
from ..models.aligner import create_aligner
from ..models.mapper import map_all_vs_all
from ..utils.genomeutils import reverse_complement
from ..utils.profiling import trace_range


@dataclass
class PipelineResult:
    overlaps: list[Overlap]
    paf_rows: list[str]
    n_aligned: int
    n_align_failed: int


def run_pipeline(parser: FastaParser, cfg: PipelineConfig,
                 batch_size: int = 2048, mesh=None) -> PipelineResult:
    """Map all-vs-all, then globally align each overlap's spans.
    `mesh`: optional Mesh — matching shards over its 'rep' view."""
    from ..parallel.mesh import axis_meshes
    _, mesh_rep = axis_meshes(mesh)
    with trace_range("pipeline.map"):
        res = map_all_vs_all(parser, cfg.mapper, mesh=mesh_rep)
    overlaps = [o for o in res.overlaps
                if max(o.query_end_position_in_read
                       - o.query_start_position_in_read,
                       o.target_end_position_in_read
                       - o.target_start_position_in_read)
                <= cfg.max_alignment_length]

    spans = []
    for o in overlaps:
        q = parser.get_sequence_by_id(o.query_read_id).seq[
            o.query_start_position_in_read:o.query_end_position_in_read]
        t = parser.get_sequence_by_id(o.target_read_id).seq[
            o.target_start_position_in_read:o.target_end_position_in_read]
        if o.relative_strand == "-":
            t = reverse_complement(t)
        spans.append((q, t))

    # group spans by their own pow2 length bucket instead of padding every
    # batch to the GLOBAL max: a mixed-length overlap set then aligns each
    # bucket at its natural padded size (the DP cost is quadratic-ish in
    # the pad length, so short spans no longer pay the longest span's
    # matrix).  pow2 buckets keep the executable count bounded; output
    # order is restored by index so results are unchanged.
    buckets: dict[int, list[int]] = {}
    for i, (q, t) in enumerate(spans):
        b = max(64, 1 << (max(len(q), len(t), 1) - 1).bit_length())
        buckets.setdefault(b, []).append(i)

    n_fail = 0
    with trace_range("pipeline.align"):
        for blen in sorted(buckets):
            idxs = buckets[blen]
            # large default chunk: the myers driver already chunks its
            # banded re-runs by a device-memory budget, so small outer
            # chunks only multiplied dispatch round trips.  batch_size
            # caps one dispatch's Myers batch (tunable for small hosts);
            # pow2 padding bounds the executable count.
            for start in range(0, len(idxs), batch_size):
                chunk_ids = idxs[start:start + batch_size]
                aligner = create_aligner(
                    blen, blen, len(chunk_ids),
                    band_radius=min(cfg.aligner_band_radius, blen),
                    algorithm="myers")
                for i in chunk_ids:
                    q, t = spans[i]
                    aligner.add_alignment(q, t)
                for i, a in zip(chunk_ids, aligner.get_alignments()):
                    if a.status == StatusType.SUCCESS:
                        overlaps[i].cigar = a.convert_to_cigar()
                    else:
                        n_fail += 1

    rows = []
    for o in overlaps:
        q = parser.get_sequence_by_id(o.query_read_id)
        t = parser.get_sequence_by_id(o.target_read_id)
        rows.append(format_paf_row(o, q.name, len(q.seq), t.name, len(t.seq)))
    return PipelineResult(overlaps, rows, len(overlaps) - n_fail, n_fail)
