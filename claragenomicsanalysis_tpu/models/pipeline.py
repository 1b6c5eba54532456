"""Overlap -> alignment pipeline (BASELINE config #4).

A NEW composition (the reference's cudamapper emits PAF without invoking
cudaaligner; SURVEY.md §1): candidate overlaps from the mapper are re-aligned
base-exactly with the batched banded aligner, and PAF rows gain cg:Z CIGARs.
"""

from dataclasses import dataclass

from ..core.config import MapperConfig, PipelineConfig
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
                 batch_size: int = 256, mesh=None) -> PipelineResult:
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

    max_len = 1
    spans = []
    for o in overlaps:
        q = parser.get_sequence_by_id(o.query_read_id).seq[
            o.query_start_position_in_read:o.query_end_position_in_read]
        t = parser.get_sequence_by_id(o.target_read_id).seq[
            o.target_start_position_in_read:o.target_end_position_in_read]
        if o.relative_strand == "-":
            t = reverse_complement(t)
        spans.append((q, t))
        max_len = max(max_len, len(q), len(t))
    # pow2 bucket: one XLA executable serves many runs (the repo-wide
    # static-shape discipline; a raw data-dependent max_len would compile a
    # fresh program per input)
    max_len = max(64, 1 << (max_len - 1).bit_length())

    n_fail = 0
    with trace_range("pipeline.align"):
        for start in range(0, len(spans), batch_size):
            chunk = spans[start:start + batch_size]
            aligner = create_aligner(
                max_len, max_len, len(chunk),
                band_radius=min(cfg.aligner_band_radius, max_len),
                algorithm="myers")
            for q, t in chunk:
                aligner.add_alignment(q, t)
            for o, a in zip(overlaps[start:start + batch_size],
                            aligner.get_alignments()):
                if a.status == StatusType.SUCCESS:
                    o.cigar = a.convert_to_cigar()
                else:
                    n_fail += 1

    rows = []
    for o in overlaps:
        q = parser.get_sequence_by_id(o.query_read_id)
        t = parser.get_sequence_by_id(o.target_read_id)
        rows.append(format_paf_row(o, q.name, len(q.seq), t.name, len(t.seq)))
    return PipelineResult(overlaps, rows, len(overlaps) - n_fail, n_fail)
