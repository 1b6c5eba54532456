"""CPU oracle for the overlap mapper — the executable spec for models.mapper.

Mirrors the reference pipeline (reference: cudamapper/src/minimizer.cu,
index_gpu.cuh, matcher_gpu.cu, overlapper_triggered.cu [U]) with fully
canonical rules (ours, documented here; the device ops must match
bit-for-bit):

**Sketch** (k <= 31 hashed / k <= 15 unhashed, w >= 1):
- forward rep f(p) = sum_i code[p+i] << 2(k-1-i) (a 2k-bit integer);
  reverse-complement rep rc(p) over complemented bases in reverse order;
  canonical c = min(f, rc), direction = 0 if f <= rc else 1 (forward wins
  ties).
- k-mers containing negative codes (N) are invalid.
- hashed representation = murmur32(lo32(c) ^ murmur32(hi32(c))) when
  hash_representations (murmur32 = murmur3 fmix32; murmur32(0) == 0, so for
  k <= 15 this equals murmur32(c) — the rule is one formula for all k);
  unhashed mode stores c directly and therefore requires k <= 15 (32-bit
  element arrays).
- minimizers = union of (a) central: all positions achieving the minimum of
  any full w-window of k-mer reps; (b) prefix end-minimizers: positions
  p <= w-2 with rep[p] == min(rep[0..p]); (c) suffix end-minimizers:
  positions p >= n-w+1 with rep[p] == min(rep[p..n)).  (n = #kmers.)

**Index**: sketch elements of a read range sorted by (rep, read_id, pos);
unique reps + first occurrence + counts; filtering drops reps whose count >
filtering_parameter * total (when filtering_parameter < 1.0).

**Anchors**: for each rep in both indices, the full cross product of query
and target occurrences; direction = q_dir XOR t_dir.

**Chains** ("triggered" chaining): anchors sorted by (q_id, t_id, strand,
q_pos, st) where st = t_pos on '+' and -t_pos on '-'; a chain continues while
0 < dq <= max_gap and 0 < dst <= max_gap.  A chain of length >= min_residues
becomes an Overlap with q_start = first q_pos, q_end = last q_pos + k,
t range analogous (swapped ends on '-'), kept if overlap_len =
max(q_span, t_span) >= min_overlap_len, overlap_len / residues <=
min_bases_per_residue, and min(q_span, t_span) / max(q_span, t_span) >=
min_overlap_fraction.  Self-mappings (q_id == t_id) are dropped when
configured.
"""

import numpy as np

from ..core.config import MapperConfig
from ..core.types import Anchor, Overlap, SketchElement
from ..utils.genomeutils import encode

U32 = np.uint32
INVALID = np.uint32(0xFFFFFFFF)


def murmur32(x: np.ndarray) -> np.ndarray:
    """Murmur3 fmix32 finalizer — invertible 32-bit mixer."""
    x = x.astype(np.uint32).copy()
    x ^= x >> U32(16)
    x *= U32(0x85EBCA6B)
    x ^= x >> U32(13)
    x *= U32(0xC2B2AE35)
    x ^= x >> U32(16)
    return x


def kmer_reps(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(forward, reverse-complement, valid) uint64 arrays, length len-k+1."""
    n = len(codes) - k + 1
    if n <= 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, z, np.zeros(0, dtype=bool)
    f = np.zeros(n, dtype=np.uint64)
    r = np.zeros(n, dtype=np.uint64)
    valid = np.ones(n, dtype=bool)
    for i in range(k):
        c = codes[i: i + n].astype(np.int64)
        valid &= c >= 0
        f |= (np.maximum(c, 0).astype(np.uint64)) << np.uint64(2 * (k - 1 - i))
        r |= ((3 - np.maximum(c, 0)).astype(np.uint64)) << np.uint64(2 * i)
    return f, r, valid


def sketch_read(seq: str | np.ndarray, read_id: int,
                cfg: MapperConfig) -> list[SketchElement]:
    codes = encode(seq) if isinstance(seq, str) else np.asarray(seq)
    k, w = cfg.kmer_size, cfg.window_size
    f, r, valid = kmer_reps(codes, k)
    n = len(f)
    if n == 0:
        return []
    c = np.minimum(f, r)
    direction = (f > r).astype(np.int32)
    if cfg.hash_representations:
        rep = murmur32((c & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                       ^ murmur32((c >> np.uint64(32)).astype(np.uint32)))
    else:
        rep = c.astype(np.uint32)          # config enforces k <= 15 here
    rep = np.where(valid, rep, INVALID)

    is_min = np.zeros(n, dtype=bool)
    if n >= w:
        # central: rep[p] equals the max over window-minima of windows
        # containing p (max == exists, since each window min <= rep[p])
        wm = np.array([rep[i: i + w].min() for i in range(n - w + 1)])
        for p in range(n):
            lo = max(0, p - w + 1)
            hi = min(p, n - w)
            if lo <= hi and wm[lo: hi + 1].max() == rep[p]:
                is_min[p] = True
    # end minimizers
    cmin = np.minimum.accumulate(rep)
    rmin = np.minimum.accumulate(rep[::-1])[::-1]
    for p in range(min(w - 1, n)):
        if rep[p] == cmin[p]:
            is_min[p] = True
    for p in range(max(0, n - w + 1), n):
        if rep[p] == rmin[p]:
            is_min[p] = True
    is_min &= valid
    return [SketchElement(int(rep[p]), read_id, p, int(direction[p]))
            for p in np.nonzero(is_min)[0]]


class IndexOracle:
    """Sorted minimizer index over a read range (reference: Index [U])."""

    def __init__(self, seqs: list[str], first_read_id: int, cfg: MapperConfig):
        elems: list[SketchElement] = []
        for i, s in enumerate(seqs):
            elems.extend(sketch_read(s, first_read_id + i, cfg))
        elems.sort(key=lambda e: (e.representation, e.read_id,
                                  e.position_in_read))
        if cfg.filtering_parameter < 1.0 and elems:
            thr = cfg.filtering_parameter * len(elems)
            from collections import Counter
            cnt = Counter(e.representation for e in elems)
            elems = [e for e in elems if cnt[e.representation] <= thr]
        self.elements = elems
        self.read_lengths = {first_read_id + i: len(s)
                             for i, s in enumerate(seqs)}

    def representations(self) -> np.ndarray:
        return np.array([e.representation for e in self.elements],
                        dtype=np.uint32)

    def unique_representations(self) -> np.ndarray:
        return np.unique(self.representations())

    def first_occurrence_of_representations(self) -> np.ndarray:
        reps = self.representations()
        u, first = np.unique(reps, return_index=True)
        return first


def match_anchors(qidx: IndexOracle, tidx: IndexOracle,
                  skip_self: bool = True) -> list[Anchor]:
    from collections import defaultdict
    tmap = defaultdict(list)
    for e in tidx.elements:
        tmap[e.representation].append(e)
    anchors = []
    for qe in qidx.elements:
        for te in tmap.get(qe.representation, ()):
            if skip_self and qe.read_id == te.read_id:
                continue
            anchors.append(Anchor(qe.read_id, te.read_id,
                                  qe.position_in_read, te.position_in_read,
                                  qe.direction ^ te.direction))
    return anchors


def chain_overlaps(anchors: list[Anchor], cfg: MapperConfig) -> list[Overlap]:
    k = cfg.kmer_size
    keyed = sorted(anchors, key=lambda a: (
        a.query_read_id, a.target_read_id, a.direction,
        a.query_position_in_read,
        a.target_position_in_read if a.direction == 0
        else -a.target_position_in_read))
    overlaps: list[Overlap] = []
    chain: list[Anchor] = []

    def flush():
        if len(chain) < cfg.min_residues:
            return
        a0, a1 = chain[0], chain[-1]
        q0 = a0.query_position_in_read
        q1 = a1.query_position_in_read + k
        if a0.direction == 0:
            t0 = a0.target_position_in_read
            t1 = a1.target_position_in_read + k
        else:
            t0 = a1.target_position_in_read
            t1 = a0.target_position_in_read + k
        qspan, tspan = q1 - q0, t1 - t0
        olen = max(qspan, tspan)
        if olen < cfg.min_overlap_len:
            return
        if olen > cfg.min_bases_per_residue * len(chain):
            return
        if min(qspan, tspan) < cfg.min_overlap_fraction * max(qspan, tspan):
            return
        overlaps.append(Overlap(
            a0.query_read_id, a0.target_read_id, q0, q1, t0, t1,
            len(chain), "+" if a0.direction == 0 else "-"))

    for a in keyed:
        if chain:
            p = chain[-1]
            same = (p.query_read_id == a.query_read_id
                    and p.target_read_id == a.target_read_id
                    and p.direction == a.direction)
            dq = a.query_position_in_read - p.query_position_in_read
            st_p = (p.target_position_in_read if p.direction == 0
                    else -p.target_position_in_read)
            st_a = (a.target_position_in_read if a.direction == 0
                    else -a.target_position_in_read)
            dst = st_a - st_p
            if same and 0 < dq <= cfg.max_anchor_gap and 0 < dst <= cfg.max_anchor_gap:
                chain.append(a)
                continue
            flush()
            chain = []
        chain.append(a)
    flush()
    overlaps.sort(key=lambda o: o.key())
    return overlaps


def map_all_vs_all(seqs: list[str], cfg: MapperConfig) -> list[Overlap]:
    idx = IndexOracle(seqs, 0, cfg)
    anchors = match_anchors(idx, idx, skip_self=cfg.skip_self_mappings)
    return chain_overlaps(anchors, cfg)
