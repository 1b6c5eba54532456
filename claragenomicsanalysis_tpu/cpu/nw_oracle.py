"""Dense + banded Needleman–Wunsch edit-distance oracle with traceback.

Semantics (the package-wide canonical definition — see
core/status.py:AlignmentState):

- Global alignment of query q (rows, index i) against target t (cols, j).
- Unit costs: match 0, mismatch 1, insertion (consumes query) 1,
  deletion (consumes target) 1; minimize.
- Tie-break when recomputing the traceback move at (i, j):
  DIAGONAL (match/mismatch) first, then DELETION, then INSERTION.
- Banded variant: cells with |i - j| > band_radius are +inf; if the band
  cannot contain a global path (band_radius < |n - m|) the problem fails
  with EXCEEDED_MAX_ALIGNMENT_DIFFERENCE.

Reference twin: cudaaligner/src/needleman_wunsch_cpu.cpp [U] (the reference's
own CPU oracle); the tie-break rule is ours (reference's is undocumented) and
is the single rule used by every implementation in this package.
"""

import numpy as np

from ..core.status import (AlignmentState, StatusType, CIGAR_OP_COMPACT,
                           CIGAR_OP_EXTENDED)

INF = np.int32(2**30)


def nw_matrix(q: str | np.ndarray, t: str | np.ndarray) -> np.ndarray:
    """Full O(nm) DP matrix of edit distances. D[i, j] = dist(q[:i], t[:j])."""
    qa = _as_codes(q)
    ta = _as_codes(t)
    n, m = len(qa), len(ta)
    D = np.zeros((n + 1, m + 1), dtype=np.int32)
    D[:, 0] = np.arange(n + 1)
    D[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        # negative codes (N / ambiguous bases) never match, even each other
        sub = ((qa[i - 1] != ta) | (qa[i - 1] < 0) | (ta < 0)).astype(np.int32)
        row = D[i]
        prev = D[i - 1]
        row[1:] = np.minimum(prev[:-1] + sub, prev[1:] + 1)
        # deletion chain (within-row): prefix min
        for j in range(1, m + 1):
            if row[j - 1] + 1 < row[j]:
                row[j] = row[j - 1] + 1
    return D


def _as_codes(s) -> np.ndarray:
    if isinstance(s, str):
        from ..utils.genomeutils import encode
        return encode(s)
    return np.asarray(s)


def traceback(D: np.ndarray, q, t,
              band_radius: int | None = None) -> list[int]:
    """Walk D back from (n, m) to (0, 0) applying the canonical tie-break.
    Returns AlignmentState codes in query order (left to right)."""
    qa, ta = _as_codes(q), _as_codes(t)
    i, j = len(qa), len(ta)
    path: list[int] = []

    def in_band(i_, j_):
        return band_radius is None or abs(i_ - j_) <= band_radius

    while i > 0 or j > 0:
        here = D[i, j]
        if i > 0 and j > 0 and in_band(i - 1, j - 1):
            sub = 0 if (qa[i - 1] == ta[j - 1] and qa[i - 1] >= 0) else 1
            if D[i - 1, j - 1] + sub == here:
                path.append(AlignmentState.MATCH if sub == 0
                            else AlignmentState.MISMATCH)
                i, j = i - 1, j - 1
                continue
        if j > 0 and in_band(i, j - 1) and D[i, j - 1] + 1 == here:
            path.append(AlignmentState.DELETION)
            j -= 1
            continue
        if i > 0 and in_band(i - 1, j) and D[i - 1, j] + 1 == here:
            path.append(AlignmentState.INSERTION)
            i -= 1
            continue
        raise AssertionError("traceback stuck — inconsistent DP matrix")
    path.reverse()
    return path


def nw_banded_matrix(q, t, band_radius: int) -> tuple[np.ndarray, int]:
    """Banded NW: returns (D, status). Cells outside |i-j|<=band_radius are INF."""
    qa, ta = _as_codes(q), _as_codes(t)
    n, m = len(qa), len(ta)
    if abs(n - m) > band_radius:
        return np.full((n + 1, m + 1), INF, dtype=np.int32), int(
            StatusType.EXCEEDED_MAX_ALIGNMENT_DIFFERENCE)
    D = np.full((n + 1, m + 1), INF, dtype=np.int32)
    D[0, : min(m, band_radius) + 1] = np.arange(min(m, band_radius) + 1)
    D[: min(n, band_radius) + 1, 0] = np.arange(min(n, band_radius) + 1)
    for i in range(1, n + 1):
        jlo = max(1, i - band_radius)
        jhi = min(m, i + band_radius)
        for j in range(jlo, jhi + 1):
            sub = 0 if (qa[i - 1] == ta[j - 1] and qa[i - 1] >= 0) else 1
            best = D[i - 1, j - 1] + sub
            if D[i - 1, j] + 1 < best:
                best = D[i - 1, j] + 1
            if D[i, j - 1] + 1 < best:
                best = D[i, j - 1] + 1
            D[i, j] = best
    return D, int(StatusType.SUCCESS)


def align(q, t, band_radius: int | None = None
          ) -> tuple[list[int], int, int]:
    """Returns (edit path as AlignmentState codes, edit distance, status)."""
    if band_radius is None:
        D = nw_matrix(q, t)
        status = int(StatusType.SUCCESS)
    else:
        D, status = nw_banded_matrix(q, t, band_radius)
        if status != StatusType.SUCCESS:
            return [], int(INF), status
    qa, ta = _as_codes(q), _as_codes(t)
    path = traceback(D, q, t, band_radius)
    return path, int(D[len(qa), len(ta)]), status


#: state-code -> op-char lookup rows for the vectorized RLE below
_CIGAR_LUT_COMPACT = np.array([CIGAR_OP_COMPACT[s] for s in range(4)])
_CIGAR_LUT_EXTENDED = np.array([CIGAR_OP_EXTENDED[s] for s in range(4)])


def path_to_cigar(path, extended: bool = False) -> str:
    """RLE of the edit path (reference: AlignmentImpl::convert_to_cigar [U]).

    Vectorized: maps state codes to op chars through a LUT, finds run
    boundaries with one comparison, and joins the few dozen runs — paths at
    pipeline scale are thousands of ops each, so a per-op Python loop was a
    measurable host cost (it dominated warm overlap->align runs)."""
    arr = np.asarray(path, dtype=np.int64)
    if arr.size == 0:
        return ""
    if arr.min() < 0 or arr.max() > 3:
        # keep the dict-lookup era's loud failure: a sentinel/padding value
        # in a path must crash here, not wrap into a plausible CIGAR
        raise ValueError(f"invalid alignment state code in path "
                         f"(range [{arr.min()}, {arr.max()}])")
    ops = (_CIGAR_LUT_EXTENDED if extended else _CIGAR_LUT_COMPACT)[arr]
    brk = np.flatnonzero(ops[1:] != ops[:-1])
    starts = np.concatenate([[0], brk + 1])
    ends = np.concatenate([brk + 1, [arr.size]])
    return "".join(f"{e - s}{ops[s]}" for s, e in zip(starts, ends))


def format_alignment(path: list[int], q, t, width: int = 80) -> str:
    """Pretty 3-line view (reference: Alignment::format_alignment [U])."""
    from ..utils.genomeutils import decode
    qs = q if isinstance(q, str) else decode(np.asarray(q))
    ts = t if isinstance(t, str) else decode(np.asarray(t))
    top, mid, bot = [], [], []
    i = j = 0
    for s in path:
        if s in (AlignmentState.MATCH, AlignmentState.MISMATCH):
            top.append(qs[i]); bot.append(ts[j])
            mid.append("|" if s == AlignmentState.MATCH else "x")
            i += 1; j += 1
        elif s == AlignmentState.INSERTION:
            top.append(qs[i]); mid.append(" "); bot.append("-")
            i += 1
        else:
            top.append("-"); mid.append(" "); bot.append(ts[j])
            j += 1
    lines = []
    for k in range(0, len(top), width):
        lines += ["".join(top[k:k + width]), "".join(mid[k:k + width]),
                  "".join(bot[k:k + width]), ""]
    return "\n".join(lines)
