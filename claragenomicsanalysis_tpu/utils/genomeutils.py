"""Sequence encoding and random-genome helpers
(reference: common/utils/include/claragenomics/utils/genomeutils.hpp [U]).

Encoding: A=0, C=1, G=2, T=3 as int8.  Complement of code c is 3 - c.
Padding value for encoded arrays is -1 (never equal to any base, so padded
cells always score as mismatch and are additionally masked by length).

Ambiguous bases (N, IUPAC codes, anything not ACGTacgt) also encode to -1:
every match predicate in the engine is `(a == b) & (a >= 0)`, so an unknown
base never matches anything — not even another unknown (cpu/nw_oracle.py and
cpu/mapper_oracle.py document the same rule; the mapper additionally excludes
k-mers containing a negative code from sketching).  decode() renders internal
negative codes as 'N'; only the TRAILING negative run is treated as padding.
"""

import numpy as np

BASES = "ACGT"
PAD = -1

_ENC = np.full(256, PAD, dtype=np.int8)
for _i, _b in enumerate(BASES):
    _ENC[ord(_b)] = _i
    _ENC[ord(_b.lower())] = _i

_DEC = np.frombuffer(BASES.encode(), dtype=np.uint8)


def encode(seq: str, length: int | None = None) -> np.ndarray:
    """Encode an ACGT string to int8 codes, optionally padded to `length`."""
    a = _ENC[np.frombuffer(seq.encode(), dtype=np.uint8)]
    if length is None:
        return a
    if len(a) > length:
        raise ValueError(f"sequence length {len(a)} > padded length {length}")
    out = np.full(length, PAD, dtype=np.int8)
    out[: len(a)] = a
    return out


def decode(codes: np.ndarray, length: int | None = None) -> str:
    """Decode int8 codes to a string; negative codes decode to 'N'.  With no
    explicit length, the trailing negative run is treated as padding and
    trimmed (internal negatives are ambiguous input bases, kept as 'N')."""
    codes = np.asarray(codes)
    if length is not None:
        codes = codes[:length]
    else:
        nz = np.nonzero(codes >= 0)[0]
        codes = codes[: int(nz[-1]) + 1] if nz.size else codes[:0]
    out = _DEC[np.clip(codes, 0, 3).astype(np.intp)]
    out = np.where(codes >= 0, out, np.uint8(ord("N")))
    return out.tobytes().decode()


def reverse_complement(seq: str) -> str:
    comp = str.maketrans("ACGTacgt", "TGCAtgca")
    return seq.translate(comp)[::-1]


def generate_random_genome(length: int, rng: np.random.Generator) -> str:
    return "".join(np.array(list(BASES))[rng.integers(0, 4, size=length)])


def generate_random_sequences(
    base: str, n: int, rng: np.random.Generator,
    num_mutations: int = 1,
) -> list[str]:
    """n noisy copies of `base` (first copy exact), mirroring the reference's
    test-data generator: random substitutions/insertions/deletions."""
    out = [base]
    for _ in range(n - 1):
        out.append(mutate_sequence(base, num_mutations, rng))
    return out


def mutate_sequence(seq: str, num_mutations: int, rng: np.random.Generator) -> str:
    s = list(seq)
    for _ in range(num_mutations):
        if not s:
            break
        kind = rng.integers(0, 3)
        pos = int(rng.integers(0, len(s)))
        if kind == 0:       # substitution
            s[pos] = BASES[int(rng.integers(0, 4))]
        elif kind == 1:     # insertion
            s.insert(pos, BASES[int(rng.integers(0, 4))])
        else:               # deletion
            del s[pos]
    return "".join(s)
