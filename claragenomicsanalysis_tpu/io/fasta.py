"""FASTA/FASTQ parsing (reference: common/io/.../fasta_parser_kseqpp.cpp [U]).

Behavioral parity with the reference parser:
- FASTA and FASTQ, plain or gzipped, auto-detected;
- sequences shorter than ``min_seq_len`` are dropped;
- optional deterministic shuffle of read order (fixed seed, like the
  reference's shuffle flag) — read_ids refer to post-filter, post-shuffle
  order;
- ``get_chunks``-style splitting of the read range into groups whose total
  base count fits a budget (used by the index batcher).

A zlib-stream C++ fast path lives in native/fasta_parser.cpp; this module
transparently uses it when the shared library has been built (see
native/build.sh), and falls back to the pure-Python path otherwise.
"""

from dataclasses import dataclass
from pathlib import Path

import gzip

import numpy as np


@dataclass(frozen=True)
class FastaSequence:
    name: str
    seq: str


def _open_maybe_gzip(path: str):
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rt")
    return open(path, "rt")


def _parse_records(path: str):
    """Yield (name, seq) from FASTA or FASTQ (kseq-style tolerant parser)."""
    with _open_maybe_gzip(path) as f:
        name = None
        seq_parts: list[str] = []
        mode = None  # 'fasta' | 'fastq'
        it = iter(f)
        for line in it:
            line = line.rstrip("\n").rstrip("\r")
            if not line:
                continue
            if mode is None:
                if line.startswith(">"):
                    mode = "fasta"
                elif line.startswith("@"):
                    mode = "fastq"
                else:
                    raise ValueError(f"{path}: not FASTA/FASTQ")
            if mode == "fasta":
                if line.startswith(">"):
                    if name is not None:
                        yield name, "".join(seq_parts)
                    name = line[1:].split()[0] if len(line) > 1 else ""
                    seq_parts = []
                else:
                    seq_parts.append(line)
            else:  # fastq: 4-line records
                if not line.startswith("@"):
                    raise ValueError(f"{path}: malformed FASTQ header: {line!r}")
                name = line[1:].split()[0] if len(line) > 1 else ""
                seq = next(it).strip()
                plus = next(it)
                if not plus.startswith("+"):
                    raise ValueError(f"{path}: malformed FASTQ separator")
                next(it)  # quality
                yield name, seq
                name = None
        if mode == "fasta" and name is not None:
            yield name, "".join(seq_parts)


class FastaParser:
    """In-memory random-access view over the reads of one file
    (reference: FastaParser abstract class [U])."""

    def __init__(self, path: str, min_seq_len: int = 0, shuffle: bool = False,
                 records: list[FastaSequence] | None = None):
        self._path = path
        if records is None:
            records = [FastaSequence(n, s) for n, s in _parse_records(path)
                       if len(s) >= min_seq_len]
        else:
            records = [r for r in records if len(r.seq) >= min_seq_len]
        if shuffle:
            # Deterministic shuffle — fixed seed so runs are reproducible.
            rng = np.random.default_rng(0xD5)
            order = rng.permutation(len(records))
            records = [records[i] for i in order]
        self._records = records

    def get_num_seqences(self) -> int:  # reference-compatible spelling
        return len(self._records)

    def get_num_sequences(self) -> int:
        return len(self._records)

    def get_sequence_by_id(self, read_id: int) -> FastaSequence:
        return self._records[read_id]

    def get_chunks(self, max_chunk_bases: int,
                   first: int = 0, past_last: int | None = None
                   ) -> list[tuple[int, int]]:
        """Split [first, past_last) into contiguous read ranges whose summed
        base count is <= max_chunk_bases (each range holds >= 1 read)."""
        if past_last is None:
            past_last = len(self._records)
        chunks = []
        start = first
        bases = 0
        for i in range(first, past_last):
            n = len(self._records[i].seq)
            if bases and bases + n > max_chunk_bases:
                chunks.append((start, i))
                start, bases = i, 0
            bases += n
        if start < past_last:
            chunks.append((start, past_last))
        return chunks


def create_fasta_parser(path: str | Path, min_seq_len: int = 0,
                        shuffle: bool = False) -> FastaParser:
    """Factory (reference: create_kseqpp_fasta_parser [U]).  Uses the native
    C++ parser when built, else pure Python; both produce identical records."""
    path = str(path)
    try:
        from . import native_fasta
        records = native_fasta.parse(path)
        return FastaParser(path, min_seq_len, shuffle,
                           records=[FastaSequence(n, s) for n, s in records])
    except (ImportError, OSError):
        return FastaParser(path, min_seq_len, shuffle)


def write_fasta(records: list[FastaSequence], path: str, width: int = 80) -> None:
    with open(path, "w") as f:
        for r in records:
            f.write(f">{r.name}\n")
            for i in range(0, len(r.seq), width):
                f.write(r.seq[i:i + width] + "\n")
