from .fasta import FastaParser, FastaSequence, create_fasta_parser
from .paf import read_paf, write_paf, format_paf_row
from .windows import read_windows, write_windows

__all__ = [
    "FastaParser", "FastaSequence", "create_fasta_parser",
    "read_paf", "write_paf", "format_paf_row",
    "read_windows", "write_windows",
]
