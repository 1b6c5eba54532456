"""Native C++ parser vs pure-Python parser: identical records on every
format variant.  Builds the shared library on demand."""

import gzip
import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(ROOT, "claragenomicsanalysis_tpu", "io", "_native",
                   "libfasta.so")


@pytest.fixture(scope="module")
def native():
    if not os.path.exists(LIB):
        subprocess.run(["sh", os.path.join(ROOT, "native", "build.sh")],
                       check=True, capture_output=True)
    from claragenomicsanalysis_tpu.io import native_fasta
    return native_fasta


def _py_parse(path):
    from claragenomicsanalysis_tpu.io.fasta import _parse_records
    return list(_parse_records(path))


CASES = {
    "multi.fasta": ">a desc\nACGT\nACGT\n>b\nGG\n",
    "crlf.fasta": ">a\r\nACGT\r\n>b\r\nTT\r\n",
    "blank_lines.fasta": ">a\nAC\n\n>b\nGT\n",
    "reads.fastq": "@r0 extra\nACGT\n+\nIIII\n@r1\nGGTT\n+anything\n!!!!\n",
    "noeol.fasta": ">a\nACGT",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_native_matches_python(native, tmp_path, name):
    p = tmp_path / name
    p.write_text(CASES[name])
    assert native.parse(str(p)) == _py_parse(str(p))


def test_native_gzip(native, tmp_path):
    p = tmp_path / "reads.fasta.gz"
    with gzip.open(p, "wt") as f:
        f.write(">a\nACGTACGT\n>b\nTTTT\n")
    assert native.parse(str(p)) == [("a", "ACGTACGT"), ("b", "TTTT")]


def test_native_malformed(native, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("garbage\n")
    with pytest.raises(ValueError):
        native.parse(str(p))
    q = tmp_path / "trunc.fastq"
    q.write_text("@r0\nACGT\n")
    with pytest.raises(ValueError):
        native.parse(str(q))


def test_create_parser_uses_native(native, tmp_path):
    from claragenomicsanalysis_tpu.io.fasta import create_fasta_parser
    p = tmp_path / "r.fasta"
    p.write_text(">a\nACGT\n>b\nGGGG\n>c\nT\n")
    parser = create_fasta_parser(p, min_seq_len=2)
    assert parser.get_num_sequences() == 2
    assert parser.get_sequence_by_id(0).seq == "ACGT"


def test_large_roundtrip(native, tmp_path, rng):
    from claragenomicsanalysis_tpu.io.fasta import write_fasta, FastaSequence
    from claragenomicsanalysis_tpu.utils.genomeutils import generate_random_genome
    recs = [FastaSequence(f"read_{i}", generate_random_genome(
        int(rng.integers(50, 2000)), rng)) for i in range(50)]
    p = tmp_path / "big.fasta"
    write_fasta(recs, str(p))
    got = native.parse(str(p))
    assert got == [(r.name, r.seq) for r in recs]
