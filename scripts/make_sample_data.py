"""Generate the bundled sample data (deterministic, seeded) — the analog of
the reference's cudaaligner/data, cudapoa/data/sample-windows.txt and
cudamapper/data FASTAs [U].  Golden outputs pinned by tests/test_samples.py.

Run from repo root: python scripts/make_sample_data.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from claragenomicsanalysis_tpu.io.fasta import FastaSequence, write_fasta
from claragenomicsanalysis_tpu.io.windows import write_windows
from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                  PoissonGenomeSimulator)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data")


def main():
    os.makedirs(OUT, exist_ok=True)
    # --- aligner sample: 24 query/target pairs (noisy copies)
    genome = PoissonGenomeSimulator(seed=101).build_reference(6000)
    sim = NoisyReadSimulator(seed=101, error_rate=0.06)
    queries, targets = [], []
    for i in range(24):
        r = sim.generate_read(genome, 220, f"q{i}", allow_reverse=False)
        frag = genome[r.reference_start:r.reference_end]
        queries.append(FastaSequence(f"q{i}", r.seq))
        targets.append(FastaSequence(f"t{i}", frag))
    write_fasta(queries, os.path.join(OUT, "sample_queries.fasta"))
    write_fasta(targets, os.path.join(OUT, "sample_targets.fasta"))

    # --- POA sample: 12 windows of 6 noisy copies each
    sim2 = NoisyReadSimulator(seed=202, error_rate=0.05)
    windows = []
    for i in range(12):
        base = genome[i * 450: i * 450 + 180]
        windows.append([base] + [sim2._add_noise(base) for _ in range(5)])
    write_windows(windows, os.path.join(OUT, "sample-windows.txt"))

    # --- mapper sample: 16 overlapping noisy reads
    sim3 = NoisyReadSimulator(seed=303, error_rate=0.04)
    reads = sim3.generate_reads(genome[:4000], 16, 700, prefix="read")
    write_fasta([FastaSequence(r.name, r.seq) for r in reads],
                os.path.join(OUT, "sample_reads.fasta"))
    print("wrote sample data to", OUT)


if __name__ == "__main__":
    main()
