"""Reproduce the pipeline-bench compile crash on the real TPU with the
full unfiltered error (bench_all's HTTP-500 wrapper hides the Mosaic
message; rounds 3 AND 4 lost the config-#4 number to it — twice each,
seconds apart, so it is deterministic, not transient infra).

Usage: python scripts/repro_pipeline.py [--small]
"""

import os
import sys
import traceback

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
sys.path.insert(0, ".")


def main():
    from claragenomicsanalysis_tpu.core.config import (MapperConfig,
                                                       PipelineConfig)
    from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
    from claragenomicsanalysis_tpu.models.pipeline import run_pipeline
    from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                      PoissonGenomeSimulator)

    small = "--small" in sys.argv
    n, ln, g = (40, 1200, 20_000) if small else (200, 3000, 100_000)
    genome = PoissonGenomeSimulator(seed=7).build_reference(g)
    sim = NoisyReadSimulator(seed=7, error_rate=0.05)
    reads = sim.generate_reads(genome, n, ln)
    parser = FastaParser("<mem>", records=[
        FastaSequence(r.name, r.seq) for r in reads])
    cfg = PipelineConfig(mapper=MapperConfig(kmer_size=15, window_size=5))
    try:
        res = run_pipeline(parser, cfg)
        print(f"OK: {len(res.paf_rows)} rows, {res.n_align_failed} failed")
    except Exception:
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
