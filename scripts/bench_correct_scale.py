"""Read-correction throughput at configurable scale (BASELINE config #5).

The round-3 number (13.7 kbases/s on 200x2kb) is far from genome scale;
this script is the ratchet: default shape is 1000 x 5 kb (~5 Mb of reads,
~10x coverage) — the scale the >=50 kb/s round-4 target is defined on.

Prints one JSON line compatible with bench_all.py's output shape.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1000)
    ap.add_argument("--read-len", type=int, default=5000)
    ap.add_argument("--coverage", type=float, default=10.0)
    ap.add_argument("--error-rate", type=float, default=0.05)
    ap.add_argument("--runs", type=int, default=1,
                    help="timed runs after the compile run (report best)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from claragenomicsanalysis_tpu.core.config import (CorrectConfig,
                                                       MapperConfig)
    from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
    from claragenomicsanalysis_tpu.models.correct import correct_reads
    from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                      PoissonGenomeSimulator)

    total_bases = args.reads * args.read_len
    glen = max(args.read_len, int(total_bases / args.coverage))
    print(f"simulating {args.reads} x {args.read_len} bp "
          f"({total_bases/1e6:.1f} Mb reads, genome {glen/1e6:.2f} Mb)...",
          flush=True)
    genome = PoissonGenomeSimulator(seed=13).build_reference(glen)
    sim = NoisyReadSimulator(seed=13, error_rate=args.error_rate)
    reads = sim.generate_reads(genome, args.reads, args.read_len)
    parser = FastaParser("<mem>", records=[
        FastaSequence(r.name, r.seq) for r in reads])
    cfg = CorrectConfig(mapper=MapperConfig(kmer_size=15, window_size=5,
                                            min_overlap_len=100,
                                            min_overlap_fraction=0.3,
                                            min_bases_per_residue=500))

    t0 = time.perf_counter()
    res = correct_reads(parser, cfg)     # compile run
    cold = time.perf_counter() - t0
    print(json.dumps({"label": "compile", "wall_s": round(cold, 1),
                      "bases_per_s": round(total_bases / cold, 1)}),
          flush=True)
    best = cold
    for _ in range(args.runs):
        t0 = time.perf_counter()
        res = correct_reads(parser, cfg)
        best = min(best, time.perf_counter() - t0)
    bases = sum(len(r.seq) for r in reads)
    print(json.dumps({
        "metric": f"read-correction bases/s (1 chip, "
                  f"{args.reads}x{args.read_len//1000}kb @{args.error_rate:.0%} err)",
        "value": round(bases / best, 1), "unit": "bases/s",
        "vs_baseline": None,
        "detail": f"{res.n_polished}/{res.n_windows} windows polished, "
                  f"{best:.1f} s warm"}), flush=True)


if __name__ == "__main__":
    main()
