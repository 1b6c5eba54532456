"""Secondary benchmarks: one JSON line per metric (bench.py stays the
single-line driver headline).  Covers the BASELINE.md north-star metrics
beyond the aligner kernel: POA cell-updates/s and mapper overlaps/s.

Run on the real TPU: python scripts/bench_all.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_poa():
    import jax
    from claragenomicsanalysis_tpu.bench.harness import time_scanned
    from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores
    from claragenomicsanalysis_tpu.utils.genomeutils import (
        encode, generate_random_genome, mutate_sequence)

    bs = BatchSize(max_sequence_size=128, max_sequences_per_poa=8,
                   max_pred_per_node=4, max_aligned_per_node=4,
                   max_nodes_per_window=256)
    sc = PoaScores()
    # measure the PRODUCT default: whatever Batch(backend="auto") routes
    # to on this platform (pallas2 lockstep on TPU as of round 4)
    from claragenomicsanalysis_tpu.models.poa import Batch
    program = Batch(batch_size=bs, scores=sc)._window_program(False)
    W, S, L = 128, bs.max_sequences_per_poa, bs.padded_seq
    rng = np.random.default_rng(0)
    K = 4

    datasets = []
    for _ in range(K):
        seqs = np.full((W, S, L), -1, np.int32)
        weights = np.zeros((W, S, L), np.int32)
        lens = np.zeros((W, S), np.int32)
        n_seqs = np.full(W, S, np.int32)
        for wi in range(W):
            base = generate_random_genome(100, rng)
            for si in range(S):
                s = mutate_sequence(base, 5, rng)[:bs.max_sequence_size]
                seqs[wi, si, : len(s)] = encode(s)
                weights[wi, si, : len(s)] = 1
                lens[wi, si] = len(s)
        datasets.append((seqs, weights, lens, n_seqs))

    fn = lambda s, w, l, n: program(s, w, l, n)[5]  # noqa: E731  status only
    dt = time_scanned(fn, datasets, loops=2)
    # graph-NW cells actually computed: (S-1) alignments x nodes x (L+1)
    # per window, nodes ~ len of seq 0 growing with branches; count the
    # padded program's real work: N x (L+1) per added sequence.
    N = bs.padded_nodes
    cells = W * (S - 1) * N * (bs.padded_seq + 1)
    return {"metric": "POA graph-NW DP cell-updates/s/chip",
            "value": round(cells / dt / 1e9, 3), "unit": "Gcells/s",
            "vs_baseline": None,
            "detail": f"{W} windows x {S} seqs x {bs.max_sequence_size}bp"}


def bench_poa_large():
    """Correct-driver-shaped windows (256bp pileups, 16 deep): the NW phase
    dominates here, so the lockstep window-batched kernel gets much closer
    to its vector roofline than on the small-window config."""
    from claragenomicsanalysis_tpu.bench.harness import time_scanned
    from claragenomicsanalysis_tpu.core.config import BatchSize, PoaScores
    from claragenomicsanalysis_tpu.utils.genomeutils import (
        encode, generate_random_genome, mutate_sequence)

    bs = BatchSize(max_sequence_size=512, max_sequences_per_poa=16,
                   max_pred_per_node=16, max_aligned_per_node=8,
                   max_nodes_per_window=1024)
    sc = PoaScores()
    from claragenomicsanalysis_tpu.models.poa import Batch
    program = Batch(batch_size=bs, scores=sc)._window_program(False)
    W, S, L = 32, 16, bs.padded_seq
    rng = np.random.default_rng(0)
    datasets = []
    for _ in range(2):
        seqs = np.full((W, S, L), -1, np.int32)
        weights = np.zeros((W, S, L), np.int32)
        lens = np.zeros((W, S), np.int32)
        n_seqs = np.full(W, S, np.int32)
        for wi in range(W):
            base = generate_random_genome(256, rng)
            for si in range(S):
                s = mutate_sequence(base, 12, rng)[:bs.max_sequence_size]
                seqs[wi, si, : len(s)] = encode(s)
                weights[wi, si, : len(s)] = 1
                lens[wi, si] = len(s)
        datasets.append((seqs, weights, lens, n_seqs))

    fn = lambda s, w, l, n: program(s, w, l, n)[5]  # noqa: E731
    dt = time_scanned(fn, datasets, loops=1)
    cells = W * (S - 1) * bs.padded_nodes * (bs.padded_seq + 1)
    return {"metric": "POA DP cell-updates/s/chip (256bp x16 pileups)",
            "value": round(cells / dt / 1e9, 3), "unit": "Gcells/s",
            "vs_baseline": None,
            "detail": f"{W} windows x {S} seqs x 256bp backbone"}


def bench_poa_corr():
    """The EXACT window shape the correction driver dispatches at its
    defaults (window_length=128, max_support=15, full-depth bucket):
    models/correct._polish_batch_size(cfg, 16).  This is the shape the
    >=50 kb/s correction target runs through, measured at full 128-lane
    occupancy (bench_poa_large's 1024-node windows model the retired
    w500 shape, which never fit the v2 kernels' VMEM)."""
    from claragenomicsanalysis_tpu.bench.harness import time_scanned
    from claragenomicsanalysis_tpu.core.config import CorrectConfig, PoaScores
    from claragenomicsanalysis_tpu.models.correct import _polish_batch_size
    from claragenomicsanalysis_tpu.models.poa import Batch
    from claragenomicsanalysis_tpu.utils.genomeutils import (
        encode, generate_random_genome, mutate_sequence)

    cfg = CorrectConfig()
    S = cfg.max_support + 1
    bs = _polish_batch_size(cfg, S)
    program = Batch(batch_size=bs, scores=PoaScores())._window_program(False)
    W, L = 128, bs.padded_seq
    rng = np.random.default_rng(0)
    datasets = []
    for _ in range(2):
        seqs = np.full((W, S, L), -1, np.int32)
        weights = np.zeros((W, S, L), np.int32)
        lens = np.zeros((W, S), np.int32)
        n_seqs = np.full(W, S, np.int32)
        for wi in range(W):
            base = generate_random_genome(cfg.window_length, rng)
            for si in range(S):
                s = mutate_sequence(base, max(5, cfg.window_length // 20),
                                    rng)[:bs.max_sequence_size]
                seqs[wi, si, : len(s)] = encode(s)
                weights[wi, si, : len(s)] = 1
                lens[wi, si] = len(s)
        datasets.append((seqs, weights, lens, n_seqs))

    fn = lambda s, w, l, n: program(s, w, l, n)[5]  # noqa: E731
    dt = time_scanned(fn, datasets, loops=1)
    cells = W * (S - 1) * bs.padded_nodes * (bs.padded_seq + 1)
    return {"metric": "POA DP cell-updates/s/chip (correction w128 pileups)",
            "value": round(cells / dt / 1e9, 3), "unit": "Gcells/s",
            "vs_baseline": None,
            "detail": f"{W} windows x {S} seqs x {cfg.window_length}bp "
                      f"backbone (product polish shape)"}


def bench_mapper():
    from claragenomicsanalysis_tpu.core.config import MapperConfig
    from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
    from claragenomicsanalysis_tpu.models.mapper import map_all_vs_all
    from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                      PoissonGenomeSimulator)

    genome = PoissonGenomeSimulator(seed=7).build_reference(200_000)
    sim = NoisyReadSimulator(seed=7, error_rate=0.05)
    reads = sim.generate_reads(genome, 400, 4000)
    parser = FastaParser("<mem>", records=[
        FastaSequence(r.name, r.seq) for r in reads])
    cfg = MapperConfig(kmer_size=15, window_size=5)
    t0 = time.perf_counter()
    res = map_all_vs_all(parser, cfg)
    warm = time.perf_counter() - t0      # includes compile
    # best of 3: at this (1.6 Mbp) scale the ~30 ms/dispatch tunnel latency
    # noise swings single runs by 2x
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = map_all_vs_all(parser, cfg)
        dt = min(dt, time.perf_counter() - t0)
    bases = sum(len(r.seq) for r in reads)
    return {"metric": "all-vs-all overlaps/s (1 chip, 400x4kb reads)",
            "value": round(len(res.overlaps) / dt, 1), "unit": "overlaps/s",
            "vs_baseline": None,
            "detail": f"{len(res.overlaps)} overlaps, {bases} bases, "
                      f"{dt*1e3:.0f} ms best-of-3 ({warm*1e3:.0f} ms cold)"}


def bench_mapper_20mbp():
    """Medium-scale mapping (2000 x 10 kb = 20 Mbp, ~4x coverage): the
    config where device work, not tunnel latency, dominates."""
    from claragenomicsanalysis_tpu.core.config import MapperConfig
    from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
    from claragenomicsanalysis_tpu.models.mapper import map_all_vs_all
    from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                      PoissonGenomeSimulator)

    genome = PoissonGenomeSimulator(seed=7).build_reference(5_000_000)
    sim = NoisyReadSimulator(seed=7, error_rate=0.05)
    reads = sim.generate_reads(genome, 2000, 10_000)
    parser = FastaParser("<mem>", records=[
        FastaSequence(r.name, r.seq) for r in reads])
    cfg = MapperConfig(kmer_size=15, window_size=15)
    map_all_vs_all(parser, cfg)
    # best-of-3: the r3 record (7.71) vs the r4 queue (3.55) disagreed by
    # 2.2x on single warm runs of this exact config — tunnel latency noise
    # makes one-shot numbers untrustworthy here (VERDICT r4 Next #3)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = map_all_vs_all(parser, cfg)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    bases = sum(len(r.seq) for r in reads)
    return {"metric": "all-vs-all mapping Mbp/s (1 chip, 2000x10kb reads)",
            "value": round(bases / dt / 1e6, 2), "unit": "Mbp/s",
            "vs_baseline": None,
            "detail": f"{len(res.overlaps)} overlaps, {dt:.1f} s warm "
                      f"best-of-3 {[round(x, 1) for x in dts]}, "
                      f"{len(res.overlaps)/dt:.0f} overlaps/s"}


def bench_pipeline():
    import time
    from claragenomicsanalysis_tpu.core.config import (MapperConfig,
                                                       PipelineConfig)
    from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
    from claragenomicsanalysis_tpu.models.pipeline import run_pipeline
    from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                      PoissonGenomeSimulator)

    genome = PoissonGenomeSimulator(seed=7).build_reference(100_000)
    sim = NoisyReadSimulator(seed=7, error_rate=0.05)
    reads = sim.generate_reads(genome, 200, 3000)
    parser = FastaParser("<mem>", records=[
        FastaSequence(r.name, r.seq) for r in reads])
    cfg = PipelineConfig(mapper=MapperConfig(kmer_size=15, window_size=5))
    run_pipeline(parser, cfg)
    t0 = time.perf_counter()
    res = run_pipeline(parser, cfg)
    dt = time.perf_counter() - t0
    return {"metric": "overlap->align pipeline CIGAR'd alignments/s "
                      "(1 chip, 200x3kb reads)",
            "value": round(len(res.paf_rows) / dt, 1),
            "unit": "alignments/s", "vs_baseline": None,
            "detail": f"{len(res.paf_rows)} rows, {res.n_align_failed} "
                      f"failed, {dt:.1f} s warm"}


def bench_correct():
    """End-to-end read correction (BASELINE config #5): bases corrected/s
    and the achieved error reduction on simulated noisy reads."""
    import time
    from claragenomicsanalysis_tpu.core.config import (CorrectConfig,
                                                       MapperConfig)
    from claragenomicsanalysis_tpu.io.fasta import FastaParser, FastaSequence
    from claragenomicsanalysis_tpu.models.correct import correct_reads
    from claragenomicsanalysis_tpu.simulators import (NoisyReadSimulator,
                                                      PoissonGenomeSimulator)

    genome = PoissonGenomeSimulator(seed=13).build_reference(40_000)
    sim = NoisyReadSimulator(seed=13, error_rate=0.05)
    reads = sim.generate_reads(genome, 200, 2000)  # ~10x coverage
    parser = FastaParser("<mem>", records=[
        FastaSequence(r.name, r.seq) for r in reads])
    cfg = CorrectConfig(mapper=MapperConfig(kmer_size=15, window_size=5,
                                            min_overlap_len=100,
                                            min_overlap_fraction=0.3,
                                            min_bases_per_residue=500))
    correct_reads(parser, cfg)  # warm (compiles)
    t0 = time.perf_counter()
    res = correct_reads(parser, cfg)
    dt = time.perf_counter() - t0
    bases = sum(len(r.seq) for r in reads)
    return {"metric": "read-correction bases/s (1 chip, 200x2kb @5% err)",
            "value": round(bases / dt, 1), "unit": "bases/s",
            "vs_baseline": None,
            "detail": f"{res.n_polished}/{res.n_windows} windows polished, "
                      f"{dt:.1f} s warm"}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    for fn in (bench_poa, bench_poa_large, bench_poa_corr, bench_mapper,
               bench_mapper_20mbp, bench_pipeline, bench_correct):
        # one retry after a pause: round 3 lost the pipeline number to a
        # transient axon remote-compile HTTP 500 that never got a 2nd try
        for attempt in (1, 2):
            try:
                print(json.dumps(fn()), flush=True)
                break
            except Exception as e:  # noqa: BLE001
                # head AND tail: axon wraps Mosaic compile errors in an
                # HTTP-500 banner and the real error sits at the END
                msg = str(e)
                if len(msg) > 900:
                    msg = msg[:450] + " ... " + msg[-450:]
                print(json.dumps({"metric": fn.__name__, "attempt": attempt,
                                  "error": msg}), flush=True)
                if attempt == 1:
                    time.sleep(30)


if __name__ == "__main__":
    main()
