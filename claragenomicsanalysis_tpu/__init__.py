"""claragenomicsanalysis_tpu — a TPU-native long-read sequence-analysis engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ClaraGenomicsAnalysis (NVIDIA's CUDA genomics library; reference fork
r-mafi/ClaraGenomicsAnalysis):

- ``models.aligner``  — batched pairwise global alignment (banded NW /
  Myers bit-vector / Hirschberg), emitting CIGARs.
  Reference parity target: ``cudaaligner/`` [U].
- ``models.poa``      — batched partial-order alignment (consensus + MSA)
  as a dense-graph DP over padded node arrays.
  Reference parity target: ``cudapoa/`` [U].
- ``models.mapper``   — all-vs-all minimizer overlap mapping
  (sketch -> sorted index -> anchors -> chains -> PAF).
  Reference parity target: ``cudamapper/`` [U].
- ``parallel``        — device-mesh sharding (data / rep / sp axes) built on
  ``jax.sharding`` + ``shard_map`` (the reference has no distributed
  backend; this is new capability).

Design stance (see SURVEY.md §7): everything static-shape, padded, and
status-coded; batch-of-problems is the dominant parallel axis; Pallas is
the native kernel layer; CPU NumPy oracles define exact semantics.

Paths cited as ``reference: <path> [U]`` refer to the reference tree layout
reconstructed in SURVEY.md (the mount was empty; see its provenance note).
"""

__version__ = "0.1.0"
