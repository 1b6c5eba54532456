"""High-level batch APIs — the three module families of the reference
(cudaaligner / cudapoa / cudamapper) re-designed as batched XLA programs."""

from .aligner import Aligner, Alignment, create_aligner

__all__ = ["Aligner", "Alignment", "create_aligner"]
