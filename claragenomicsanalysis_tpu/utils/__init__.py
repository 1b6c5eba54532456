from .genomeutils import (
    encode, decode, reverse_complement, generate_random_genome,
    generate_random_sequences, mutate_sequence, BASES,
)
from .mathutils import ceiling_divide, round_up

__all__ = [
    "encode", "decode", "reverse_complement", "generate_random_genome",
    "generate_random_sequences", "mutate_sequence", "BASES",
    "ceiling_divide", "round_up",
]
