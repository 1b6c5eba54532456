"""Minimizer-index serialization (SURVEY.md §5.4): persisted indices keyed by
(content hash, read range, k, w, hashing, filter) serve as both a compute
cache across runs and a resume point (reference: IndexHostCopy persists to
host RAM only [U])."""

import hashlib
import os

import numpy as np

from ..core.config import MapperConfig
from ..models.mapper import Index


def index_key(parser, first: int, past_last: int, cfg: MapperConfig) -> str:
    h = hashlib.sha256()
    for i in range(first, past_last):
        r = parser.get_sequence_by_id(i)
        h.update(r.name.encode())
        h.update(b"\x00")
        h.update(r.seq.encode())
        h.update(b"\x01")
    h.update(f"{cfg.kmer_size},{cfg.window_size},{cfg.hash_representations},"
             f"{cfg.filtering_parameter}".encode())
    return h.hexdigest()[:32]


def save_index(index: Index, store_dir: str, key: str) -> str:
    os.makedirs(store_dir, exist_ok=True)
    path = os.path.join(store_dir, f"index_{key}.npz")
    np.savez_compressed(
        path,
        first_read_id=index.first_read_id,
        read_lengths=np.array(index.read_lengths, dtype=np.int64),
        read_names=np.array(index.read_names, dtype=object),
        **{f"arr_{k}": v for k, v in index._arrays.items()})
    return path


def load_index(store_dir: str, key: str) -> Index | None:
    path = os.path.join(store_dir, f"index_{key}.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=True)
    arrays = {k[4:]: z[k] for k in z.files if k.startswith("arr_")}
    return Index(arrays, int(z["first_read_id"]),
                 [int(x) for x in z["read_lengths"]],
                 [str(x) for x in z["read_names"]])


def get_or_build(parser, first: int, past_last: int, cfg: MapperConfig,
                 store_dir: str) -> tuple[Index, bool]:
    """Returns (index, was_cached)."""
    key = index_key(parser, first, past_last, cfg)
    idx = load_index(store_dir, key)
    if idx is not None:
        return idx, True
    idx = Index.create_index(parser, first, past_last, cfg)
    save_index(idx, store_dir, key)
    return idx, False
