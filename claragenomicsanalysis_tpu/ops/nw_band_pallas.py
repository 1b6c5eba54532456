"""Pallas TPU kernel for batched banded NW (placeholder — lands next).

Until the kernel is in, ``pallas_available()`` is False and the scan backend
in ops/nw_band.py is used everywhere."""


def pallas_available() -> bool:
    return False


def banded_nw_pallas(q, qlen, t, tlen, band_radius: int):
    raise NotImplementedError("pallas backend not built yet; use scan backend")
