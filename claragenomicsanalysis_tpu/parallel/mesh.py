"""Device mesh construction over ('data', 'rep', 'sp')."""

import numpy as np

import jax
from jax.sharding import Mesh


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(data: int | None = None, rep: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    """Mesh with axes ('data', 'rep', 'sp'); `data` fills remaining devices
    when None.  Axis order puts `data` outermost so DP crosses DCN and
    rep/sp ride ICI (SURVEY.md §5.8)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % (rep * sp):
            raise ValueError(f"{n} devices not divisible by rep*sp={rep * sp}")
        data = n // (rep * sp)
    need = data * rep * sp
    if need > n:
        raise ValueError(f"need {need} devices, have {n}")
    arr = np.array(devices[:need]).reshape(data, rep, sp)
    return Mesh(arr, ("data", "rep", "sp"))
