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


def axis_meshes(mesh: Mesh | None) -> tuple[Mesh | None, Mesh | None]:
    """(data-majority, rep-majority) views over the same devices.

    Drivers that combine data-sharded stages (POA windows, alignment
    batches) with rep-sharded stages (minimizer matching) get both views of
    one user-provided mesh: all devices on 'data' for the former, all on
    'rep' for the latter."""
    if mesh is None:
        return None, None
    devs = np.asarray(mesh.devices).reshape(-1)
    n = devs.size
    return (Mesh(devs.reshape(n, 1, 1), ("data", "rep", "sp")),
            Mesh(devs.reshape(1, n, 1), ("data", "rep", "sp")))
