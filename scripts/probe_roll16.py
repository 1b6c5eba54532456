"""Re-probe Mosaic's 16-bit roll support (the banded-NW int16 2x lever).

The banded-NW kernel (ops/nw_band_pallas.py `fits16`) is blocked on Mosaic
rejecting `pltpu.roll` on 16-bit vectors ("Rotate with non-32-bit data",
probed 2026-08-17).  docs/DESIGN.md section 6 says: re-probe each round.
This compiles two minimal kernels on the real chip — a sublane roll and a
lane roll on int16 — and reports which (if either) now lowers.

Usage: python scripts/probe_roll16.py
"""

import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: substrings that mean the TUNNEL/compile-helper failed, not Mosaic: the
#: attempt proved nothing and must be retried (round-4 lesson: an axon
#: HTTP 500 was logged as "REJECTED" and read as "still blocked",
#: bench_logs/0820_0621_roll16_probe.log)
_INFRA_MARKERS = ("http", "unavailable", "deadline", "connection",
                  "tpu_compile_helper", "socket", "timed out", "internal:")


def _is_infra(msg: str) -> bool:
    m = msg.lower()
    return any(k in m for k in _INFRA_MARKERS) and "mosaic" not in m


def _try(name, axis, retries=3):
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 1, axis)

    x = jnp.arange(8 * 128, dtype=jnp.int16).reshape(8, 128)
    for attempt in range(retries):
        try:
            out = pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16),
            )(x)
            out.block_until_ready()
            import numpy as np
            want = np.roll(np.asarray(x), 1, axis)
            ok = bool((np.asarray(out) == want).all())
            print(f"{name}: COMPILES, correct={ok}")
            return ok
        except Exception as e:  # noqa: BLE001 — report the error verbatim
            msg = str(e).splitlines()[0][:160]
            if _is_infra(msg):
                # transient infra failure — say so, retry, never record
                # it as an algorithmic rejection
                print(f"{name}: INFRA-RETRY (attempt {attempt + 1}/"
                      f"{retries}) -> {msg}")
                import time
                time.sleep(20 * (attempt + 1))
                continue
            print(f"{name}: REJECTED -> {msg}")
            return False
    print(f"{name}: INCONCLUSIVE — all {retries} attempts were infra "
          "failures; probe proved nothing this run")
    return False


def main():
    print(f"backend: {jax.default_backend()}  {jax.devices()}")
    sub = _try("int16 sublane roll (axis=0)", 0)
    lane = _try("int16 lane roll (axis=1)", 1)
    if sub and lane:
        print("BOTH LOWER: flip fits16 in ops/nw_band_pallas.py and bench.")
    else:
        print("still blocked; keep fits16=False (docs/DESIGN.md section 6).")


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
