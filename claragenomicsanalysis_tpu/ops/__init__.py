"""Device ops: the XLA/Pallas compute kernels.

Each op family has (a) a pure-XLA implementation (runs anywhere, used for CPU
testing and as the autodiff-able fallback) and (b) a Pallas TPU kernel for the
hot path, bit-identical by construction and asserted by tests.
"""
