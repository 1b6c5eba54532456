"""Alignment drivers built on the ops-layer kernels."""
