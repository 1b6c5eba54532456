"""Tiny integer helpers (reference: common/utils/.../mathutils.hpp [U])."""


def ceiling_divide(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
