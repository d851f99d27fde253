"""Example UDFs loadable through ``CREATE FUNCTION f AS 'module.attr'``
(SqlCreateFunction.java) — the dotted-path import target the SQL DDL
resolves, mirroring how the reference loads a class by name."""

from __future__ import annotations


def reverse_upper(s: str | None) -> str | None:
    """Deterministic scalar example: reverse then uppercase."""
    return s[::-1].upper() if s is not None else None


def digit_sum(n: int | None) -> int | None:
    """Sum of decimal digits of |n|."""
    return None if n is None else sum(int(c) for c in str(abs(int(n))))
