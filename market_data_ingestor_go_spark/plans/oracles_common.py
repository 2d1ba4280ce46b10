"""Shared SQL fragments for the DuckDB oracle corpus: the
decimal-cast sum device and the cosine fold every domain module
composes. Split out of the monolithic plans/oracles.py in round 15
(r14 verdict #6)."""

from __future__ import annotations

DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"

def _dsum(expr: str) -> str:
    return DSUM.format(expr=expr)

_COS = ("list_inner_product({a}, {b}) / "
        "sqrt(list_inner_product({a}, {a}) * list_inner_product({b}, {b}))")
