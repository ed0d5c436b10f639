"""Shared builders for hash-stable aggregate expressions.

Double summation is order-dependent; Spark's partial aggregation order is
non-deterministic under parallelism, so raw SUM(double) can never hash-match
an oracle. Every money/measure aggregate therefore runs in exact DECIMAL
arithmetic and only the FINAL value is cast to DOUBLE — bit-identical on both
engines. (The reference hits the same issue differently: its decimal types are
exact by construction, pkg/container/types/types.go:57-59.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: "str | Column", prec: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: "str | Column", alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col, prec, scale)).cast("double").alias(alias)


def davg(col: "str | Column", alias: str, prec: int = 18, scale: int = 2, nd: int = 6) -> Column:
    """avg = exact-decimal sum cast double, / count, rounded — deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(dec(c, prec, scale)).cast("double")
    n = F.count(c)
    return F.round(s / n, nd).alias(alias)


def o_dsum(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    """Oracle-side (DuckDB SQL) twin of dsum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) AS {alias}"


def o_davg(expr: str, alias: str, prec: int = 18, scale: int = 2, nd: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {nd}) AS {alias}"
    )
