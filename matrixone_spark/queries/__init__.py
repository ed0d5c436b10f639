"""Central query registry.

Every implemented operator/query from SURVEY.md §2 registers here with:
  - a Spark callable  (spark, sf_dir) -> DataFrame   (the engine under test)
  - an oracle SQL string (ANSI SQL DuckDB runs on the same parquet views), or
    None for genuinely non-SQL-expressible ops (driver then records a weaker
    rows-only check).

``__spark_entry__.py`` (driver contract), ``tests/`` and ``bench.py`` all
consume this single registry, so a query is simultaneously gated by pytest,
the driver's DuckDB hash-compare, and the benchmark.

Determinism discipline (hash-match requirement):
  - float aggregations go through exact DECIMAL arithmetic, then CAST to
    DOUBLE — bit-identical across Spark and DuckDB regardless of partial-agg
    ordering (double summation order is non-deterministic under parallelism;
    decimal summation is exact).
  - every ORDER BY used for top-k/limit has a unique tie-break key.
  - column names are aliased identically on both sides (driver sorts columns
    by name before hashing).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: "str | None"
    tags: tuple = ()
    doc: str = ""


REGISTRY: "dict[str, Query]" = {}


def register(name: str, oracle: "str | None", tags: tuple = (), doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


def load_all() -> "dict[str, Query]":
    """Import every query module (side-effect: fills REGISTRY)."""
    from matrixone_spark.queries import (  # noqa: F401
        tpch,
        tpch2,
        relational,
        window,
        aggregates,
        scalar_funcs,
        json_ops,
        timeseries,
        vector,
        textops,
        dedup,
        table_funcs,
        streaming_mm,
        advanced,
        geo_bitmap,
    )

    return REGISTRY
