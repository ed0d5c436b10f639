"""Driver contract for the spark-graft builder (PySpark target).

Backed by the central registry in ``matrixone_spark/queries`` — every
implemented SURVEY.md §2 operator contributes one ``queries()`` entry and
(where SQL-expressible) one ``oracle_sql()`` entry with identical column
aliases on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from matrixone_spark.queries import load_all

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1: scan → filter → 2-phase agg) on
    /root/testdata/sf0.001; returns one row per (returnflag, linestatus)."""
    return _REGISTRY["tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
