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

import functools
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
    """Decorator: register a (spark, sf_dir) -> DataFrame callable.

    The stored callable self-registers the SQL-text UDF surface (mo_*, h3_*,
    …) on whatever session it is handed: the driver contract supplies an
    ARBITRARY SparkSession, not our get_spark one, so a translate-based
    query must never assume the session was pre-provisioned (round-4 red
    row: UNRESOLVED_ROUTINE mo_conv). _ensure_sql_udfs is a per-session-id
    no-op after the first call, so this costs nothing on the hot path."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from matrixone_spark.session import _ensure_sql_udfs

            _ensure_sql_udfs(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


# --- driver-window ordering -------------------------------------------------
# The correctness driver verifies the FIRST 50 entries of queries() per round.
# Round 1 verified tpch/relational/window (import order); to convert the
# still-unverified families into hard-signal rows, load_all() returns the
# registry re-ordered: a fixed set of TPC-H sentinels (regression canaries),
# then this round's new operators, then never-driver-verified families in
# priority order, with the already-green round-1 families at the back.
# Rotate _MODULE_PRIORITY between rounds to sweep the remaining families.

# Round 5: the r04 window drained the never-verified ledger, so sentinels
# return — tpch regression canaries plus the r04-stale/red re-pins the r4
# verdict names (#2/#3/#4): the fulltext boolean quartet (only registered
# queries with zero driver history), the two fixed red rows, the re-built
# S2 pair, and this round's new queries. The tail of the 50-row window
# refreshes the oldest r01-only greens (plan-fragility check).
_SENTINELS: "tuple[str, ...]" = ()

# The 50 rows the r07 driver window must convert, in risk order:
# (1) every query whose module changed THIS round — operators/fulltext.py
# (dict-mode phrase expansion, gojieba-golden vocabulary) and
# functions/cjk_dict.py gate the whole fulltext set; mysql_dialect
# translate() changed (MONTHNAME/DAYNAME full names, typed-literal guard,
# approx_percentile gating) so the scalar/battery canaries re-pin;
# (2) the never-re-pinned r01-only greens (VERDICT r6 item #9 list:
# tpch_q4/q7/q8/q10/q11/q13/q14/q16/q18/q20, join_*, setop_union_*, the
# agg_* and window_* r01 rows). Overflow past 50 harmlessly waits for r08.
_HEAD: "tuple[str, ...]" = (
    # -- fulltext.py + cjk_dict.py changed r7 --
    "fulltext_cjk_dict",
    "fulltext_cjk",
    "fulltext_natural_bm25",
    "fulltext_natural_tfidf",
    "fulltext_boolean",
    "fulltext_boolean_phrase",
    "fulltext_boolean_wildcard",
    "fulltext_boolean_weights",
    "fulltext_boolean_group",
    # -- translate() changed r7: scalar/battery canaries --
    "func_cast_battery",
    "func_mysql3_battery",
    "operator_battery",
    "bvt_operator_battery",
    "mysql_compat_battery",
    "agg_approx_percentile",
    "agg_median_percentile",
    # -- never-re-pinned r01-only greens: tpch --
    "tpch_q4",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q11",
    "tpch_q13",
    "tpch_q14",
    "tpch_q16",
    "tpch_q18",
    "tpch_q20",
    # -- r01-only joins/setops --
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_left_outer",
    "join_right_outer",
    "join_semi",
    "join_exists_or_exists",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    # -- r01-only agg rows --
    "agg_basic",
    "agg_bit_ops",
    "agg_conditional",
    "agg_distinct_multi",
    "agg_group_concat",
    "agg_minmax_by",
    "agg_null_group_keys",
    "agg_variance_exact",
    # -- r01-only window rows --
    "window_lag_lead",
    "window_range_frame",
    "window_value_funcs",
    "window_ranks",
    "window_rows_frame",
    "window_topn_per_group",
)

# Module order for everything else (module name without package prefix).
# Unlisted modules sort after listed ones, keeping registration order.
# Round-3 rotation: never-driver-verified families first (scalar batteries,
# timeseries, table funcs fill the 50-row window after _HEAD); the families
# below the fold rotate to the front in round 4.
# ROUND-4 PLAN: _HEAD = sentinels + bvt_expression_battery,
# bvt_operator_scripts_battery, bvt_join_battery (new baked categories,
# never driver-verified) + any new round-4 ops; then _MODULE_PRIORITY =
# streaming_mm tail (stream_sliding_activity/static_join/stateful_user_
# stats, multimodal_*), advanced (11), geo_bitmap (10), aggregates tail
# (agg_corr_exact/collect_json/approx_percentile/stddev_exact) — that
# converts every remaining never-verified ledger line.
_MODULE_PRIORITY = (
    "scalar_funcs",
    "timeseries",
    "table_funcs",
    "streaming_mm",
    "advanced",
    "geo_bitmap",
    "aggregates",
    "bvt",
    # driver-verified families last:
    "dedup",
    "vector",
    "textops",
    "json_ops",
    "tpch",
    "tpch2",
    "relational",
    "window",
)


def _driver_order(registry: "dict[str, Query]") -> "dict[str, Query]":
    rank = {m: i for i, m in enumerate(_MODULE_PRIORITY)}
    idx = {name: i for i, name in enumerate(registry)}  # registration order
    out: "dict[str, Query]" = {}
    for name in (*_SENTINELS, *_HEAD):
        if name in registry:
            out[name] = registry[name]
    rest = sorted(
        (n for n in registry if n not in out),
        key=lambda n: (
            rank.get(registry[n].fn.__module__.rsplit(".", 1)[-1], len(rank)),
            idx[n],
        ),
    )
    for n in rest:
        out[n] = registry[n]
    return out


def load_all() -> "dict[str, Query]":
    """Import every query module (side-effect: fills REGISTRY); return it in
    driver-window priority order (see _driver_order)."""
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
        geofull,
        bvt,
        mlops,
    )

    return _driver_order(REGISTRY)
