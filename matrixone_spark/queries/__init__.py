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


# --- driver-window ordering -------------------------------------------------
# The correctness driver verifies the FIRST 50 entries of queries() per round.
# Round 1 verified tpch/relational/window (import order); to convert the
# still-unverified families into hard-signal rows, load_all() returns the
# registry re-ordered: a fixed set of TPC-H sentinels (regression canaries),
# then this round's new operators, then never-driver-verified families in
# priority order, with the already-green round-1 families at the back.
# Rotate _MODULE_PRIORITY between rounds to sweep the remaining families.

# Round 4: no sentinels — tpch_q1/q5/q12/q21 carry triple-green r01–r03
# history, and every one of the 50 window slots is needed to drain the
# remaining never-driver-verified ledger (47 queries, CORRECTNESS_r01–r03
# union) plus the r03 red row (approx_percentile_tdigest, now scalar-only)
# and the two plan-fragile re-pins the round-3 verdict called stale
# (window_range_frame, sample_per_group — green only in r01).
_SENTINELS: "tuple[str, ...]" = ()

# Exactly the 50 rows the r04 driver window must convert, in risk order:
# the fixed red row first, then the stale re-pins, then the never-verified
# families (streaming/multimodal tail, index TVFs, scalar batteries,
# timeseries, table funcs, baked BVT batteries).
_HEAD: "tuple[str, ...]" = (
    # -- r03 red row, fixed (array col projected to scalars) --
    "approx_percentile_tdigest",
    # -- plan-fragile re-pins, stale since r01 --
    "window_range_frame",
    "sample_per_group",
    # -- never driver-verified in r01–r03 (47) --
    "multimodal_features",
    "multimodal_metadata_stats",
    "ivfpq_search",
    "func_mysql3_battery",
    "bvt_subquery_battery",
    "bvt_union_battery",
    "bvt_distinct_battery",
    "func_time_battery",
    "stream_tumbling_counts",
    "stream_stream_join",
    "stream_dedup_exactly_once",
    "stream_session_windows",
    "func_string_battery",
    "func_regexp_battery",
    "func_date_battery",
    "func_math_battery",
    "func_conditional_battery",
    "func_encode_battery",
    "func_uint64_decimal",
    "func_cast_battery",
    "system_meta_battery",
    "func_crypto_battery",
    "func_mysql2_battery",
    "func_compress_battery",
    "func_serial_pack",
    "func_regexp2_battery",
    "func_math2_battery",
    "func_inet6_battery",
    "system_clock_battery",
    "func_misc_battery",
    "operator_battery",
    "collation_ci_battery",
    "timewin_tumbling",
    "timewin_sliding",
    "timewin_fill_prev",
    "timewin_fill_linear",
    "timewin_fill_value",
    "sessionize_events",
    "timewin_per_user_hourly",
    "tvf_generate_series",
    "tvf_generate_series_step",
    "tvf_generate_series_ts",
    "tvf_lateral_series",
    "tvf_unnest_ordinality",
    "tvf_outer_apply",
    "tvf_random_deterministic",
    "geo_s2_join_bench",
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
