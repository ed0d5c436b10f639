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

_SENTINELS = ("tpch_q1", "tpch_q5", "tpch_q12", "tpch_q21")

# Names pinned immediately after the sentinels. Round 4: every remaining
# never-driver-verified entry (advanced subquery/filter family, geo_bitmap,
# streaming tail + multimodal, aggregate tail, baked BVT category batteries)
# — with round 3's driver artifacts missing, this converts the maximum new
# ledger lines whether or not r03's window actually ran. The final block is
# a hedge: round-3 head entries re-pinned in case r03 recorded nothing.
# New round-4 operators go at the FRONT of this tuple (displacing hedge
# entries from the back so the never-verified block stays inside row 50).
_HEAD: "tuple[str, ...]" = (
    # -- new round-4 operators (driver row required) --
    "timewin_sql_surface",
    "apply_sql_surface",
    "geo_h3_battery",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_audio_energy",
    "geo_io_full_battery",
    "geo_unary_full_battery",
    "geo_binary_full_battery",
    "geo_overlay_battery",
    "geo_lineref_battery",
    "geo_validity_battery",
    "geo_construct_battery",
    "geo_geojson_battery",
    # -- never-driver-verified (r01+r02 evidence), outside the r03 window --
    "bvt_expression_battery",
    "bvt_operator_scripts_battery",
    "bvt_join_battery",
    "bvt_operator_battery",
    "bitmap_distinct_rollup",
    "geo_s2_battery",
    "geo_s2_bucket_join",
    "geo_mbr_battery",
    "geo_geohash",
    "geo_point_battery",
    "geo_distance_join",
    "geo_linestring_metrics",
    "geo_polygon_battery",
    "geo_sphere_distance",
    "null_ordering",
    "ilike_filter",
    "having_filter",
    "grouping_sets_explicit",
    "exists_or_correlated",
    "nested_subquery_two_levels",
    "mysql_compat_battery",
    "approx_percentile_tdigest",
    "sample_fraction",
    "agg_null_group_keys",
    "join_exists_or_exists",
    "agg_corr_exact",
    "agg_collect_json",
    "agg_approx_percentile",
    "agg_stddev_exact",
    "stream_sliding_activity",
    "stream_static_join",
    "stream_stateful_user_stats",
    "multimodal_features",
    "multimodal_metadata_stats",
    # -- hedge: round-3 head entries (r03 artifacts never landed) --
    "ivfpq_search",
    "func_mysql3_battery",
    "bvt_subquery_battery",
    "bvt_union_battery",
    "bvt_distinct_battery",
    "func_time_battery",
    "stream_tumbling_counts",
    "window_range_frame",
    "sample_per_group",
    "stream_stream_join",
    "stream_dedup_exactly_once",
    "stream_session_windows",
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
