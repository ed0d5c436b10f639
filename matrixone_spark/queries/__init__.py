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

# The 50 rows of the r12 driver window (r11 VERDICT ask #2 — the rotation
# the r11 round failed to execute): every row whose last driver pin is
# ≤r06 (45 rows: 2×r03, 9×r04, 1×r05, 33×r06 — the tpch r06 block, the
# json family, the geo_s2 rows, and the approx/stream rows-only set),
# plus 5 overflow slots currently holding the oldest r08 rows from
# diverse families (swap these for any new round-12 registrations).
_HEAD: "tuple[str, ...]" = (
    # -- r12 rotation: every hash/rows row last driver-pinned <=r06 (45) --
    "sample_fraction",
    "stream_sliding_activity",
    "approx_percentile_tdigest",
    "ivfpq_search",
    "multimodal_features",
    "multimodal_metadata_stats",
    "sample_per_group",
    "sessionize_events",
    "stream_dedup_exactly_once",
    "stream_session_windows",
    "tvf_random_deterministic",
    "grouping_sets_rollup",
    "cte_reuse",
    "geo_s2_battery",
    "geo_s2_bucket_join",
    "geo_s2_join_bench",
    "grouping_sets_cube",
    "join_mark_null_aware",
    "join_nonequi_range",
    "join_single_scalar",
    "json2_battery",
    "json_construct_nested",
    "json_extract_battery",
    "json_mutators",
    "json_objectagg_sorted",
    "json_search_battery",
    "json_type_quote_battery",
    "json_unnest_array",
    "limit_offset",
    "recursive_cte_hierarchy",
    "sample_deterministic",
    "setop_except_all",
    "setop_intersect_all",
    "tpch_q1",
    "tpch_q12",
    "tpch_q15",
    "tpch_q17",
    "tpch_q19",
    "tpch_q2",
    "tpch_q21",
    "tpch_q22",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    # -- overflow: oldest r08 rows, diverse families --
    "fulltext_boolean",
    "window_ranks",
    "agg_basic",
    "join_full_outer",
    "setop_union_all",
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
