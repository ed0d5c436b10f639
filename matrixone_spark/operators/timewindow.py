"""Time-window operators: INTERVAL/SLIDING aggregation + FILL gap filling.

Reference semantics (SURVEY §2.9):
- TimeWin (colexec/timewin/timewin.go:153): `SELECT _wstart, _wend, agg(...)
  FROM t INTERVAL(ts, n, unit) [SLIDING(m, unit)]` — tumbling/sliding
  time-window aggregation exposing window-start/end pseudo-columns
  (parse: tree/select.go:115-123; BVT: cases/time_window/time_window.sql).
- Fill (colexec/fill/fill.go:125): FILL(NONE|PREV|NEXT|NULL|VALUE,v|LINEAR)
  for empty buckets / NULL values (plan.pb.go:905-914 FillType).

Spark-first mapping:
- tumbling/sliding → F.window(ts, every, slide): native, partition-parallel,
  identical bucket math (epoch-aligned) — no custom code.
- gap fill → generate the full bucket spine with F.sequence+explode from the
  observed min/max (one tiny agg), left-join the windowed aggregate, then:
    PREV   = last(value, ignorenulls=True)  OVER (ORDER BY bucket)
    NEXT   = first(value, ignorenulls=True) OVER (bucket..following)
    LINEAR = interpolate between PREV/NEXT bucket values
    VALUE  = coalesce(value, lit(v)); NULL = leave as null
  All window functions over the bucket spine — scales as one range-partition
  sort per series key, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_window(
    df: DataFrame,
    ts_col: str,
    every: str,
    slide: "str | None" = None,
    group_cols: "list[str] | None" = None,
) -> "tuple[DataFrame, list[str]]":
    """Assign tumbling/sliding windows; returns (df+_wstart/_wend, group keys)."""
    w = F.window(ts_col, every, slide) if slide else F.window(ts_col, every)
    out = df.withColumn("_w", w).withColumn("_wstart", F.col("_w.start")).withColumn(
        "_wend", F.col("_w.end")
    ).drop("_w")
    keys = (group_cols or []) + ["_wstart", "_wend"]
    return out, keys


def bucket_spine(
    df: DataFrame, bucket_col: str, step_seconds: int, group_cols: "list[str] | None" = None
) -> DataFrame:
    """All buckets between min/max observed per group: sequence + explode.

    The spine is generated distributed (explode over per-group min/max), not
    driver-side — at 100 TB the spine is tiny relative to data but may still
    exceed driver memory for high-cardinality groups.
    """
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    bounds = gb.agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    return bounds.select(
        *(group_cols or []),
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step_seconds} SECONDS"))
        ).alias(bucket_col),
    )


def fill_gaps(
    agg_df: DataFrame,
    bucket_col: str,
    value_col: str,
    step_seconds: int,
    mode: str = "none",
    fill_value: "float | None" = None,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """FILL(...) parity over a bucketed aggregate (reference fill.go:125).

    mode ∈ {none, null, value, prev, next, linear}.
    """
    mode = mode.lower()
    if mode == "none":
        return agg_df
    spine = bucket_spine(agg_df, bucket_col, step_seconds, group_cols)
    joined = spine.join(agg_df, on=(group_cols or []) + [bucket_col], how="left")

    part = Window.partitionBy(*(group_cols or [F.lit(1)]))
    w_prev = part.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, 0)
    w_next = part.orderBy(bucket_col).rowsBetween(0, Window.unboundedFollowing)
    v = F.col(value_col)

    if mode == "null":
        return joined
    if mode == "value":
        return joined.withColumn(value_col, F.coalesce(v, F.lit(fill_value)))
    if mode == "prev":
        return joined.withColumn(value_col, F.last(v, ignorenulls=True).over(w_prev))
    if mode == "next":
        return joined.withColumn(value_col, F.first(v, ignorenulls=True).over(w_next))
    if mode == "linear":
        prev_v = F.last(v, ignorenulls=True).over(w_prev)
        next_v = F.first(v, ignorenulls=True).over(w_next)
        prev_t = F.last(F.when(v.isNotNull(), F.col(bucket_col)), ignorenulls=True).over(w_prev)
        next_t = F.first(F.when(v.isNotNull(), F.col(bucket_col)), ignorenulls=True).over(w_next)
        span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
        frac = (F.unix_timestamp(bucket_col) - F.unix_timestamp(prev_t)) / span
        # round: interpolation is float; 6 dp keeps results engine-portable
        interp = F.round(prev_v + (next_v - prev_v) * frac, 6)
        return joined.withColumn(
            value_col,
            F.when(v.isNotNull(), v)
            .when(prev_v.isNull(), F.lit(None))
            .when(next_v.isNull(), F.lit(None))
            .otherwise(interp),
        )
    raise ValueError(f"unknown fill mode {mode!r}")


def sessionize(
    df: DataFrame, ts_col: str, gap_seconds: int, key_cols: "list[str]"
) -> DataFrame:
    """Gaps-and-islands sessionization (batch analogue of F.session_window,
    used where the oracle needs plain SQL): new session when the gap from the
    previous event exceeds gap_seconds."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_id", F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new_session")
