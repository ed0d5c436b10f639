"""Window function coverage — SURVEY §2.5.

Reference: single sort-based Window operator (colexec/window/window.go:194),
functions registered at function/list_window.go:25-246 (rank, row_number,
dense_rank, percent_rank, ntile, cume_dist, lag, lead, first_value,
last_value, nth_value) + any aggregate OVER a window, frames ROWS|RANGE with
PRECEDING/FOLLOWING/CURRENT/UNBOUNDED bounds (plan.pb.go:614-645).

Spark mapping is 1:1: Window.partitionBy().orderBy().rowsBetween/rangeBetween.
Determinism: every orderBy includes a unique key so rank ties and frame
contents are stable; running sums use decimal-exact arithmetic.

Scale note: a window over partitionBy(k) is one shuffle on k — same cost shape
as the reference's Partition operator (colexec/partition/partition.go:87);
unpartitioned windows (global rank) would single-task at 100 TB, so every
query here partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.queries import register
from matrixone_spark.queries._helpers import dec


@register(
    "window_ranks",
    oracle="""
SELECT c_custkey, c_nationkey,
       RANK()        OVER w AS rnk,
       DENSE_RANK()  OVER w AS drnk,
       ROW_NUMBER()  OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
       ROUND(PERCENT_RANK() OVER w, 9) AS prnk,
       ROUND(CUME_DIST()    OVER w, 9) AS cdist,
       NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS tile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
""",
    tags=("window",),
    doc="rank/dense_rank/row_number/percent_rank/cume_dist/ntile (list_window.go:25-122). Ranks share a tie-prone key; row_number/ntile get a unique tie-break.",
)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    w_uni = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.row_number().over(w_uni).alias("rn"),
        F.round(F.percent_rank().over(w_ties), 9).alias("prnk"),
        F.round(F.cume_dist().over(w_ties), 9).alias("cdist"),
        F.ntile(4).over(w_uni).alias("tile"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       LAG(o_orderkey)      OVER w AS prev_order,
       LEAD(o_orderkey)     OVER w AS next_order,
       LAG(o_orderkey, 2, -1) OVER w AS prev2_default,
       CAST(EXTRACT(EPOCH FROM o_orderdate - LAG(o_orderdate) OVER w) AS BIGINT) AS secs_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window",),
    doc="lag/lead with offsets and defaults (list_window.go:142,169); inter-event deltas.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_orderkey", 2, -1).over(w).alias("prev2_default"),
        (F.unix_timestamp("o_orderdate") - F.unix_timestamp(F.lag("o_orderdate").over(w)))
        .cast("bigint")
        .alias("secs_since_prev"),
    )


@register(
    "window_value_funcs",
    oracle="""
SELECT s_suppkey, s_nationkey,
       FIRST_VALUE(s_name) OVER w AS first_name,
       LAST_VALUE(s_name)  OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_name,
       NTH_VALUE(s_name, 2) OVER w AS second_name
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
""",
    tags=("window",),
    doc="first_value/last_value/nth_value (list_window.go:196-246); last_value needs the full frame (default frame stops at CURRENT ROW — same gotcha in both engines).",
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = Catalog(spark, sf_dir).table("supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.first("s_name").over(w).alias("first_name"),
        F.last("s_name").over(w_full).alias("last_name"),
        F.nth_value("s_name", 2).over(w).alias("second_name"),
    )


@register(
    "window_rows_frame",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            OVER w ROWS_UNB AS DOUBLE) AS running_qty,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            OVER w ROWS_3 AS DOUBLE) AS qty_3row,
       CAST(MIN(l_quantity)
            OVER w ROWS_C3 AS DOUBLE) AS qty_min3
FROM lineitem
WHERE l_suppkey <= 20
""".replace(
        "w ROWS_UNB",
        "(PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
    )
    .replace(
        "w ROWS_3",
        "(PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
    )
    .replace(
        "w ROWS_C3",
        "(PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
    ),
    tags=("window",),
    doc="Aggregates over ROWS frames: running, sliding 3-row, centered (plan.pb.go:639-645 bound kinds). Decimal-exact running sums. (l_orderkey,l_linenumber) is NOT unique in this synthetic data, so the sort covers every column that influences the frame — duplicate full rows then commute without changing the output multiset.",
)
def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).table("lineitem").filter(F.col("l_suppkey") <= 20)
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_qty"),
        F.sum(dec("l_quantity"))
        .over(w.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("qty_3row"),
        F.min("l_quantity").over(w.rowsBetween(-1, 1)).cast("double").alias("qty_min3"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                      RANGE BETWEEN CAST(1000 AS DECIMAL(18,2)) PRECEDING
                            AND CAST(1000 AS DECIMAL(18,2)) FOLLOWING) AS near_price_cnt
FROM orders
WHERE o_custkey <= 100
""",
    tags=("window",),
    doc="RANGE frame with value offsets (plan.pb.go:614-624 RANGE spec): count of sibling orders within ±1000 of each order's price.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(dec("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.count(F.lit(1)).over(w).alias("near_price_cnt"),
    )


@register(
    "window_topn_per_group",
    oracle="""
SELECT n_name, s_suppkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM (
  SELECT n.n_name, s.s_suppkey, s.s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n.n_name ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey) t
WHERE rn <= 2
""",
    tags=("window", "join"),
    doc="Top-N per group — the reference's Top operator generalized per-partition (colexec/top/top.go:107); canonical Spark pattern.",
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    s, n = cat.table("supplier"), cat.table("nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("n_name", "s_suppkey", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )
