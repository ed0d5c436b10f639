"""Aggregate function coverage — SURVEY §2.4.

Reference: AggFuncExec framework (colexec/aggexec/types.go:130-175) with
Fill/Merge/Flush two-phase state; function list at
pkg/sql/plan/function/list_agg.go. Spark's partial+final hash aggregation is
the same execution shape; each reference aggregate maps to a builtin.

Determinism notes:
- variance/stddev/corr: Spark and DuckDB both use streaming/merging kernels
  whose float results differ in low bits under different partial orders, so
  these are computed from EXACT decimal power sums (Σx, Σx², Σxy as
  decimals) — the textbook formulas, bit-identical on both engines.
- group_concat: reference supports ordered group_concat
  (compileOrderedGroupConcat, compile.go:1328) → array_sort(collect_list)
  before concat so the string is order-stable.
- approx_count_distinct / HLL sketches: estimator implementations differ
  across engines by design (reference uses axiomhq/hyperloglog,
  aggexec/approx_count2.go:21) → registered rows-only, with the exact
  distinct count gated separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.queries import register
from matrixone_spark.queries._helpers import dec


@register(
    "agg_basic",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS cnt,
       COUNT(DISTINCT o_custkey) AS uniq_cust,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
       MIN(o_orderdate) AS first_date,
       MAX(o_orderpriority) AS max_prio,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY o_orderstatus
""",
    tags=("agg", "bench"),
    doc="count/count-distinct/min/max over numeric, timestamp, string + exact sum (list_agg.go:59-157).",
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12: max(o_orderpriority) is a STRING aggregation buffer, which
    # HashAggregateExec cannot hold in its fixed-width UnsafeRow — one string
    # max used to demote the WHOLE aggregation (7 aggs, 2 phases + the
    # count-distinct phase) to SortAggregate, adding full-table Sorts before
    # every phase. Split it out: the numeric/date aggs stay hash-based over
    # one scan, and the string max runs over distinct (status, priority)
    # PAIRS — strings are fine as hash GROUP KEYS, so the distinct is a
    # HashAggregate whose partial phase collapses the scan to ~|status|x
    # |priority| rows; the final tiny SortAggregate and broadcast join are
    # over a handful of rows at any scale. Same results, measured sf0.1:
    # executor-run-time 1.34s -> 0.99s; at 100 TB it replaces a fact-table
    # sort with a 2-column pruned rescan.
    # r13 (guide §5, driver work): aggregates as SQL strings parsed JVM-side
    # in one call each — the Column-API form cost ~320 py4j round-trips
    # (~0.15 s driver-side Python) per plan build; expressions parse to the
    # identical plan (plans/r13b/agg_basic_{before,after}.txt diff clean).
    o = Catalog(spark, sf_dir).table("orders")
    num = o.groupBy("o_orderstatus").agg(
        F.expr("count(1) AS cnt"),
        F.expr("count(DISTINCT o_custkey) AS uniq_cust"),
        F.expr("CAST(min(o_totalprice) AS DOUBLE) AS min_price"),
        F.expr("CAST(max(o_totalprice) AS DOUBLE) AS max_price"),
        F.expr("min(o_orderdate) AS first_date"),
        F.expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price"),
    )
    # NOTE: a plain .distinct() here gets collapsed by the optimizer (max is
    # duplicate-agnostic), reinstating partial_max(string) + full-table Sort;
    # the count + always-true filter keep the pairs aggregate non-removable
    # (an unused count would be pruned, then collapsed the same way), so the
    # partial phase is a HashAggregate that shrinks the scan to
    # ~|status|x|priority| rows BEFORE any sort (plans/r12/agg_basic_after.txt).
    prio = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.expr("count(1) AS _c"))
        .filter("_c > 0")
        .groupBy("o_orderstatus")
        .agg(F.expr("max(o_orderpriority) AS max_prio"))
    )
    return num.join(F.broadcast(prio), "o_orderstatus").select(
        "o_orderstatus", "cnt", "uniq_cust", "min_price", "max_price",
        "first_date", "max_prio", "sum_price",
    )


@register(
    "agg_variance_exact",
    oracle="""
SELECT c_nationkey,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS mean_bal,
       ROUND(CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(24,4))) AS DOUBLE) / COUNT(*)
             - POW(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2), 4) AS var_pop,
       ROUND((CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(24,4))) AS DOUBLE)
             - COUNT(*) * POW(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2))
             / (COUNT(*) - 1), 4) AS var_samp
FROM customer GROUP BY c_nationkey
""",
    tags=("agg",),
    doc="var_pop/var_samp via exact decimal power sums (list_agg.go:437 var_pop; aliases function_id.go:813ff). Streaming variance kernels are order-dependent — power sums are not.",
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    n = F.count(F.lit(1))
    s1 = F.sum(dec("c_acctbal")).cast("double")
    s2 = F.sum((F.col("c_acctbal") * F.col("c_acctbal")).cast("decimal(24,4)")).cast("double")
    mean = s1 / n
    return c.groupBy("c_nationkey").agg(
        n.alias("n"),
        F.round(mean, 6).alias("mean_bal"),
        F.round(s2 / n - F.pow(mean, 2), 4).alias("var_pop"),
        F.round((s2 - n * F.pow(mean, 2)) / (n - 1), 4).alias("var_samp"),
    )


@register(
    "agg_median_percentile",
    oracle="""
SELECT l_returnflag,
       CAST(MEDIAN(l_quantity) AS DOUBLE) AS med_qty,
       CAST(QUANTILE_CONT(l_quantity, 0.25) AS DOUBLE) AS q25,
       CAST(QUANTILE_CONT(l_quantity, 0.90) AS DOUBLE) AS q90
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg",),
    doc="median + exact interpolated percentiles (list_agg.go:509 median, :560 approx_percentile — exact variant here so the oracle matches; approx registered rows-only).",
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).table("lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("median(l_quantity)").cast("double").alias("med_qty"),
        F.expr("percentile(l_quantity, 0.25)").cast("double").alias("q25"),
        F.expr("percentile(l_quantity, 0.90)").cast("double").alias("q90"),
    )


@register(
    "agg_minmax_by",
    oracle="""
SELECT s_nationkey,
       MAX_BY(s_name, s_acctbal + s_suppkey * 1e-9) AS richest,
       MIN_BY(s_name, s_acctbal + s_suppkey * 1e-9) AS poorest
FROM supplier GROUP BY s_nationkey
""",
    tags=("agg",),
    doc="max_by/min_by (list_agg.go:676 max_by); epsilon tie-break keeps the argmax unique.",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = Catalog(spark, sf_dir).table("supplier")
    key = F.col("s_acctbal") + F.col("s_suppkey") * 1e-9
    return s.groupBy("s_nationkey").agg(
        F.max_by("s_name", key).alias("richest"),
        F.min_by("s_name", key).alias("poorest"),
    )


@register(
    "agg_group_concat",
    oracle="""
SELECT n_regionkey,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
       ANY_VALUE(n_name ORDER BY n_name) AS any_nation
FROM nation GROUP BY n_regionkey
""",
    tags=("agg",),
    doc="group_concat (list_agg.go:231; ordered variant compile.go:1328) → concat_ws(array_sort(collect_list)); any_value (list_agg.go:365) made deterministic via min.",
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).table("nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.min("n_name").alias("any_nation"),
    )


@register(
    "agg_bit_ops",
    oracle="""
SELECT l_returnflag,
       BIT_AND(l_suppkey) AS band,
       BIT_OR(l_suppkey)  AS bor,
       BIT_XOR(l_suppkey) AS bxor
FROM lineitem
WHERE l_orderkey <= 1000
GROUP BY l_returnflag
""",
    tags=("agg",),
    doc="bit_and/bit_or/bit_xor aggregates (list_agg.go:383-419).",
)
def agg_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).table("lineitem").filter(F.col("l_orderkey") <= 1000)
    return l.groupBy("l_returnflag").agg(
        F.bit_and("l_suppkey").alias("band"),
        F.bit_or("l_suppkey").alias("bor"),
        F.bit_xor("l_suppkey").alias("bxor"),
    )


@register(
    "agg_conditional",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS errors,
       BOOL_OR(event_type = 'signup')  AS ever_signed_up,
       BOOL_AND(value >= 0)            AS all_nonneg,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
FROM events GROUP BY user_id
""",
    tags=("agg",),
    doc="Filtered/conditional aggregation + bool_and/bool_or (MySQL's count(if(...)) idiom in the reference corpus).",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events")
    return e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("purchases"),
        F.count_if(F.col("event_type") == "error").alias("errors"),
        F.bool_or(F.col("event_type") == "signup").alias("ever_signed_up"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.sum(F.when(F.col("event_type") == "purchase", dec("value"))).cast("double").alias("purchase_value"),
    )


@register(
    "agg_distinct_multi",
    oracle="""
SELECT l_linestatus,
       COUNT(DISTINCT l_suppkey)  AS dsupp,
       COUNT(DISTINCT l_partkey)  AS dpart,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS dqty_sum
FROM lineitem GROUP BY l_linestatus
""",
    tags=("agg",),
    doc="Multiple DISTINCT aggregates in one group (reference: per-group distinct hash aggexec/distinct.go; DISTINCT→AGG rewrite opt_misc.go:903). Catalyst plans Expand.",
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).table("lineitem")
    return l.groupBy("l_linestatus").agg(
        F.countDistinct("l_suppkey").alias("dsupp"),
        F.countDistinct("l_partkey").alias("dpart"),
        F.sum_distinct(dec("l_quantity")).cast("double").alias("dqty_sum"),
    )


@register(
    "agg_approx_count_distinct",
    oracle=None,  # estimator implementations differ by design (HLL variants)
    tags=("agg", "approx"),
    doc="approx_count_distinct (list_agg.go:347, HLL via axiomhq/hyperloglog ≈ Spark HyperLogLog++). Rows-only gate; accuracy vs exact is pytest-checked (±5%%).",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).table("lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "agg_hll_sketch",
    oracle=None,  # sketch binary format is engine-specific
    tags=("agg", "approx"),
    doc="hll_add_agg/hll_merge_agg/hll_cardinality (list_agg.go:633,663) → Spark hll_sketch_agg/hll_union_agg/hll_sketch_estimate: build per-status sketches, merge, estimate.",
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    per_status = o.groupBy("o_orderstatus").agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    return per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
    )


@register(
    "agg_corr_exact",
    oracle="""
SELECT ROUND(
  (COUNT(*) * CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE)
    - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))
  / SQRT(COUNT(*) * CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,4))) AS DOUBLE)
         - POW(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2))
  / SQRT(COUNT(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
         - POW(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)), 9) AS corr_qty_price
FROM lineitem
""",
    tags=("agg",),
    doc="Pearson correlation from exact power sums (reference corr via aggexec; streaming corr kernels are order-dependent, power sums are exact).",
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).table("lineitem")
    n = F.count(F.lit(1))
    sx = F.sum(dec("l_quantity")).cast("double")
    sy = F.sum(dec("l_extendedprice")).cast("double")
    sxx = F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(24,4)")).cast("double")
    syy = F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(28,4)")).cast("double")
    sxy = F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(24,4)")).cast("double")
    corr = (n * sxy - sx * sy) / F.sqrt(n * sxx - F.pow(sx, 2)) / F.sqrt(n * syy - F.pow(sy, 2))
    return l.agg(F.round(corr, 9).alias("corr_qty_price"))


@register(
    "agg_collect_json",
    oracle="""
SELECT n_regionkey,
       TO_JSON(LIST(n_name ORDER BY n_name)) AS names_json
FROM nation GROUP BY n_regionkey
""",
    tags=("agg", "json"),
    doc="json_arrayagg (list_agg.go:260) → to_json(array_sort(collect_list)).",
)
def agg_collect_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).table("nation")
    return n.groupBy("n_regionkey").agg(
        F.to_json(F.array_sort(F.collect_list("n_name"))).alias("names_json")
    )


@register(
    "agg_approx_percentile",
    oracle=None,  # sketch-specific (Greenwald-Khanna); error bound pytest-gated
    tags=("agg", "approx"),
    doc=(
        "approx_percentile (Greenwald-Khanna sketch, accuracy 10000): the "
        "scalable percentile path — exact percentile needs a full sort per "
        "group while the sketch merges map-side in fixed memory. Rows-only "
        "driver check; tests/test_approx.py gates |approx − exact| against "
        "the 1/accuracy rank-error bound."
    ),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).table("lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).cast("double").alias("p50"),
        F.percentile_approx("l_quantity", 0.9, 10000).cast("double").alias("p90"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).cast("double").alias("p99_price"),
    )


@register(
    "agg_stddev_exact",
    oracle="""
SELECT c_nationkey,
       COUNT(*) AS n,
       ROUND(SQRT(CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(24,4))) AS DOUBLE) / COUNT(*)
             - POW(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2)), 6) AS sd_pop,
       ROUND(SQRT((CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(24,4))) AS DOUBLE)
             - COUNT(*) * POW(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2))
             / (COUNT(*) - 1)), 6) AS sd_samp
FROM customer GROUP BY c_nationkey
""",
    tags=("agg",),
    doc=(
        "stddev_pop/stddev_samp/std (std ≡ stddev_pop in MySQL; reference "
        "list_agg.go stddev registrations) via exact decimal power sums + "
        "sqrt — same order-independence discipline as agg_variance_exact; "
        "sqrt over bit-identical doubles is correctly rounded per IEEE 754, "
        "so no extra divergence."
    ),
)
def agg_stddev_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    n = F.count(F.lit(1))
    s1 = F.sum(dec("c_acctbal")).cast("double")
    s2 = F.sum((F.col("c_acctbal") * F.col("c_acctbal")).cast("decimal(24,4)")).cast("double")
    mean = s1 / n
    return c.groupBy("c_nationkey").agg(
        n.alias("n"),
        F.round(F.sqrt(s2 / n - F.pow(mean, 2)), 6).alias("sd_pop"),
        F.round(F.sqrt((s2 - n * F.pow(mean, 2)) / (n - 1)), 6).alias("sd_samp"),
    )
