"""TPC-H queries, part 2 — the remaining operator shapes adapted to the slim
fixture schema (no partsupp/commitdate/shipmode/phone; see tpch.py header).
Reference: plan goldens pkg/sql/plan/tpch/q2..q22.sql, BVT results
test/distributed/cases/benchmark/tpch/03_QUERIES/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.queries import register
from matrixone_spark.queries._helpers import dec

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> "F.Column":
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")


@register(
    "tpch_q2",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         MIN(ROUND(l_extendedprice / l_quantity, 6)) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_price) AS best_price FROM unit GROUP BY l_partkey
)
SELECT p.p_partkey, s.s_name, u.unit_price
FROM unit u
JOIN best b ON u.l_partkey = b.l_partkey AND u.unit_price = b.best_price
JOIN part p ON p.p_partkey = u.l_partkey AND p.p_size = 15
JOIN supplier s ON s.s_suppkey = u.l_suppkey
""",
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q2 shape (min-cost supplier per part; partsupp replaced by observed lineitem unit prices): correlated-min via agg + equi-join back (reference flattens the scalar subquery to a SINGLE join, flatten_subquery.go:59).",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, p, s = cat.table("lineitem"), cat.table("part"), cat.table("supplier")
    unit = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)).alias("unit_price")
    )
    # best-per-part as a window min over the aggregated unit frame instead of
    # a second aggregate + join back: the join form referenced the unit
    # subtree twice and the two lineitem aggregation exchanges did NOT reuse
    # (different pushed not-null filters), so the fact table was scanned and
    # aggregated twice (plans/r12/tpch_q2_before.txt nodes 1-9 vs 10-25).
    # The window shuffles only the small (partkey, suppkey) frame; ties keep
    # every min-price supplier, exactly like the join+filter form.
    best_w = Window.partitionBy("l_partkey")
    return (
        unit.withColumn("best_price", F.min("unit_price").over(best_w))
        .filter(F.col("unit_price") == F.col("best_price"))
        .join(p.filter(F.col("p_size") == 15), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_name", "unit_price")
    )


@register(
    "tpch_q8",
    oracle=f"""
SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = 'BRAZIL' THEN CAST({_REV} AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY CAST(YEAR(o.o_orderdate) AS INT)
""",
    tags=("tpch", "join", "case"),
    doc="TPC-H Q8 national market share: 7-table join + conditional-ratio agg (p_type filter dropped: fixture types are coarse).",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, o, c, s = (cat.table(t) for t in ("lineitem", "orders", "customer", "supplier"))
    n1 = cat.table("nation").select(F.col("n_nationkey").alias("n1k"), F.col("n_regionkey").alias("n1r"))
    n2 = cat.table("nation").select(F.col("n_nationkey").alias("n2k"), F.col("n_name").alias("supp_nation"))
    r = cat.table("region").filter(F.col("r_name") == "AMERICA")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = _rev_col()
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1k"))
        .join(F.broadcast(r), F.col("n1r") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2k"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "BRAZIL", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9",
    oracle=f"""
SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%a%'
GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
""",
    tags=("tpch", "join", "bench"),
    doc="TPC-H Q9 product-type profit (supplycost term dropped with partsupp): LIKE filter + 5-way join + group by nation/year.",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, o = cat.table("lineitem"), cat.table("orders")
    s, p, n = cat.table("supplier"), cat.table("part"), cat.table("nation")
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(p.filter(F.col("p_name").like("%a%")), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"), _rev_col().alias("rev"))
        .groupBy("nation", "o_year")
        .agg(F.sum("rev").cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q12",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
    tags=("tpch", "join", "case"),
    doc="TPC-H Q12 shape (shipmode → linestatus; commitdate lateness → shipdate>orderdate+60d): join + CASE-bucketed counts.",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, l = cat.table("orders"), cat.table("lineitem")
    l = l.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
GROUP BY c_count
""",
    tags=("tpch", "join"),
    doc="TPC-H Q13 customer distribution: left join w/ ON-filter + double aggregation.",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer")
    o = cat.table("orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=("tpch", "cte", "subquery"),
    doc="TPC-H Q15 top supplier: CTE/view + scalar-max subquery (reference builds Q15 via a view; Spark: DataFrame reuse + broadcast max).",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, s = cat.table("lineitem"), cat.table("supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_col()).cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q16 shape (partsupp → lineitem supplier obs; complaint filter → negative acctbal): NOT IN anti-join + count distinct.",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, p, s = cat.table("lineitem"), cat.table("part"), cat.table("supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = p.filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    oracle="""
WITH pa AS (
  SELECT l_partkey, ROUND(0.2 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS qty_thresh
  FROM lineitem GROUP BY l_partkey)
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
JOIN pa    ON pa.l_partkey = l.l_partkey
WHERE l.l_quantity < pa.qty_thresh
""",
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q17 small-quantity revenue: correlated avg subquery → pre-agg + join (reference re-aggregates above a LEFT join for non-equi agg subqueries, flatten_subquery.go).",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, p = cat.table("lineitem"), cat.table("part")
    # The per-part threshold only matters for Brand#23 parts, so compute it
    # AFTER the brand join as a window over the surviving rows instead of a
    # full-lineitem aggregate joined back: the old form shuffled an
    # all-parts aggregation of the entire fact table and re-scanned lineitem
    # for the detail side (two fact passes); this is one scan, one broadcast
    # part-key join, and a window shuffle over just the brand's rows. The
    # window's decimal sum equals the groupBy's (exact arithmetic), so the
    # rounded double threshold is bit-identical.
    w = Window.partitionBy("l_partkey")
    thresh = F.round(
        0.2 * F.sum(dec("l_quantity")).over(w).cast("double") / F.count(F.lit(1)).over(w),
        6,
    )
    return (
        l.join(
            F.broadcast(p.filter(F.col("p_brand") == "Brand#23").select("p_partkey")),
            l.l_partkey == F.col("p_partkey"),
        )
        .withColumn("qty_thresh", thresh)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum(dec("l_extendedprice")).cast("double") / 7.0, 6).alias("avg_yearly"))
    )


@register(
    "tpch_q18",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 212)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("tpch", "join", "subquery", "bench"),
    doc="TPC-H Q18 large-volume customers: HAVING subquery → semi join + re-aggregation + top-100.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c, o, l = cat.table("customer"), cat.table("orders"), cat.table("lineitem")
    # One pass over lineitem: the HAVING aggregate IS the output aggregate.
    # o_orderkey sits in the final group key, so every output group is one
    # order and total_qty equals the per-order sum the semi-join filter
    # already computed — the old form scanned lineitem twice (HAVING agg +
    # detail re-aggregation over every line of the qualifying orders). The
    # filtered sums frame is tiny, so both remaining joins broadcast it.
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 212)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sq").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q19",
    oracle=f"""
SELECT CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 40)
""",
    tags=("tpch", "join", "filter"),
    doc="TPC-H Q19 discounted revenue: OR-of-AND predicate across join sides (reference LoopJoin residual; Catalyst pushes the common join key, keeps the disjunction as post-join filter).",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, p = cat.table("lineitem"), cat.table("part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(F.sum(_rev_col()).cast("double").alias("revenue"))


@register(
    "tpch_q20",
    oracle="""
SELECT s.s_name, s.s_suppkey
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'ECONOMY'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 300)
""",
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q20 shape: IN over a grouped-HAVING subquery → semi join (excess-stock suppliers of ECONOMY parts).",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, p, s = cat.table("lineitem"), cat.table("part"), cat.table("supplier")
    qual = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(p.filter(F.col("p_type") == "ECONOMY"), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 300)
        .select("l_suppkey")
    )
    return s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi").select("s_name", "s_suppkey")


@register(
    "tpch_q21",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name
""",
    tags=("tpch", "join", "subquery", "bench"),
    doc="TPC-H Q21 waiting suppliers (lateness = shipdate > orderdate+90d, no commitdate): EXISTS + correlated NOT EXISTS → semi + anti joins over the same fact table.",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 rewrite: the EXISTS / NOT EXISTS pair collapses to per-order
    # conditional aggregates computed in ONE pass over lineitem⋈orders —
    # no self-joins of the fact table, no join back to the late rows.
    #   EXISTS l2 (same order, other supplier)      ⟺ the order has ≥2
    #     distinct suppliers ⟺ min(l_suppkey) ≠ max(l_suppkey);
    #   NOT EXISTS l3 (same order, other LATE supplier) ⟺ the late set has
    #     exactly one distinct supplier ⟺ late-min = late-max (non-null);
    #   numwait for that supplier ⟺ the order's late-row COUNT (all late
    #     rows of a qualifying order carry the same supplier = late-min).
    # Orders with no late rows fall out via NULL late-min = late-max being
    # NULL (filter false). order-level supplier min/max over ALL lineitem
    # equals min/max over the status-F join output because status is
    # per-order. Plan: one l⋈o join (orders side broadcastable; at scale a
    # SMJ keyed on orderkey), then groupBy on the SAME key — the agg reuses
    # the join's partitioning, so one fact shuffle total; only ~|orders|
    # aggregate rows flow on. Measured sf0.1 (interleaved, 5 reps): ERT
    # min 16.7 s (r11 semi+anti form) → 10.0 s, wall min 1.09 → 0.81 s;
    # results bit-identical. The intermediate two-agg form committed
    # earlier this round measured ERT 22.1 s (it recomputed l⋈o twice and
    # paid a full-lineitem agg) and is superseded by this.
    cat = Catalog(spark, sf_dir)
    s = cat.table("supplier")
    o = cat.table("orders").filter(F.col("o_orderstatus") == "F")
    l = cat.table("lineitem")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("_late"),
        )
    )
    # r13 (guide §5, driver work): aggregates as SQL strings — one parse
    # call each instead of ~40 py4j round-trips; identical expression tree
    late_supp = "(CASE WHEN _late THEN l_suppkey END)"
    g = j.groupBy("l_orderkey").agg(
        F.expr("min(l_suppkey) AS _smin"),
        F.expr("max(l_suppkey) AS _smax"),
        F.expr(f"min({late_supp}) AS _lmin"),
        F.expr(f"max({late_supp}) AS _lmax"),
        F.expr(f"count({late_supp}) AS _lcnt"),
    )
    q = g.filter((F.col("_smin") != F.col("_smax")) & (F.col("_lmin") == F.col("_lmax")))
    return (
        q.join(s, F.col("_lmin") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("_lcnt").alias("numwait"))
    )


@register(
    "tpch_q22",
    oracle="""
WITH avg_bal AS (
  SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS ab
  FROM customer WHERE c_acctbal > 0)
SELECT n.n_name AS cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
CROSS JOIN avg_bal a
WHERE c.c_acctbal > a.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n.n_name
""",
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q22 global sales opportunity (phone-prefix grouping → nation): scalar-avg subquery + anti join + agg.",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c, o, n = cat.table("customer"), cat.table("orders"), cat.table("nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.round(F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1)), 6).alias("ab"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "tpch_q11",
    oracle="""
WITH base AS (
  SELECT l_partkey,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
), per_part AS (
  SELECT l_partkey, SUM(v) AS pv FROM base GROUP BY l_partkey
)
SELECT l_partkey, CAST(pv AS DOUBLE) AS part_value
FROM per_part
WHERE pv * 1000 > (SELECT SUM(pv) FROM per_part)
ORDER BY part_value DESC, l_partkey
""",
    tags=("tpch", "join", "subquery", "bench-extra"),
    doc=(
        "TPC-H Q11 important-stock shape (partsupp value replaced by observed "
        "lineitem revenue per part for one nation's suppliers): group-by + "
        "scalar-subquery global threshold (reference plan golden "
        "pkg/sql/plan/tpch/q11.sql flattens to agg + cross-join of the "
        "1-row total). Threshold comparison kept in exact decimal via an "
        "integer multiplier so Spark and DuckDB agree at the boundary; the "
        "1-row total is broadcast (no shuffle of the big side at scale)."
    ),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    l, s, n = cat.table("lineitem"), cat.table("supplier"), cat.table("nation")
    nation_sup = (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_7")),
               F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    v = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    per_part = (
        l.join(F.broadcast(nation_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(v).alias("pv"))
    )
    total = per_part.agg(F.sum("pv").alias("tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("pv") * 1000 > F.col("tot"))
        .select("l_partkey", F.col("pv").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )
