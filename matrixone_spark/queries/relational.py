"""Relational operator coverage: every join type, set ops, subquery shapes,
grouping sets, CTEs, limit/offset, deterministic sampling.

Reference parity map (SURVEY §2.3/§2.6/§2.7):
- HashJoin all types (colexec/hashjoin/join.go:162): inner/left/right/full/
  semi/anti → df.join(how=...); MARK join (plan.pb.go:836, NULL-aware IN) →
  NULL-aware rewrite; SINGLE (scalar-subquery join) → left join + ≤1-match.
- LoopJoin non-equi (colexec/loopjoin/join.go:95) → theta join.
- Product (colexec/product/product.go:54) → crossJoin.
- UnionAll/Intersect/IntersectAll/Minus (colexec/unionall/union.go:45,
  intersect/intersect.go:53, intersectall/intersectall.go:69,
  minus/minus.go:57) → union/intersect/intersectAll/exceptAll.
- Limit/Offset (colexec/limit/limit.go:66, offset/offset.go:63) →
  limit/offset over a deterministic sort.
- Sample N-rows/percent (colexec/sample/sample.go:116) → deterministic
  hash-mod sample (oracle-matchable) + per-group window sample.
- Recursive CTE (colexec/mergerecursive/mergerecursive.go:47) → driver-side
  fixpoint loop (operators/recursive.py).

Scale notes: semi/anti joins keep the fact table as probe side with the
filtered build side broadcast where small; MARK-join rewrite avoids a
per-row subquery by a single aggregate + broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.queries import register
from matrixone_spark.queries._helpers import dec


@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS order_cnt,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
GROUP BY c.c_custkey, c.c_name
""",
    tags=("join",),
    doc="LEFT OUTER join with ON-clause filter (join-side predicate, not WHERE). Reference: hashjoin LEFT (colexec/hashjoin/join.go:162); TPC-H Q13 shape.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer")
    o = cat.table("orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
SELECT n.n_name, COUNT(s.s_suppkey) AS supp_cnt
FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("join",),
    doc="RIGHT OUTER join (reference compiles right joins with build/probe swap, compile.go:4405).",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    s, n = cat.table("supplier"), cat.table("nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("supp_cnt"))
    )


@register(
    "join_full_outer",
    oracle="""
WITH co AS (SELECT c_nationkey AS k, COUNT(*) AS c_cnt FROM customer GROUP BY 1),
     su AS (SELECT s_nationkey AS k, COUNT(*) AS s_cnt FROM supplier GROUP BY 1)
SELECT COALESCE(co.k, su.k) AS nationkey,
       COALESCE(c_cnt, 0) AS c_cnt, COALESCE(s_cnt, 0) AS s_cnt
FROM co FULL OUTER JOIN su ON co.k = su.k
""",
    tags=("join",),
    doc="FULL OUTER join (reference: join/fulljoin.sql BVT corpus; hashjoin OUTER).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    co = cat.table("customer").groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("c_cnt"))
    su = cat.table("supplier").groupBy(F.col("s_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("s_cnt"))
    return co.join(su, co.k == su.k, "full").select(
        F.coalesce(co.k, su.k).alias("nationkey"),
        F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
        F.coalesce("s_cnt", F.lit(0)).alias("s_cnt"),
    )


@register(
    "join_semi",
    oracle="""
SELECT p.p_partkey, p.p_name
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
""",
    tags=("join", "subquery"),
    doc="LEFT SEMI join = EXISTS (reference rewrite: plan/flatten_subquery.go:59 EXISTS→SEMI).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    p = cat.table("part")
    l = cat.table("lineitem").filter(F.col("l_quantity") > 49)
    return p.join(l, p.p_partkey == l.l_partkey, "left_semi").select("p_partkey", "p_name")


@register(
    "join_anti",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("join", "subquery"),
    doc="LEFT ANTI join = NOT EXISTS (reference: flatten_subquery.go NOT EXISTS→ANTI; TPC-H Q22 shape).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c, o = cat.table("customer"), cat.table("orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_mark_null_aware",
    oracle="""
SELECT p.p_partkey,
       CASE WHEN p.p_size IN (SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL
                                          ELSE s_suppkey % 50 END
                              FROM supplier) THEN 1 ELSE 0 END AS in_mark
FROM part p
""",
    tags=("join", "subquery"),
    doc="MARK join: NULL-aware IN (reference plan.pb.go:836 JoinType MARK; x IN (set with NULLs) is NULL when unmatched-and-set-has-NULL — surfaced here as a 0/1 mark with MySQL's NULL→false CASE semantics).",
)
def join_mark_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    p = cat.table("part")
    s = cat.table("supplier").select(
        F.when(F.col("s_suppkey") % 7 == 0, F.lit(None)).otherwise(F.col("s_suppkey") % 50).alias("v")
    )
    # NULL-aware IN via aggregate: has_null + value-set membership (single broadcast)
    marks = s.agg(
        F.max(F.col("v").isNull().cast("int")).alias("has_null"),
        F.collect_set("v").alias("vals"),
    )
    return (
        p.crossJoin(F.broadcast(marks))
        .select(
            "p_partkey",
            F.when(F.array_contains(F.col("vals"), F.col("p_size")), F.lit(1))
            .when(F.col("has_null") == 1, F.lit(0))  # NULL mark → CASE treats as false
            .otherwise(F.lit(0))
            .alias("in_mark"),
        )
    )


@register(
    "join_single_scalar",
    oracle="""
SELECT n.n_name,
       (SELECT CAST(MAX(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS max_bal
FROM nation n
""",
    tags=("join", "subquery"),
    doc="SINGLE join: correlated scalar subquery, ≤1 row per outer (reference plan.pb.go SINGLE; flatten_subquery.go scalar→SINGLE).",
)
def join_single_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    n = cat.table("nation")
    s = (
        cat.table("supplier")
        .groupBy("s_nationkey")
        .agg(F.max(dec("s_acctbal")).cast("double").alias("max_bal"))
    )
    return n.join(s, n.n_nationkey == s.s_nationkey, "left").select("n_name", "max_bal")


@register(
    "join_nonequi_range",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS cnt
FROM orders o JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 120 DAY
GROUP BY o.o_orderpriority
""",
    tags=("join",),
    doc="Equi join + non-equi range residual (reference hash join residual conditions, hashjoin/join.go; range-interval semantics).",
)
def join_nonequi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, l = cat.table("orders"), cat.table("lineitem")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
        & (l.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 120 DAYS"))
    )
    return o.join(l, cond).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
WHERE r.r_regionkey <> n.n_regionkey
""",
    tags=("join",),
    doc="Cross join / Product (colexec/product/product.go:54) with post-filter (theta).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    r, n = cat.table("region"), cat.table("nation")
    return r.crossJoin(n).filter(F.col("r_regionkey") != F.col("n_regionkey")).select("r_name", "n_name")


@register(
    "setop_union_distinct",
    oracle="""
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
UNION
SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000
""",
    tags=("setop",),
    doc="UNION distinct — reference compiles as UnionAll + dedup Group (compile.go:1418 compileUnion).",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    a = cat.table("customer").filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("k"))
    b = cat.table("supplier").filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("k"))
    return a.union(b).distinct()


@register(
    "setop_union_all",
    oracle="""
SELECT c_nationkey AS k, 'cust' AS src FROM customer WHERE c_acctbal > 9900
UNION ALL
SELECT s_nationkey AS k, 'supp' AS src FROM supplier WHERE s_acctbal > 9900
""",
    tags=("setop",),
    doc="UNION ALL (colexec/unionall/union.go:45).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    a = (
        cat.table("customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("k"), F.lit("cust").alias("src"))
    )
    b = (
        cat.table("supplier")
        .filter(F.col("s_acctbal") > 9900)
        .select(F.col("s_nationkey").alias("k"), F.lit("supp").alias("src"))
    )
    return a.unionAll(b)


@register(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT s_nationkey AS k FROM supplier
""",
    tags=("setop",),
    doc="INTERSECT distinct (colexec/intersect/intersect.go:53).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    a = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_nationkey").alias("k"))
    b = cat.table("supplier").select(F.col("s_nationkey").alias("k"))
    return a.intersect(b)


@register(
    "setop_intersect_all",
    oracle="""
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9500
INTERSECT ALL
SELECT s_nationkey AS k FROM supplier
""",
    tags=("setop",),
    doc="INTERSECT ALL, bag semantics (colexec/intersectall/intersectall.go:69).",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    a = cat.table("customer").filter(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("k"))
    b = cat.table("supplier").select(F.col("s_nationkey").alias("k"))
    return a.intersectAll(b)


@register(
    "setop_except_all",
    oracle="""
SELECT n_regionkey AS k FROM nation
EXCEPT ALL
SELECT r_regionkey AS k FROM region WHERE r_name <> 'ASIA'
""",
    tags=("setop",),
    doc="EXCEPT ALL / Minus, bag semantics (colexec/minus/minus.go:57).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    a = cat.table("nation").select(F.col("n_regionkey").alias("k"))
    b = cat.table("region").filter(F.col("r_name") != "ASIA").select(F.col("r_regionkey").alias("k"))
    return a.exceptAll(b)


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15 OFFSET 5
""",
    tags=("sort",),
    doc="ORDER BY + LIMIT/OFFSET with unique tie-break (colexec/limit/limit.go:66, offset/offset.go:63, mergetop).",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .offset(5)
        .limit(15)
    )


@register(
    "sample_deterministic",
    oracle="""
SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 20 = 0
""",
    tags=("sample",),
    doc="Deterministic 5%% sample via key-mod (reference Sample op colexec/sample/sample.go:116 is random; hash-mod keeps the oracle exact — df.sample(fraction) exists for the non-oracle path).",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return o.filter(F.col("o_orderkey") % 20 == 0).select("o_orderkey", "o_custkey")


@register(
    "sample_per_group",
    oracle="""
SELECT c_nationkey, c_custkey FROM (
  SELECT c_nationkey, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer) t
WHERE rn <= 3
""",
    tags=("sample", "window"),
    doc="N-rows-per-group sample (reference sample/types.go:32 N-rows mode) via window row_number.",
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = Catalog(spark, sf_dir).table("customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey")
    )


@register(
    "grouping_sets_rollup",
    oracle="""
SELECT COALESCE(r_name, '<all>') AS r_name, COALESCE(n_name, '<all>') AS n_name,
       COUNT(*) AS cnt,
       CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("agg",),
    doc="GROUP BY ROLLUP + grouping() marker (reference rewrites rollup into unions in binder, plan/build_test.go:1125; Spark native rollup).",
)
def grouping_sets_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    n, r = cat.table("nation"), cat.table("region")
    df = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        df.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.grouping("r_name").cast("int").alias("g_r"),
            F.grouping("n_name").cast("int").alias("g_n"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("r_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("n_name"),
            "cnt",
            "g_r",
            "g_n",
        )
    )


@register(
    "grouping_sets_cube",
    oracle="""
SELECT COALESCE(o_orderstatus, '<all>') AS o_orderstatus,
       COALESCE(o_orderpriority, '<all>') AS o_orderpriority,
       COUNT(*) AS cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg",),
    doc="GROUP BY CUBE (all 4 grouping sets).",
)
def grouping_sets_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("o_orderpriority"),
            "cnt",
        )
    )


@register(
    "cte_reuse",
    oracle="""
WITH big_orders AS (
  SELECT o_custkey, COUNT(*) AS n_big
  FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
)
SELECT c.c_mktsegment, COUNT(*) AS customers,
       CAST(SUM(b.n_big) AS BIGINT) AS big_orders
FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
GROUP BY c.c_mktsegment
""",
    tags=("cte",),
    doc="Non-recursive CTE (reference cte/ BVT corpus; Spark: plain DataFrame reuse).",
)
def cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    big = (
        cat.table("orders")
        .filter(F.col("o_totalprice") > 200000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    c = cat.table("customer")
    return (
        c.join(big, c.c_custkey == big.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers"), F.sum("n_big").cast("bigint").alias("big_orders"))
    )


@register(
    "recursive_cte_hierarchy",
    oracle="""
WITH RECURSIVE h(node, depth) AS (
  SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
  UNION
  SELECT p.p_partkey AS node, h.depth + 1 AS depth
  FROM h JOIN part p ON p.p_partkey // 2 = h.node
)
SELECT depth, COUNT(*) AS n_nodes, MIN(node) AS min_node, MAX(node) AS max_node
FROM h GROUP BY depth
""",
    tags=("cte", "recursive"),
    doc="WITH RECURSIVE over an implicit binary hierarchy on part keys (parent = key div 2). Reference: MergeRecursive/MergeCTE loop (mergerecursive.go:47, batch Recursive flag types.go:46); BVT recursive_cte/. Spark: driver fixpoint loop, distributed steps (operators/recursive.py).",
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from matrixone_spark.operators.recursive import recursive_cte

    # NOTE (r12): an eager localCheckpoint of this static step input was
    # tried (one in-memory materialization instead of ~15 per-round parquet
    # re-scans) and REVERTED: on an idle box the interleaved A/B is neutral
    # on wall and slightly WORSE on executor time (ckpt 8.8 s vs 6.9 s ERT
    # min) — the 20K-row single-column scan with pushdown is cheaper than
    # the checkpoint job + block reads. The earlier "-6x ERT" reading was a
    # noise burst on the baseline side. Wall here is the driver-loop
    # scheduler-latency floor (~15 rounds x 2-3 jobs), not executor work.
    p = Catalog(spark, sf_dir).table("part").select(F.col("p_partkey").alias("node"))
    base = p.filter(F.col("node") == 1).select("node", F.lit(0).alias("depth"))

    def step(frontier):
        kids = frontier.select(F.col("node").alias("parent"), "depth").join(
            p, (F.col("node") / 2).cast("bigint") == F.col("parent")
        )
        return kids.select("node", (F.col("depth") + 1).alias("depth"))

    h = recursive_cte(base, step)
    return h.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


@register(
    "scalar_subquery_uncorrelated",
    oracle="""
SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM customer
WHERE c_acctbal > (SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                               / COUNT(*), 6) FROM customer)
  AND c_custkey % 10 = 0
""",
    tags=("subquery",),
    doc="Uncorrelated scalar subquery (reference: SINGLE join via flatten_subquery.go; Spark: scalar broadcast).",
)
def scalar_subquery_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    avg_df = c.agg(
        F.round(F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1)), 6).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_df))
        .filter((F.col("c_acctbal") > F.col("avg_bal")) & (F.col("c_custkey") % 10 == 0))
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"))
    )
