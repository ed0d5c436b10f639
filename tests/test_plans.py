"""Plan-shape regression gates: the optimizations PERF.md claims must stay
in the executed plans (broadcasts, pushdown, pruning, no-shuffle top-k)."""

from __future__ import annotations

import re

from matrixone_spark.queries import load_all
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    return load_all()[name].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_dims_after_aqe(spark):
    """Bounded dims broadcast statically; supplier-sized frames convert to
    broadcast at runtime via AQE at this SF (and stay shuffled at 100 TB —
    the point of not forcing them). Assert on the POST-execution final plan."""
    df = load_all()["tpch_q5"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, plan
    # fact-fact joins (lineitem⋈orders) may legitimately stay sort-merge
    assert plan.count("SortMergeJoin") <= 2, plan


def test_q6_pushdown_and_pruning(spark):
    plan = _plan(spark, "tpch_q6")
    scan = plan.split("FileScan")[1]
    assert "PushedFilters: [IsNotNull(l_shipdate)" in scan, scan[:400]
    # column pruning: only the 4 needed columns in ReadSchema
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    cols = m.group(1).count(":") if m else 99
    assert cols == 4, scan[:400]


def test_knn_plans_take_ordered_no_exchange(spark):
    plan = _plan(spark, "knn_exact_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_aggregates_are_two_phase(spark):
    # partial→merge split (Group→MergeGroup parity); physical flavor may be
    # Hash- or SortAggregate depending on buffer types
    plan = _plan(spark, "agg_basic")
    assert "merge_count" in plan or "partial_count" in plan, plan
    assert plan.count("Aggregate(") >= 2, plan
    plan_q1 = _plan(spark, "tpch_q1")
    assert "HashAggregate" in plan_q1, plan_q1


def test_sql_join_hints_respected(spark):
    """Optimizer hints (BVT hint/; reference parses MySQL-style optimizer
    hints): Spark SQL comment hints steer the physical join strategy."""
    from matrixone_spark.engine import Engine

    eng = Engine(spark)
    eng.load(SF_DIR)
    q = (
        "SELECT /*+ {h} */ COUNT(*) AS n FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # kill auto-broadcast so only the hint can produce a broadcast join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bcast = eng.sql(q.format(h="BROADCAST(c)"))
        plan = bcast._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        merge = eng.sql(q.format(h="MERGE(c)"))
        plan_m = merge._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan_m, plan_m
        assert bcast.first().n == merge.first().n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bvt_battery_constant_folds_no_scan(spark):
    """The BVT batteries must compile to constant-folded one-row unions —
    zero parquet scans, values computed at optimization time."""
    from matrixone_spark.queries import load_all

    df = load_all()["bvt_select_battery"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    assert "OneRowRelation" in plan


def test_s2_bucket_join_is_single_shuffle_equi_join(spark):
    """The S2-bucketed spatial join must plan as an equi-join on the cell id
    (bounded-key shuffle), never a cross join."""
    from matrixone_spark.queries import load_all

    df = load_all()["geo_s2_bucket_join"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") == 2
