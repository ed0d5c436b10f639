"""SQL-text surface: the original TPC-H SQL (column-adapted) must run
through Engine.sql and agree with the DataFrame implementations — the
reference's interactive SQL entry point (SURVEY §3.1: doComQuery →
spark.sql) at parity."""

from __future__ import annotations

from matrixone_spark.engine import Engine
from matrixone_spark.oracle import compare_frames
from matrixone_spark.queries import load_all
from tests.conftest import SF_DIR


def _engine(spark) -> Engine:
    eng = Engine(spark)
    eng.load(SF_DIR)
    return eng


def test_q1_sql_text_matches_dataframe(spark):
    eng = _engine(spark)
    sql_df = eng.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """).toPandas()
    df = load_all()["tpch_q1"].fn(spark, SF_DIR).toPandas()[
        ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    ]
    assert not compare_frames(sql_df, df)


def test_parameterized_sql(spark):
    eng = _engine(spark)
    named = eng.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority = :prio",
        {"prio": "1-URGENT"},
    ).collect()[0].n
    direct = eng.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority = '1-URGENT'"
    ).collect()[0].n
    assert named == direct > 0


def test_sql_window_and_cte_text(spark):
    eng = _engine(spark)
    rows = eng.sql("""
        WITH ranked AS (
          SELECT n_name, s_name, s_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rn
          FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        SELECT n_name, s_name FROM ranked WHERE rn = 1
    """).collect()
    assert len(rows) > 0


def test_engine_explain_modes(spark):
    from matrixone_spark.engine import Engine

    eng = Engine(spark)
    eng.load(SF_DIR)
    sql = "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus"
    formatted = eng.explain(sql)
    assert "HashAggregate" in formatted and "ReadSchema" in formatted
    # column pruning visible at the scan
    assert "struct<o_orderstatus:string>" in formatted
    simple = eng.explain(sql, "simple")
    assert "Physical Plan" in simple
    # MySQL-dialect path translates before planning
    my = eng.explain_mysql(
        "SELECT DATE_FORMAT(o_orderdate, '%Y') AS y FROM orders LIMIT 5", "simple")
    assert "yyyy" in my  # java pattern visible post-translation
    import pytest
    with pytest.raises(ValueError):
        eng.explain(sql, "bogus")


def test_prepare_execute(spark):
    eng = _engine(spark)
    stmt = eng.prepare(
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
        "WHERE o_orderpriority = :prio GROUP BY o_orderpriority"
    )
    for prio in ("1-URGENT", "2-HIGH"):
        rows = stmt.execute({"prio": prio}).collect()
        assert len(rows) == 1 and rows[0].o_orderpriority == prio and rows[0].n > 0


def test_prepare_mysql_dialect(spark):
    eng = _engine(spark)
    stmt = eng.prepare(
        "SELECT DATE_FORMAT(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n "
        "FROM orders WHERE o_orderpriority = ? GROUP BY ym ORDER BY ym LIMIT 3",
        dialect="mysql",
    )
    rows = stmt.execute(["1-URGENT"]).collect()
    assert rows and all(len(r.ym) == 7 and r.n > 0 for r in rows)
