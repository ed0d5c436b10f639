"""MySQL-dialect SQL text translation through Engine.mysql_sql."""

from __future__ import annotations

from matrixone_spark.engine import Engine
from matrixone_spark.mysql_dialect import translate
from tests.conftest import SF_DIR


def test_translate_patterns():
    assert (
        translate("SELECT DATE_FORMAT(o_orderdate, '%Y-%m') FROM orders")
        == "SELECT date_format(o_orderdate, 'yyyy-MM') FROM orders"
    )
    # date-only format → DATE result (func_str_to_date.go), parsed with
    # MySQL's lenient 1-2 digit field widths
    assert (
        translate("SELECT STR_TO_DATE(s, '%d/%m/%Y') FROM t")
        == "SELECT to_date(s, 'd/M/yyyy') FROM t"
    )
    # MySQL group_concat: insertion order (no array_sort), NULL for an
    # all-NULL/empty group
    assert (
        translate("SELECT GROUP_CONCAT(n_name SEPARATOR '|') FROM nation")
        == "SELECT (CASE WHEN count(n_name) = 0 THEN NULL"
        " ELSE concat_ws('|', collect_list(n_name)) END) FROM nation"
    )
    assert (
        translate("SELECT GROUP_CONCAT(n_name) FROM nation")
        == "SELECT (CASE WHEN count(n_name) = 0 THEN NULL"
        " ELSE concat_ws(',', collect_list(n_name)) END) FROM nation"
    )


def test_mysql_sql_end_to_end(spark):
    eng = Engine(spark)
    eng.load(SF_DIR)
    rows = eng.mysql_sql("""
        SELECT DATE_FORMAT(o_orderdate, '%Y-%m') AS ym,
               GROUP_CONCAT(DISTINCT o_orderstatus SEPARATOR '/') AS statuses,
               COUNT(*) AS n
        FROM `orders`
        WHERE o_orderkey % 100 = 0
        GROUP BY DATE_FORMAT(o_orderdate, '%Y-%m')
        ORDER BY ym LIMIT 5
    """).collect()
    assert len(rows) == 5
    assert all(len(r.ym) == 7 and r.n > 0 for r in rows)
    assert all(set(r.statuses.split("/")) <= {"F", "O", "P"} for r in rows)


def test_string_literals_never_rewritten():
    """Quoted spans are masked before any regex runs: function-looking text
    inside a string literal must pass through byte-identical."""
    sql = "SELECT 'call version() now', 'date_format(x, ''%Y'')', \"group_concat(a)\" FROM t"
    assert translate(sql) == sql
    # mixed: literal untouched, real call outside the literal still rewritten
    out = translate("SELECT 'version()', VERSION() FROM t")
    assert out == "SELECT 'version()', '8.0.30-MatrixOne-v1.3.0' FROM t"
    out = translate("SELECT DATE_FORMAT(d, '%Y'), 'DATE_FORMAT(d, ''%Y'')' FROM t")
    assert out == "SELECT date_format(d, 'yyyy'), 'DATE_FORMAT(d, ''%Y'')' FROM t"


def test_unknown_format_tokens_stay_literal():
    """MySQL treats unknown %-tokens as literal chars; '%x' must not leak the
    bare pattern letter x (week-based year) into Spark's engine."""
    from matrixone_spark.functions.mysql import mysql_format_to_java

    assert mysql_format_to_java("%x") == "'x'"
    assert mysql_format_to_java("%Y-%x") == "yyyy-'x'"
    assert mysql_format_to_java("%1") == "1"


def test_time_to_sec_negative(spark):
    from matrixone_spark.functions.mysql import time_to_sec

    df = spark.createDataFrame(
        [("01:30:00",), ("-01:30:00",), ("-00:00:30",), (None,)], "t string"
    )
    vals = [r.s for r in df.select(time_to_sec("t").alias("s")).collect()]
    assert vals == [5400, -5400, -30, None]


def test_convert_tz(spark):
    rows = spark.sql(translate(
        "SELECT convert_tz('2023-11-06 10:28:00','GMT','MET') AS a, "
        "convert_tz('2023-01-06 10:28:00','+08:00','+00:00') AS b, "
        "convert_tz('2023-11-05 05:00:00','US/Eastern','US/Central') AS c"
    )).collect()[0]
    assert str(rows.a) == "2023-11-06 11:28:00"  # MET = UTC+1 in November
    assert str(rows.b) == "2023-01-06 02:28:00"
    assert str(rows.c) == "2023-11-05 04:00:00"  # across the DST fall-back


def test_mysql_cast_targets(spark):
    rows = spark.sql(translate(
        "SELECT cast(2.9 as signed) AS s1, cast(-2.9 as signed) AS s2, "
        "cast(2.4 as signed) AS s3, "
        "cast(18446744073709551614 as unsigned) AS u, "
        "cast('2024-05-16 12:34:56' as datetime) AS dt, "
        "cast(12.5 as decimal(10,2)) AS d"
    )).collect()[0]
    # MySQL rounds on cast-to-integer (CAST(2.9 AS SIGNED) = 3)
    assert (rows.s1, rows.s2, rows.s3) == (3, -3, 2)
    assert str(rows.u) == "18446744073709551614"  # uint64 via DECIMAL(20,0), exact
    assert str(rows.dt) == "2024-05-16 12:34:56"
    assert str(rows.d) == "12.50"  # ordinary decimal casts untouched


def test_truncate_numeric(spark):
    out = spark.sql(
        translate("SELECT TRUNCATE(1.999, 1) AS a, TRUNCATE(-1.999, 1) AS b, TRUNCATE(122, -2) AS c")
    ).collect()[0]
    assert float(out.a) == 1.9 and float(out.b) == -1.9 and float(out.c) == 100.0


def test_system_meta_fold():
    # No-arg system calls fold to session-context literals (functions/system.py)
    out = translate("SELECT VERSION() AS v, DATABASE() AS d, CONNECTION_ID() AS c")
    assert out == (
        "SELECT '8.0.30-MatrixOne-v1.3.0' AS v, 'mo' AS d, "
        "CAST(1 AS BIGINT) AS c"
    )
    # Arg-taking calls are NOT touched (user-defined or column-applied forms)
    assert translate("SELECT charset(x) FROM t") == "SELECT charset(x) FROM t"


def test_system_meta_end_to_end(spark):
    eng = Engine(spark)
    eng.load(SF_DIR)
    row = eng.mysql_sql(
        "SELECT VERSION() AS v, USER() AS u, CURRENT_ROLE() AS r, "
        "FOUND_ROWS() AS f FROM region LIMIT 1"
    ).collect()[0]
    assert row.v.startswith("8.0.30-MatrixOne-v")
    assert row.u == "root@localhost" and row.r == "moadmin" and row.f == 0


def test_quantified_comparisons_vs_duckdb(spark):
    """ANY/SOME/ALL rewrite (rewrite_quantified): full op × quantifier ×
    NULL-shape matrix must match DuckDB's native quantified comparisons,
    including the projection-context NULL cases Spark's own InSubquery
    (ExistenceJoin) gets wrong."""
    import duckdb

    con = duckdb.connect()
    shapes = {
        "tv": [(1,), (2,), (3,), (None,)],
        "te": [],
        "tn": [(None,)],
        "tnn": [(1,), (2,), (3,)],
        "tsame": [(2,), (2,)],
    }
    for name, rows in shapes.items():
        con.execute(f"CREATE TABLE {name}(v INT)")
        if rows:
            con.executemany(f"INSERT INTO {name} VALUES (?)", rows)
        body = ", ".join("(%s)" % ("NULL" if r[0] is None else r[0]) for r in rows)
        if rows:
            spark.sql(
                f"CREATE OR REPLACE TEMP VIEW {name} AS "
                f"SELECT CAST(col1 AS INT) AS v FROM VALUES {body}"
            )
        else:
            spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS SELECT 1 AS v WHERE 1=0")
    cases = [
        f"{x} {op} {kw} (SELECT v FROM {tbl})"
        for tbl in shapes
        for x in ("0", "2", "5", "CAST(NULL AS INT)")
        for kw in ("ANY", "ALL")
        for op in ("=", "<>", "<", ">", "<=", ">=")
    ]
    # batch: one SELECT with every case as a column, per engine
    sel = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cases))
    want = list(con.execute(f"SELECT {sel}").fetchone())
    got = list(spark.sql(translate(f"SELECT {sel}")).collect()[0])
    diffs = [
        (cases[i], g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
    ]
    assert not diffs, diffs[:5]


def test_rank_without_order_by(spark):
    """MySQL allows rank-family window fns with no ORDER BY (all peers);
    the dialect injects a constant ORDER BY so Spark accepts the window
    with identical peer semantics (window/window.sql BVT shapes)."""
    t = translate("select a, rank() over (partition by a) as r from t1")
    assert "order by 1" in t.lower()
    # already-ordered windows are left alone
    t2 = translate("select rank() over (partition by a order by c) from t1")
    assert "order by 1" not in t2.lower()
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW rnkt AS "
        "SELECT col1 AS a, col2 AS c FROM VALUES (1,2),(1,3),(2,4)"
    )
    rows = spark.sql(
        translate(
            "select a, rank() over (partition by a) as r, "
            "dense_rank() over () as d, percent_rank() over () as p from rnkt"
        )
    ).collect()
    assert all(r.r == 1 and r.d == 1 and r.p == 0.0 for r in rows)


def test_mysql_row_and_truth_semantics(spark):
    """Row-constructor comparisons/IN (3VL), IS TRUE/FALSE numeric form,
    unsigned ~, 0x literals, IN_RANGE, mixed-type IN — BVT operator/,
    expression/, dtype/ category shapes."""
    cases = [
        ("(1,2,3)=(1,null,3)", None),
        ("(1,2,3)=(1,null,0)", False),      # reference row_constructor.result:9
        ("(1,2,3) < (1,null,3)", None),
        ("(1, 3) in ((1, 2), (null, 3))", None),
        ("(1, 2) in ((1, 2), (null, 2))", True),
        ("-1 IS TRUE", True),
        ("NULL IS TRUE", False),
        ("1-1 IS NOT TRUE", True),
        ("IN_RANGE(10, 1, 10, 2)", False),  # [lo,hi) — operator_between.go:529
        ("IN_RANGE(5, 1, 10, 3)", True),
        ("'9.50' in (7, '8', 9.5)", True),  # numeric coercion of mixed IN
        ("0xFF", 255),
    ]
    sel = ", ".join(f"{c} AS c{i}" for i, (c, _) in enumerate(cases))
    row = spark.sql(translate(f"SELECT {sel}")).collect()[0]
    for i, (expr, want) in enumerate(cases):
        got = row[i]
        if got is not None and want is not None and not isinstance(want, bool):
            got = type(want)(got)
        assert got == want, (expr, got, want)
    assert spark.sql(translate("SELECT ~0 AS u")).collect()[0][0] == int(2**64 - 1)


def test_refresults_plain_format():
    """RefResults parses the plain (mysql-test style) .result format: echo,
    header line, tab- or 4-space-separated rows."""
    from matrixone_spark.bvt_runner import RefResults

    txt = (
        "select a, b from t;\n"
        "a\tb\n"
        "1\t2\n"
        "3\t4\n"
        "select x from t2;\n"
        "x\n"
        "9\n"
    )
    ref = RefResults(txt)
    kind, rows = ref.claim("select a, b from t")
    assert kind == "rows" and rows == [["1", "2"], ["3", "4"]]
    kind, rows = ref.claim("select x from t2")
    assert kind == "rows" and rows == [["9"]]
    spaced = RefResults("select a, b from t;\na    b\n1    JACK\n")
    kind, rows = spaced.claim("select a, b from t")
    assert kind == "rows" and rows == [["1", "JACK"]]


def test_quantified_filter_context_exists(spark):
    """WHERE-context quantified comparisons become EXISTS probes: exact for
    filtering, correlation-safe, row-valued lhs supported
    (subquery-with-any.sql shapes Spark's scalar-agg form rejects)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW qt1 AS "
        "SELECT col1 AS a, col2 AS b FROM VALUES (1,2),(2,2),(3,4)"
    )
    cases = [
        ("SELECT a FROM qt1 WHERE (a,1) = ANY (SELECT a,1 FROM qt1 HAVING a = 2)", [(2,)]),
        ("SELECT a FROM qt1 WHERE a > ALL (SELECT a FROM qt1 WHERE b = 2)", [(3,)]),
        ("SELECT a FROM qt1 WHERE (a,1) > ANY (SELECT a,1 FROM qt1 WHERE b=2)", [(2,), (3,)]),
        ("SELECT 1 AS r FROM dual WHERE 1 < ANY (SELECT 2)", [(1,)]),
        ("SELECT a FROM qt1 HAVING a = 2", [(2,)]),
        ("SELECT a FROM qt1 WHERE b=2 HAVING a >= 2", [(2,)]),
    ]
    from matrixone_spark.mysql_dialect import _FROM_DUAL_RE

    for sql, want in cases:
        if "dual" in sql:
            sql = _FROM_DUAL_RE.sub(" ", sql)
        got = sorted(tuple(r) for r in spark.sql(translate(sql)).collect())
        assert got == sorted(want), (sql, got, want)


def test_apply_and_values_table(spark):
    """CROSS/OUTER APPLY → LATERAL joins; VALUES ROW() and TABLE t as
    subqueries; MySQL generate_series is empty when start > stop
    (join/apply.sql, subquery/mysql_compat_values_table_subquery.sql)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW apt AS "
        "SELECT col1 AS a, col2 AS b FROM VALUES (1,3),(2,-2)"
    )
    got = spark.sql(
        translate("select t.a, tf.result from apt t cross apply "
                  "generate_series(t.a, t.b) tf")
    ).collect()
    assert sorted((r.a, r.result) for r in got) == [(1, 1), (1, 2), (1, 3)]
    got = spark.sql(
        translate("select t.a, tf.result from apt t outer apply "
                  "generate_series(t.a, t.b) tf")
    ).collect()
    assert sorted(((r.a, r.result) for r in got), key=str) == sorted(
        [(1, 1), (1, 2), (1, 3), (2, None)], key=str
    )
    spark.sql("CREATE OR REPLACE TEMP VIEW vtv AS SELECT col1 AS v FROM VALUES (20),(30)")
    rows = spark.sql(
        translate("select 11 as r where 20 = any (values row(15), row(20)) "
                  "and 20 in (values row(20), row(30)) and 20 in (table vtv)")
    ).collect()
    assert [r.r for r in rows] == [11]


def test_time_window_sql_surface(spark):
    """Reference INTERVAL(ts,n,unit)/SLIDING/FILL SQL surface
    (window/time_window.sql; timewin.go:476 semantics): windows align to
    the year-1 origin, FILL patches NULL aggregates over non-empty windows
    only (no gap rows), linear interpolates by emitted-row index, sliding
    enumeration anchors at the first row's interval-aligned window."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW twt AS SELECT col1 AS ts, col2 AS v FROM VALUES "
        "(timestamp '2023-10-26 10:00:01', 1), "
        "(timestamp '2023-10-26 10:10:02', CAST(NULL AS INT)), "
        "(timestamp '2023-10-26 10:20:03', 5)"
    )
    rows = spark.sql(
        translate("select _wstart, _wend, max(v) from twt interval(ts, 10, second)")
    ).collect()
    # year-1 origin: 10s grid coincides with epoch grid here
    assert sorted(str(r[0]) for r in rows) == [
        "2023-10-26 10:00:00", "2023-10-26 10:10:00", "2023-10-26 10:20:00"
    ]
    # fill(prev): NULL aggregate patched from the previous window; no gap rows
    rows = sorted(
        spark.sql(
            translate("select _wstart, max(v) from twt interval(ts, 10, second) fill(prev)")
        ).collect()
    )
    assert [(str(r[0])[14:16], r[1]) for r in rows] == [("00", 1), ("10", 1), ("20", 5)]
    # fill(linear): row-index midpoint, not time-weighted
    rows = sorted(
        spark.sql(
            translate("select _wstart, max(v) from twt interval(ts, 10, second) fill(linear)")
        ).collect()
    )
    assert [r[1] for r in rows] == [1.0, 3.0, 5.0]
    # sliding: anchored at the first row's interval-aligned window
    rows = sorted(
        spark.sql(
            translate(
                "select _wstart, count(v) from twt interval(ts, 20, minute) sliding(10, minute)"
            )
        ).collect()
    )
    assert str(rows[0][0]) == "2023-10-26 10:00:00"  # no 09:50 leading window


def test_binary_cast_semantics(spark):
    """MySQL BINARY casts convert the TEXT rendering to bytes, truncate to
    n and zero-pad (BINARY only) — dtype/binary.test; bit literals b'0101'
    are integers in numeric context."""
    from matrixone_spark.mysql_dialect import translate

    assert spark.sql(translate("select binary(12345)")).collect()[0][0] == b"12345"
    assert (
        spark.sql(
            translate("SELECT CAST(TIMESTAMP '2022-01-22 21:45:33' AS BINARY(6))")
        ).collect()[0][0]
        == b"2022-0"
    )
    assert (
        spark.sql(translate("select cast('ab' as binary(4))")).collect()[0][0]
        == b"ab\x00\x00"
    )
    assert (
        spark.sql(translate("select cast('abcdef' as varbinary(3))")).collect()[0][0]
        == b"abc"
    )
    assert spark.sql(translate("select b'11111'")).collect()[0][0] == 31
    # non-bit b'...' strings stay literals
    assert translate("select b'xy'") == "select b'xy'"


def test_reference_cast_models(spark):
    """func_cast.test parity: radix string literals, double half-even
    rounding, decimal-source clamp vs literal uint64 wrap, CHAR(n)
    truncation, dotted dates, fractional UNIX_TIMESTAMP."""
    from matrixone_spark.mysql_dialect import translate

    def one(q):
        return tuple(spark.sql(translate(q)).collect()[0])

    assert one("select cast('0x123' as signed), cast('-0o17' as decimal(6,2)), "
               "cast('+0b1010' as unsigned)")[0:2] == (291, -15)
    assert one(
        "select cast(cast(0.5 as double) as signed), "
        "cast(cast(2.5 as double) as signed)"
    ) == (0, 2)
    assert one("select cast(18446744073709551615 as signed)") == (-1,)
    assert one("select cast(19999999999999999999 as signed)") == (9223372036854775807,)
    assert one(
        "select cast(cast(18446744073709551615 as decimal(20,0)) as signed)"
    ) == (9223372036854775807,)
    assert str(one("select cast('2006.1.1' as date)")[0]) == "2006-01-01"
    assert one("select cast(cast(12345 as unsigned) as char(3))") == ("123",)
    assert float(one("select UNIX_TIMESTAMP('2024-01-15 12:34:56.5')")[0]) == 1705322096.5
    assert one("select 10E+0+'a', 1 = '1rest'") == (10.0, True)
