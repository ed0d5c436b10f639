"""Strict-error gate unit tests (matrixone_spark/strict_errors.py).

Static rules only — the data-checked rules (_probe-based) are exercised
end-to-end by the BVT replay. Each case mirrors a statement the
reference's .result file records as REJECTED (or, for the False cases, a
statement it answers), so these pins double as documentation of the
reference's strict-evaluation grammar (func_cast.go:6184-6560,
func_unary.go geometry gates, plan-time HAVING scoping)."""

from __future__ import annotations

import pytest

from matrixone_spark.strict_errors import (
    _explicit_int_cast_error,
    strict_reject,
)


class _Sess:
    schemas = {
        "t1": [("a", "int"), ("b", "int"), ("f", "float"), ("g", "double"),
               ("i", "date"), ("k", "timestamp"), ("str1", "string(10)")],
        "is_test": [("str1", "string"), ("d1", "int")],
        "t_tinyint": [("id", "int")],
    }
    sysvars: dict = {}
    spark = None


REJECTS = [
    # strict string→int cast grammar (explicit CAST)
    "select cast('abc' as signed)",
    "select cast('+-1' as signed)",
    "select cast('- 1' as signed)",
    "select cast('0b102' as signed)",
    "select cast('0x' as signed)",
    "select cast('' as signed)",
    "select cast('a10' as unsigned integer)",
    # double→int64 range, hex literal range
    "select cast(cast('9.223372036854776e18' as double) as signed)",
    "select CAST(0x8fffffffffffffff as signed)",
    # int64 function params
    "select substring('hello', 18446744073709551615, 1)",
    "select lpad('hello', -18446744073709551616, '1')",
    "SELECT 1 FROM t1 GROUP BY MID('',1,'')",
    # bitwise aggregates over non-integer types
    "select bit_and(f) from t1",
    "select bit_or(k) from t1",
    "SELECT BIT_XOR(1 / 0)",
    "SELECT BIT_OR(CAST(str1 AS FLOAT)) FROM t1",
    # timestamp→float cast
    "SELECT CAST(TIMESTAMP'2000-01-01 23:59:59' AS FLOAT)",
    # arithmetic with a non-numeric string literal
    "select 10+'a'",
    # HAVING without GROUP BY on a bare column
    "SELECT a FROM t1 WHERE a > ANY (SELECT a FROM t1 HAVING a = 2)",
    # IS TRUE over a string column
    "SELECT * FROM is_test WHERE str1 IS FALSE",
    # parsedate literals
    "SELECT YEAR('10000-12-21') as y",
    "SELECT YEAR(2015) as y",
    "SELECT SECOND('15:30:45') AS r",
    # conv full-string base validation
    "select conv('g', 16, 10)",
    "select conv('10xyz', 10, 16)",
    # INT ± INTERVAL
    "select cast(20260515 as int) + interval 1 hour",
    # weekday/dayofyear numeric types
    "SELECT dayofyear(20150904) as d",
    "SELECT weekday(1=1) as w",
    # space/oct
    "select space(8001)",
    "select oct(10e50)",
    "select oct('abc')",
    # multiple ORDER BY / LIMIT
    "(select a from t1 order by a) order by a",
    "(((select a from t1) limit 1)) limit 1",
    # int column vs non-integer string literal (strict compare parse)
    "SELECT * from t_tinyint WHERE id = '1.1'",
    "SELECT * from t_tinyint WHERE id IN ('1.1', '2.2')",
    "SELECT * from t_tinyint WHERE id BETWEEN '1.1' AND '1.9'",
    # decimal casts
    "select 10.0+cast('a' as decimal)",
    "SELECT CAST('' AS decimal)",
    # varbinary width
    "select cast('26713hajncjdncekfwr' as varbinary(1))",
    "select cast(2913812 as varbinary(1))",
    # geometry preconditions
    "select st_area(st_geomfromtext('POINT(1 1)'))",
    "select st_geomfromtext('POINT(NaN 1)')",
    "select st_geomfromtext('POINT(1')",
    "select st_geomfromtext('GEOMETRYCOLLECTION(POINT(1 1),)')",
    "select st_pointn(st_geomfromtext('LINESTRING(0 0,3 4)'), 3)",
    "select st_centroid(st_geomfromtext('MULTIPOINT((0 0),(1 1))'))",
    "select st_distance(st_geomfromtext('POINT(0 0)', 4326), "
    "st_geomfromtext('POINT(2 0)', 3857))",
    "select st_dimension( st_geomfromtext( concat(repeat("
    "'GEOMETRYCOLLECTION(', 65), 'POINT(0 0)', repeat(')', 65)) ) )",
]

ANSWERS = [
    # the reference parses these leniently — the gate must stay silent
    "select cast('1.5' as signed)",          # leading-prefix truncation
    "select cast('10x' as unsigned integer)",
    "select cast('0b1010' as signed)",
    "select cast('999999999999999999999999' as signed)",  # saturates
    "select cast('9999999.99' as decimal(6,2))",
    "select 10+'1'",
    "select substring('hello', 2, 1)",
    "select bit_and(a) from t1",
    "SELECT a FROM t1 GROUP BY a HAVING a = 2",
    "SELECT count(*) c FROM t1 HAVING count(*) > 1",
    "SELECT * FROM is_test WHERE d1 IS TRUE",
    "SELECT YEAR('2015-09-30') as y",
    "SELECT YEAR(20150930) as y",
    "SELECT SECOND('2024-01-01 15:30:45')",
    "select conv('ff', 16, 10)",
    "select cast('2026-05-15' as date) + interval 1 hour",
    "select weekday('2024-01-01') from t1",
    "select space(10)",
    "select oct(15)",
    "(select a from t1 order by a) limit 1",
    "select a from t1 order by a",
    "SELECT * from t_tinyint WHERE id = '1'",
    "SELECT * from t_tinyint WHERE id = 1.1",
    "select st_area(st_geomfromtext('POLYGON((0 0,1 0,1 1,0 1,0 0))'))",
    "select st_geomfromtext('POINT(1 1)')",
    "select st_pointn(st_geomfromtext('LINESTRING(0 0,3 4)'), 2)",
]


@pytest.mark.parametrize("sql", REJECTS)
def test_gate_rejects(sql):
    assert strict_reject(sql, _Sess()) is not None, sql


@pytest.mark.parametrize("sql", ANSWERS)
def test_gate_answers(sql):
    assert strict_reject(sql, _Sess()) is None, sql


def test_explicit_grammar_pins():
    # func_cast.go explicitIntegerCastInput + parseCastNumericToken
    assert not _explicit_int_cast_error("1.5")   # prefix '1'
    assert not _explicit_int_cast_error("10x")   # prefix '10'
    assert not _explicit_int_cast_error(".5")    # reads as 0
    assert _explicit_int_cast_error("abc")
    assert _explicit_int_cast_error("+-1")
    assert _explicit_int_cast_error("0b")
    assert _explicit_int_cast_error("0o18")
    assert _explicit_int_cast_error("")


def test_max_points_sysvar():
    class S(_Sess):
        sysvars = {"max_points_in_geometry": "3"}

    r = strict_reject(
        "select st_geomfromtext('LINESTRING(0 0,1 1,2 2,3 3)')", S()
    )
    assert r is not None and "max_points_in_geometry=3" in r
    assert strict_reject(
        "select st_geomfromtext('LINESTRING(0 0,1 1,2 2)')", S()
    ) is None
