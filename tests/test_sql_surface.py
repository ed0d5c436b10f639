"""SQL-text function surface (functions/sql_surface.py): the reference's
scalar names callable from spark.sql TEXT, with DuckDB twins that agree —
the BVT co-executor's comparability depends on both engines answering the
same values.  Reference: pkg/sql/plan/function/list_builtIn.go."""

import duckdb
import pytest

from matrixone_spark.bvt_runner import _duckify
from matrixone_spark.functions import sql_surface
from matrixone_spark.mysql_dialect import translate


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    sql_surface.register_duck(con)
    return con


# (statement, expected single-row tuple as strings) — values chosen from
# the reference's .result files where available
CASES = [
    ("select sec_to_time(3661) a, sec_to_time(-3600) b", ("01:01:01", "-01:00:00")),
    ("select time_to_sec('-01:30:00') a", ("-5400",)),
    ("select period_diff(200802, 200703) a, period_add(200802, 2) b",
     ("11", "200804")),
    ("select to_days('2007-10-07') a, cast(from_days(733321) as string) b",
     ("733321", "2007-10-07")),
    ("select week('2008-02-20') a, week('2008-02-20', 1) b", ("7", "8")),
    ("select cast(makedate(2011, 32) as string) a, maketime(12, 15, 30) b",
     ("2011-02-01", "12:15:30")),
    ("select microsecond('10:00:00.123') a", ("123000",)),
    ("select strcmp('a', 'b') a, strcmp('b', 'a') b, strcmp('a', 'a') c",
     ("-1", "1", "0")),
    ("select format(1234567.891, 2) a", ("1,234,567.89",)),
    ("select inet_aton('10.0.5.9') a, inet_ntoa(167773449) b",
     ("167773449", "10.0.5.9")),
    ("select is_uuid('6ccd780c-baba-1026-9564-5b8c656024db') a", ("true",)),
    ("select bin_to_uuid(uuid_to_bin('6ccd780c-baba-1026-9564-5b8c656024db')) a",
     ("6ccd780c-baba-1026-9564-5b8c656024db",)),
    ("select cast(mo_log_date('path/2021/01/05/log.txt') as string) a",
     ("2021-01-05",)),
    ("select inet6_ntoa(inet6_aton('fdfe::5a55:caff:fefa:9089')) a",
     ("fdfe::5a55:caff:fefa:9089",)),
    ("select uncompress(compress('abcdef')) a, "
     "uncompressed_length(compress('abcdef')) b", ("abcdef", "6")),
    ("select timediff('2007-12-31 23:59:59', '2007-12-30 01:01:02') a",
     ("46:58:57",)),
    ("select addtime('2007-12-31 23:59:59', '1 1:1:1') a",
     ("2008-01-02 01:01:00",)),
    ("select subtime('01:00:00', '00:30:00') a", ("00:30:00",)),
    ("select time_format('100:02:03', '%H %i %s') a", ("100 02 03",)),
    ("select get_format('DATE', 'USA') a", ("%m.%d.%Y",)),
    # inner_product is NEGATED like the reference (metric.InnerProduct
    # returns -sum, distance_func.go:206)
    ("select l2_distance('[1,2]', '[4,6]') a, inner_product('[1,2,3]', '[1,2,3]') b",
     ("5.0", "-14.0")),
    ("select subvector('[16,15,0,0,5,46,5,5,4,0]', 6, 5) a",
     ("[46, 5, 5, 4, 0]",)),
    ("select normalize_l2('[3,4]') a", ("[0.6, 0.8]",)),
    ("select json_object('a', 1, 'b', 'x') a", ('{"a": 1, "b": "x"}',)),
    ("select json_array(1, 'x', null) a", ('[1, "x", null]',)),
    ("select json_set('{}', '$.a', 1, '$.b', 2) a", ('{"a": 1, "b": 2}',)),
    ("select json_remove('{\"a\":1,\"b\":2}', '$.a') a", ('{"b": 2}',)),
    ("select json_merge_patch('{\"a\":1}', '{\"b\":2}') a",
     ('{"a": 1, "b": 2}',)),
    ("select json_contains('[1,2,3]', '2') a", ("true",)),
    ("select json_type('[1,2]') a, json_keys('{\"a\":1,\"b\":2}') b",
     ("ARRAY", '["a", "b"]')),
    ("select jq('{\"a\":1}', '.a') a", ("1",)),
    ("select cast(str_to_date('01,5,2013', '%d,%m,%Y') as string) a",
     ("2013-05-01",)),
    ("select cast('[1,2,3]' as vecf32(3)) a", ("[1, 2, 3]",)),
    ("select cast(5 as int(11)) a, cast(5 as real) b", ("5", "5.0")),
    ("select convert(5, double) a", ("5.0",)),
    ("select cast(date_add('2022-02-28', interval 1 day) as string) a",
     ("2022-03-01",)),
    ("select cast(date_add('2022-02-28 23:59:59', interval 1 second) as string) a",
     ("2022-03-01 00:00:00",)),
    ("select cast(date_sub('2022-03-01', interval 1 day) as string) a",
     ("2022-02-28",)),
]


def _fmt(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


@pytest.mark.parametrize("stmt,want", CASES, ids=[c[0][:48] for c in CASES])
def test_surface_spark(spark, stmt, want):  # noqa: F811
    rows = spark.sql(translate(stmt)).collect()
    assert len(rows) == 1
    assert tuple(_fmt(v) for v in rows[0]) == want


# DuckDB twins must agree with the Spark answers on the shared subset
# (cases whose SQL both engines accept after their dialect rewrites)
DUCK_SKIP = {
    # Spark renders DATE/TIMESTAMP via the cast-to-string in the case
    # itself; Duck returns native types — those cases assert Spark only
}


@pytest.mark.parametrize("stmt,want", CASES, ids=[c[0][:48] for c in CASES])
def test_surface_duck_agrees(duck, stmt, want):
    try:
        rows = duck.execute(_duckify(stmt)).fetchall()
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"duck-side dialect gap: {e}")
    assert len(rows) == 1
    got = tuple(_fmt(v) for v in rows[0])
    # numeric cells compare as floats (5 vs 5.0 renderings differ)
    for g, w in zip(got, want):
        try:
            assert float(g) == pytest.approx(float(w))
        except ValueError:
            assert g == w


def test_strict_gate_json_format_nameconst():
    """New strict-gate families (r12): invalid constant JSON casts,
    FORMAT misuse (temporal arg / numeric consumption), NAME_CONST
    literal-argument shapes (func_convert_json / func_string_format /
    func_nameconst .result error parity)."""
    from matrixone_spark.strict_errors import strict_reject

    class S:
        schemas = {"t": [("d", "date"), ("dt", "timestamp"), ("x", "int")]}
        colmeta = {}
        tables = {"t": None}

    s = S()
    assert "json text is empty" in strict_reject(
        "select convert('', json)", s)
    assert "json text not json" in strict_reject(
        "select convert('not json', json)", s)
    assert strict_reject("select convert('null', json)", s) is None
    assert "UUID JSON" in strict_reject(
        "select convert(cast('0-0' as uuid), json)", s)
    assert "DATE BIGINT" in strict_reject(
        "select d, format(d, 1) from t", s)
    assert "DATETIME BIGINT" in strict_reject(
        "select dt, format(dt, 0) from t", s)
    assert "bad value" in strict_reject(
        "SELECT ABS(format(d3,0)) FROM f", s)
    assert "bad value" in strict_reject(
        "SELECT * from f WHERE format(d2, 2) >= 0", s)
    assert strict_reject("select format(x, 2) from t", s) is None
    nc = "invalid argument NAME_CONST"
    assert nc in strict_reject("select name_const('n', now())", s)
    assert nc in strict_reject("select name_const(null, 1)", s)
    assert nc in strict_reject("select name_const(-123, -456)", s)
    assert nc in strict_reject("select name_const('c', x) from t", s)
    for ok in (
        "select name_const('myname', 14)",
        "select name_const('n', -12.34)",
        "select name_const(123, -456)",
        "select name_const(('p'), (14))",
        "select name_const('n', 1.5e0)",
        "select name_const('n', null)",
        "select name_const('n', _utf8mb4'test' collate utf8mb4_unicode_ci)",
    ):
        assert strict_reject(ok, s) is None, ok
