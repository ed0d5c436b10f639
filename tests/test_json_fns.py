"""Unit tests for JSON mutators (MySQL semantics per the reference's
func_builtin_json.go: set=upsert, insert=only-new, replace=only-existing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixone_spark.functions import json_fns as J


def _run(spark, col):
    return spark.range(1).select(col.alias("r")).collect()[0].r


def test_json_set_insert_replace(spark):
    doc = F.lit('{"a":1,"b":{"c":2}}')
    assert _run(spark, J.json_set(doc, F.lit("$.a"), F.lit("9"))) == '{"a":9,"b":{"c":2}}'
    assert _run(spark, J.json_set(doc, F.lit("$.z"), F.lit('"new"'))) == '{"a":1,"b":{"c":2},"z":"new"}'
    assert _run(spark, J.json_set(doc, F.lit("$.b.c"), F.lit("[1,2]"))) == '{"a":1,"b":{"c":[1,2]}}'
    # insert: existing key untouched, new key added
    assert _run(spark, J.json_insert(doc, F.lit("$.a"), F.lit("9"))) == '{"a":1,"b":{"c":2}}'
    assert _run(spark, J.json_insert(doc, F.lit("$.z"), F.lit("9"))) == '{"a":1,"b":{"c":2},"z":9}'
    # replace: only existing
    assert _run(spark, J.json_replace(doc, F.lit("$.a"), F.lit("9"))) == '{"a":9,"b":{"c":2}}'
    assert _run(spark, J.json_replace(doc, F.lit("$.z"), F.lit("9"))) == '{"a":1,"b":{"c":2}}'


def test_json_remove_and_merge(spark):
    doc = F.lit('{"a":1,"b":2}')
    assert _run(spark, J.json_remove(doc, F.lit("$.b"))) == '{"a":1}'
    assert _run(spark, J.json_remove(doc, F.lit("$.zz"))) == '{"a":1,"b":2}'
    merged = J.json_merge_patch(F.lit('{"a":1,"c":3}'), F.lit('{"b":2,"c":null}'))
    assert _run(spark, merged) == '{"a":1,"b":2}'  # RFC 7396: null deletes
    bad = J.json_merge_patch(F.lit("{bad"), F.lit("{}"))
    assert _run(spark, bad) is None


def test_json_type_classifier(spark):
    from matrixone_spark.functions.json_fns import json_type
    from pyspark.sql import functions as F

    cases = {
        '{"a":1}': "OBJECT", "[1,2]": "ARRAY", '"x"': "STRING",
        "true": "BOOLEAN", "false": "BOOLEAN", "null": "NULL",
        "-42": "INTEGER", "3.25": "DOUBLE", "1e3": "DOUBLE",
    }
    df = spark.createDataFrame([(j,) for j in cases], "j string")
    got = {r.j: r.t for r in df.select("j", json_type("j").alias("t")).collect()}
    assert got == cases


def test_json_contains_mysql_semantics(spark):
    from matrixone_spark.functions.json_fns import json_contains
    from pyspark.sql import functions as F

    cases = [
        ("[1,2,3]", "1", True),          # scalar in array
        ("[1,2,3]", "[1,3]", True),      # array subset
        ("[1,2,3]", "[1,4]", False),
        ('{"a":1,"b":{"c":2}}', '{"b":{"c":2}}', True),   # nested object subset
        ('{"a":1}', '{"a":2}', False),
        ('{"a":1}', '{"a":1,"z":9}', False),              # extra key
        ("[1,2]", "1.0", True),          # numeric coercion int/float
        ("[true]", "1", False),          # bool is NOT numeric 1 (MySQL)
        ("5", "5", True),                # scalar target
        ("not json", "1", None),         # malformed -> NULL
    ]
    df = spark.createDataFrame([(t, c, e) for t, c, e in cases], "t string, c string, e boolean")
    got = df.select("t", "c", "e", json_contains("t", "c").alias("g")).collect()
    for r in got:
        assert r.g == r.e, (r.t, r.c, r.g, r.e)


def test_jq_mini_evaluator():
    from matrixone_spark.functions.json_fns import _jq_run

    doc = '{"a":{"b":[1,2,3]},"z":"s"}'
    assert _jq_run(doc, ".") == doc.replace(" ", "")
    assert _jq_run(doc, ".a.b[1]") == "2"
    assert _jq_run(doc, ".a.b | length") == "3"
    assert _jq_run(doc, ".a.b | add") == "6"
    assert _jq_run(doc, "keys") == '["a","z"]'
    assert _jq_run(doc, ".a.b[]") == "1\n2\n3"
    assert _jq_run(doc, ".missing") == "null"
    assert _jq_run(doc, ".a.b[9]") == "null"
    assert _jq_run(None, ".a") is None
    import pytest as _pytest

    for bad in (".z[0]", ".a.b | keys", "garbage", ".z | add"):
        with _pytest.raises(ValueError):
            _jq_run(doc, bad)


def test_jq_udfs_on_spark(spark):
    from matrixone_spark.functions import json_fns as J
    from pyspark.sql import functions as F

    df = spark.createDataFrame([('{"a":[1,2]}',), (None,)], "doc string")
    rows = df.select(
        J.jq("doc", F.lit(".a | add")).alias("s"),
        J.try_jq("doc", F.lit(".a.b")).alias("e"),
    ).collect()
    assert rows[0].s == "3" and rows[0].e is None  # .a.b: field access on array -> error -> NULL
    assert rows[1].s is None and rows[1].e is None
