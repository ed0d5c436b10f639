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
