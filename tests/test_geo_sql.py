"""SQL-registered geo surface (functions/geo_sql.py) + MySQL literal
re-encoding in the dialect (LIKE escapes, trailing escape, byte LENGTH).

Reference: pkg/sql/plan/function/func_geo*.go st_* registrations;
test/distributed/cases/geo/*.sql and operator/like_operator.sql are the
behavioral sources."""

from __future__ import annotations

import pytest

from matrixone_spark.mysql_dialect import translate


def _one(spark, sql):
    return spark.sql(translate(sql)).collect()[0][0]


def test_geomfromtext_astext_roundtrip(spark):
    assert _one(spark, "select st_astext(st_geomfromtext('  POINT(1.5 -2.25) '))") == (
        "POINT(1.5 -2.25)"
    )
    assert _one(spark, "select st_astext(st_geomfromtext('LINESTRING(0 0,1 1,2 3)'))") == (
        "LINESTRING(0 0,1 1,2 3)"
    )


def test_srid_preserved_and_set(spark):
    assert _one(spark, "select st_srid(st_geomfromtext('POINT(1 2)', 4326))") == 4326
    assert _one(spark, "select st_srid(st_geomfromtext('POINT(1 2)'))") == 0
    # SRID survives geometry->geometry ops (geo_srid.sql)
    assert _one(
        spark,
        "select st_srid(st_centroid(st_geomfromtext('POLYGON((0 0,2 0,2 2,0 2,0 0))', 4326)))",
    ) == 4326


def test_wkb_roundtrip(spark):
    assert _one(
        spark,
        "select st_astext(st_geomfromwkb(st_aswkb(st_geomfromtext('POINT(1 2)'))))",
    ) == "POINT(1 2)"


def test_cast_as_geometry(spark):
    assert _one(spark, "select st_astext(cast('POINT(7 8)' as geometry))") == "POINT(7 8)"
    assert _one(spark, "select st_astext(cast('NOT A GEOMETRY' as geometry))") is None


def test_predicates_and_measures(spark):
    assert _one(
        spark,
        "select st_contains(st_geomfromtext('POLYGON((0 0,4 0,4 4,0 4,0 0))'),"
        " st_geomfromtext('POINT(2 2)'))",
    ) is True
    assert _one(
        spark,
        "select st_area(st_geomfromtext('POLYGON((0 0,4 0,4 4,0 4,0 0))'))",
    ) == pytest.approx(16.0)
    assert _one(
        spark,
        "select st_distance(st_geomfromtext('POINT(0 0)'), st_geomfromtext('POINT(3 4)'))",
    ) == pytest.approx(5.0)


def test_distance_sphere(spark):
    # one degree of longitude at the equator (IUGG mean radius)
    v = _one(
        spark,
        "select st_distance_sphere(st_geomfromtext('POINT(0 0)'),"
        " st_geomfromtext('POINT(1 0)'))",
    )
    assert v == pytest.approx(111195.0, rel=1e-3)


def test_geohash_family(spark):
    gh = _one(spark, "select st_geohash(-5.603, 42.605, 5)")
    assert isinstance(gh, str) and len(gh) == 5
    lon = _one(spark, f"select st_longfromgeohash('{gh}')")
    lat = _one(spark, f"select st_latfromgeohash('{gh}')")
    assert lon == pytest.approx(-5.603, abs=0.1)
    assert lat == pytest.approx(42.605, abs=0.1)


def test_line_accessors(spark):
    assert _one(
        spark, "select st_astext(st_startpoint(st_geomfromtext('LINESTRING(7 8,9 10)')))"
    ) == "POINT(7 8)"
    assert _one(
        spark, "select st_numpoints(st_geomfromtext('LINESTRING(0 0,1 1,2 2)'))"
    ) == 3
    assert _one(
        spark, "select st_isclosed(st_geomfromtext('LINESTRING(0 0,1 0,0 0)'))"
    ) is True


def test_swapxy_and_makeenvelope(spark):
    assert _one(
        spark, "select st_astext(st_swapxy(st_geomfromtext('LINESTRING(1 2,3 4)')))"
    ) == "LINESTRING(2 1,4 3)"
    assert _one(
        spark, "select st_astext(st_makeenvelope(0, 0, 2, 3))"
    ) == "POLYGON((0 0,2 0,2 3,0 3,0 0))"


# ---- MySQL literal re-encoding through translate() ------------------------


def test_like_escape_literals(spark):
    # MySQL keeps the backslash in \_ (LIKE escape); Spark's parser would
    # otherwise eat it and '%\_%' would match ANY character
    sql = translate(r"select 'x_y' like '%\_%' as a, 'xay' like '%\_%' as b")
    row = spark.sql(sql).collect()[0]
    assert (row.a, row.b) == (True, False)


def test_like_trailing_escape(spark):
    # MySQL: a trailing unpaired escape matches a literal backslash
    sql = translate(r"select 'a\\' like '%\\' as a, 'ab' like '%\\' as b")
    row = spark.sql(sql).collect()[0]
    assert (row.a, row.b) == (True, False)


def test_length_is_bytes(spark):
    sql = translate("select length('中文') as b, char_length('中文') as c")
    row = spark.sql(sql).collect()[0]
    assert (row.b, row.c) == (6, 2)
