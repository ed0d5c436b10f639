"""Geometry-core property tests (WKT parse/measure layer, functions/geo.py).

Reference: st_* surface function_id.go:1234-1363; sphere kernel
pkg/geo/geodetic.go:205 (S2 chord angle × 6371008.8).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from matrixone_spark.functions import geo as G


def vals(spark, **cols):
    return spark.range(1).select(*(c.alias(k) for k, c in cols.items())).collect()[0]


def test_wkt_roundtrip_and_types(spark):
    r = vals(
        spark,
        pt=G.st_astext(G.st_geomfromtext(F.lit("  point(1.5 -2.25) "))),
        ls_t=G.st_geometrytype(G.st_geomfromtext(F.lit("LINESTRING(0 0, 1 1)"))),
        bad_t=G.st_geometrytype(G.st_geomfromtext(F.lit("MULTIPOINT(1 1, 2 2)"))),
        garbage=G.st_geometrytype(G.st_geomfromtext(F.lit("not wkt at all"))),
    )
    assert r.pt == "POINT(1.5 -2.25)"
    assert r.ls_t == "LINESTRING"
    assert r.bad_t is None and r.garbage is None  # unsupported → NULL, not garbage


def test_polygon_shoelace_nonconvex(spark):
    # L-shaped (non-convex) hexagon: area 12, known centroid
    wkt = "POLYGON((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"
    g = G.st_geomfromtext(F.lit(wkt))
    r = vals(spark, a=G.st_area(g), c=G.st_centroid(g), n=G.st_numpoints(g),
             closed=G.st_isclosed(g))
    assert r.a == 12.0 and r.n == 7 and r.closed
    # centroid of the L: ((8*1 + 4*3)/12, (8*1+4*3)/12) = (5/3, 5/3)
    assert r.c.startswith("POINT(1.666666") and " 1.666666" in r.c


def test_ray_casting_nonconvex(spark):
    wkt = "POLYGON((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"
    g = G.st_geomfromtext(F.lit(wkt))
    cases = {  # (x, y) -> expected containment in the L-shape
        (1.0, 1.0): True, (3.0, 1.0): True, (1.0, 3.0): True,
        (3.0, 3.0): False,  # the notch
        (-0.5, 1.0): False, (5.0, 5.0): False,
    }
    for (x, y), want in cases.items():
        got = vals(spark, v=G.st_contains_point(g, F.lit(x), F.lit(y))).v
        assert got == want, (x, y, got)


def test_length_and_sphere(spark):
    g = G.st_geomfromtext(F.lit("LINESTRING(0 0, 3 4, 3 0, 0 0)"))
    r = vals(spark, ln=G.st_length(g), closed=G.st_isclosed(g))
    assert r.ln == 12.0 and r.closed
    # half-circumference: antipodal points on the equator
    d = vals(spark, d=G.st_distance_sphere(F.lit("POINT(-90 0)"), F.lit("POINT(90 0)"))).d
    assert abs(d - math.pi * G.EARTH_RADIUS_M) < 1e-3
    # out-of-range latitude → NULL (reference validates [-90, 90])
    assert vals(spark, d=G.st_distance_sphere(F.lit("POINT(0 91)"), F.lit("POINT(0 0)"))).d is None


def test_envelope_swap_makeenvelope(spark):
    g = G.st_geomfromtext(F.lit("LINESTRING(-1 5, 3 -2, 0 0)"))
    r = vals(
        spark,
        env=G.st_envelope_bounds(g),
        sw=G.st_astext(G.st_swapxy(g)),
        mk=G.st_makeenvelope(F.lit(0), F.lit(0), F.lit(2), F.lit(3)),
    )
    assert (r.env.xmin, r.env.ymin, r.env.xmax, r.env.ymax) == (-1.0, -2.0, 3.0, 5.0)
    assert r.sw == "LINESTRING(5.0 -1.0, -2.0 3.0, 0.0 0.0)"
    assert r.mk == "POLYGON((0 0, 2 0, 2 3, 0 3, 0 0))"
    # makeenvelope output re-parses to the right area
    assert vals(spark, a=G.st_area(G.st_geomfromtext(F.lit(r.mk)))).a == 6.0


def test_geohash_known_vectors_and_roundtrip(spark):
    from pyspark.sql import functions as F

    # canonical public vectors
    df = spark.createDataFrame(
        [(10.40744, 57.64911), (-5.6, 42.6), (0.0, 0.0)], "lon double, lat double"
    )
    got = df.select(G.st_geohash("lon", "lat", 11).alias("gh")).collect()
    assert got[0].gh == "u4pruydqqvj"   # Jutland, the classic example
    assert got[1].gh.startswith("ezs42")  # Wikipedia's ezs42 cell
    # decode returns the cell center; re-encoding the center gives the hash back
    r = (
        df.select(G.st_geohash("lon", "lat", 9).alias("gh"))
        .select("gh", G.st_longfromgeohash("gh").alias("clon"), G.st_latfromgeohash("gh").alias("clat"))
        .select("gh", G.st_geohash("clon", "clat", 9).alias("gh2"),
                G.st_pointfromgeohash("gh").alias("wkt"))
        .collect()
    )
    for row in r:
        assert row.gh == row.gh2
        assert row.wkt.startswith("POINT(")
    # invalid inputs -> NULL
    bad = spark.createDataFrame([(200.0, 0.0)], "lon double, lat double")
    assert bad.select(G.st_geohash("lon", "lat").alias("g")).collect()[0].g is None
    assert spark.range(1).select(G.st_latfromgeohash(F.lit("!!")).alias("v")).collect()[0].v is None


def test_mbr_covers_coveredby_overlaps(spark):
    """MySQL MBR family long tail (func_mbr.go): covers/coveredby/overlaps
    truth table over hand-laid boxes."""
    from matrixone_spark.functions import geo as G
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # (name, a box, b box)
            ("inside", (1.0, 1.0, 2.0, 2.0), (0.0, 0.0, 3.0, 3.0)),
            ("partial", (0.0, 0.0, 2.0, 2.0), (1.0, 1.0, 3.0, 3.0)),
            ("disjoint", (0.0, 0.0, 1.0, 1.0), (5.0, 5.0, 6.0, 6.0)),
            ("equal", (0.0, 0.0, 1.0, 1.0), (0.0, 0.0, 1.0, 1.0)),
            ("touch_edge", (0.0, 0.0, 1.0, 1.0), (1.0, 0.0, 2.0, 1.0)),
        ],
        "name string, a struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
        "b struct<xmin:double,ymin:double,xmax:double,ymax:double>",
    )
    rows = {
        r.name: r
        for r in df.select(
            "name",
            G.mbr_covers("a", "b").alias("covers"),
            G.mbr_coveredby("a", "b").alias("coveredby"),
            G.mbr_overlaps("a", "b").alias("overlaps"),
        ).collect()
    }
    assert rows["inside"].coveredby and not rows["inside"].covers and not rows["inside"].overlaps
    assert rows["partial"].overlaps and not rows["partial"].covers and not rows["partial"].coveredby
    assert not rows["disjoint"].overlaps and not rows["disjoint"].covers
    assert rows["equal"].covers and rows["equal"].coveredby and not rows["equal"].overlaps
    # edge touch: zero-area overlap is not an MBROverlap
    assert not rows["touch_edge"].overlaps


def test_wkb_codec_roundtrip_and_golden(spark):
    """ST_AsWKB/ST_GeomFromWKB: OGC golden bytes for POINT(1 2) plus
    roundtrips for all three geometry types and typed-constructor guards."""
    from pyspark.sql import functions as F
    from matrixone_spark.functions import geo as G

    df = spark.createDataFrame(
        [("POINT(1 2)",), ("LINESTRING(0 0, 1 1, 2 0)",),
         ("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))",)],
        "wkt string",
    )
    out = df.select(
        "wkt",
        G.st_aswkb(G.st_geomfromtext("wkt")).alias("wkb"),
        G.st_astext(G.st_geomfromwkb(G.st_aswkb(G.st_geomfromtext("wkt")))).alias("rt"),
    ).collect()
    by = {r.wkt: r for r in out}
    assert bytes(by["POINT(1 2)"].wkb).hex() == (
        "0101000000" + "000000000000f03f" + "0000000000000040"
    )
    for r in out:
        assert r.rt.replace(".0 ", " ").replace(".0)", ")").replace(".0,", ",") == r.wkt
    # typed constructors return NULL on type mismatch
    r = df.filter(F.col("wkt") == "POINT(1 2)").select(
        G.st_pointfromtext("wkt").alias("p"),
        G.st_polygonfromtext("wkt").alias("poly"),
        G.st_longitude(G.st_geomfromtext("wkt")).alias("lon"),
        G.st_latitude(G.st_geomfromtext("wkt")).alias("lat"),
        G.st_dimension(G.st_geomfromtext("wkt")).alias("dim"),
        G.st_srid(G.st_geomfromtext("wkt")).alias("srid"),
        G.st_isempty(G.st_geomfromtext("wkt")).alias("emp"),
    ).collect()[0]
    assert r.p is not None and r.poly is None
    assert (r.lon, r.lat, r.dim, r.srid, r.emp) == (1.0, 2.0, 0, 0, False)


def test_st_equals_walks(spark):
    from matrixone_spark.functions import geo as G

    df = spark.createDataFrame(
        [("LINESTRING(0 0, 1 1)", "LINESTRING(1 1, 0 0)", True),
         ("LINESTRING(0 0, 1 1)", "LINESTRING(0 0, 2 2)", False),
         ("POLYGON((0 0, 1 0, 1 1, 0 0))", "POLYGON((1 0, 1 1, 0 0, 1 0))", True),
         ("POINT(1 2)", "POINT(1 2)", True),
         ("POINT(1 2)", "LINESTRING(1 2, 1 2)", False)],
        "a string, b string, want boolean",
    )
    rows = df.select(
        G.st_equals(G.st_geomfromtext("a"), G.st_geomfromtext("b")).alias("got"),
        "want",
    ).collect()
    assert all(r.got == r.want for r in rows), rows
