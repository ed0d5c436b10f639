"""Golden + property gates for the clean-room geometry kernel.

Goldens are transcribed from the reference BVT suite
(test/distributed/cases/geo/*.sql|.result) — the same corpus the geofull
batteries embed; this file additionally runs structural property checks
(overlay area identities, hull idempotence/containment) over randomized
inputs that no golden covers.
"""

from __future__ import annotations

import math
import random

import pytest

from matrixone_spark.functions import geomlib as GL

P = GL.parse_wkt
R = GL.render_wkt


# --- WKT/WKB io -------------------------------------------------------------

ROUNDTRIP = [
    "POINT(1 2)",
    "LINESTRING(0 0,1 1,2 3)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0))",
    "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,2 4,4 4,4 2,2 2))",
    "MULTIPOINT(1 1,2 2)",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((2 2,3 2,3 3,2 2)))",
    "GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0,1 1))",
    "POINT EMPTY",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUNDTRIP)
def test_wkt_roundtrip(wkt):
    assert R(P(wkt)) == wkt


@pytest.mark.parametrize("wkt", [w for w in ROUNDTRIP if w != "POINT EMPTY"])
def test_wkb_roundtrip(wkt):
    assert R(GL.from_wkb(GL.to_wkb(P(wkt)))) == wkt


def test_wkt_canonicalization_and_errors():
    assert R(P("POINT(1e2 -3.5e-1)")) == "POINT(100 -0.35)"
    assert R(P("MULTIPOINT((1 1),(2 2))")) == "MULTIPOINT(1 1,2 2)"
    for bad in ["NOT A GEOMETRY", "POINT(1", "POINT(NaN 1)", "CIRCLE(0 0,1)",
                "POLYGON((0 0,1 0))", "LINESTRING(0 0)"]:
        with pytest.raises(ValueError):
            P(bad)


# --- measures / accessors (geo_functions_unary.result goldens) --------------

def test_unary_goldens():
    assert GL.area(P("POLYGON((0 0,20 0,20 20,0 20,0 0),(5 5,15 5,15 15,5 15,5 5))")) == 300.0
    assert GL.area(P("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((2 2,4 2,4 4,2 4,2 2)))")) == 5.0
    assert GL.length(P("MULTILINESTRING((0 0,0 1),(0 0,1 0))")) == 2.0
    assert R(GL.centroid(P("POLYGON((0 0,2 0,2 2,0 2,0 0))"))) == "POINT(1 1)"
    assert R(GL.envelope(P("LINESTRING(1 2,3 4,0 5)"))) == "POLYGON((0 2,3 2,3 5,0 5,0 2))"
    assert R(GL.boundary(P("POLYGON((0 0,4 0,4 4,0 4,0 0))"))) == \
        "MULTILINESTRING((0 0,4 0,4 4,0 4,0 0))"
    assert R(GL.point_on_surface(P("POLYGON((0 0,4 0,4 4,0 4,0 0))"))) == "POINT(2 2)"
    assert R(GL.exterior_ring(P("POLYGON((0 0,4 0,4 4,0 4,0 0))"))) == \
        "LINESTRING(0 0,4 0,4 4,0 4,0 0)"
    assert GL.num_interior_rings(
        P("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))")) == 1
    assert R(GL.geometry_n(P("MULTIPOINT(1 1,2 2,3 3)"), 2)) == "POINT(2 2)"
    with pytest.raises(ValueError):
        GL.area(P("POINT(1 1)"))
    with pytest.raises(ValueError):
        GL.centroid(P("MULTIPOINT(0 0,2 0)"))


# --- relations (geo_functions_binary.result goldens) ------------------------

def test_relation_goldens():
    sq4 = P("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert GL.distance(P("POINT(0 0)"), P("LINESTRING(1 0,1 1)")) == 1.0
    assert GL.distance(P("POLYGON((0 0,2 0,2 2,0 2,0 0))"),
                       P("POLYGON((5 0,7 0,7 2,5 2,5 0))")) == 3.0
    assert GL.distance(P("POINT(5 5)"), P("POLYGON((0 0,10 0,10 10,0 10,0 0))")) == 0.0
    assert GL.contains(sq4, P("POINT(2 2)"))
    assert not GL.contains(sq4, P("POINT(9 9)"))
    assert GL.covers(sq4, P("POINT(0 2)"))          # boundary: covers yes
    assert not GL.contains(sq4, P("POINT(0 2)"))    # ... contains no (OGC)
    assert GL.touches(P("LINESTRING(0 0,2 0)"), P("LINESTRING(2 0,4 0)"))
    assert GL.crosses(P("LINESTRING(-1 1,3 1)"), P("POLYGON((0 0,2 0,2 2,0 2,0 0))"))
    assert GL.overlaps(P("POLYGON((0 0,2 0,2 2,0 2,0 0))"),
                       P("POLYGON((1 1,3 1,3 3,1 3,1 1))"))
    assert GL.overlaps(P("LINESTRING(0 0,2 0)"), P("LINESTRING(1 0,3 0)"))
    assert GL.equals(P("POLYGON((0 0,2 0,2 2,0 2,0 0))"),
                     P("POLYGON((2 0,2 2,0 2,0 0,2 0))"))


# --- overlay (geo_overlay.result goldens + area identities) -----------------

def test_overlay_goldens():
    A = P("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    B = P("POLYGON((2 2,6 2,6 6,2 6,2 2))")
    assert GL.area(GL.overlay(A, B, "intersection")) == 4.0
    assert GL.area(GL.overlay(A, B, "union")) == 28.0
    assert GL.area(GL.overlay(A, B, "difference")) == 12.0
    assert GL.area(GL.overlay(A, B, "symdifference")) == 24.0
    hole = GL.overlay(P("POLYGON((0 0,10 0,10 10,0 10,0 0))"),
                      P("POLYGON((3 3,7 3,7 7,3 7,3 3))"), "difference")
    assert GL.area(hole) == 84.0
    assert len(hole[1]) == 2  # polygon with an interior ring
    assert GL.area(GL.overlay(A, P("POLYGON((4 0,8 0,8 4,4 4,4 0))"), "union")) == 32.0
    with pytest.raises(ValueError):
        GL.overlay(P("POINT(0 0)"), A, "union")


def test_overlay_area_identities_random():
    random.seed(7)

    def poly(cx, cy, r, n=6):
        angs = sorted(random.uniform(0, 2 * math.pi) for _ in range(n))
        pts = [(round(cx + r * math.cos(a), 3), round(cy + r * math.sin(a), 3))
               for a in angs]
        return ("POLYGON", [pts + [pts[0]]])

    for _ in range(25):
        A = poly(random.uniform(0, 10), random.uniform(0, 10), random.uniform(1, 5))
        B = poly(random.uniform(0, 10), random.uniform(0, 10), random.uniform(1, 5))
        aA, aB = GL.area(A), GL.area(B)
        u = GL.area(GL.overlay(A, B, "union"))
        x = GL.area(GL.overlay(A, B, "intersection"))
        d = GL.area(GL.overlay(A, B, "difference"))
        s = GL.area(GL.overlay(A, B, "symdifference"))
        assert abs(aA + aB - u - x) < 1e-6
        assert abs(d - (aA - x)) < 1e-6
        assert abs(s - (u - x)) < 1e-6


# --- buffer (geo_buffer.result tolerance goldens) ---------------------------

def test_buffer_goldens():
    assert 12.4 <= GL.area(GL.buffer(P("POINT(0 0)"), 2)) <= 12.6
    assert 12.55 <= GL.area(GL.buffer(P("POINT(0 0)"), 2, 32)) <= 12.57
    assert 23.0 <= GL.area(GL.buffer(P("LINESTRING(0 0, 10 0)"), 1)) <= 23.2
    assert 142.9 <= GL.area(
        GL.buffer(P("POLYGON((0 0,10 0,10 10,0 10,0 0))"), 1)) <= 143.3
    assert GL.buffer(P("POINT(0 0)"), 1)[0] == "POLYGON"
    assert R(GL.buffer(P("POINT(3 4)"), 0)) == "POINT(3 4)"
    with pytest.raises(ValueError):
        GL.buffer(P("POINT(0 0)"), -1)


# --- validity / simplicity (geo_validity.result goldens) --------------------

def test_validity_goldens():
    assert GL.is_simple(P("LINESTRING(0 0,2 0,1 1,0 0)"))
    assert not GL.is_simple(P("LINESTRING(0 0,2 2,0 2,2 0)"))
    assert not GL.is_simple(P("LINESTRING(0 0,1 0,0 0)"))
    assert GL.is_ring(P("LINESTRING(0 0,2 0,1 1,0 0)"))
    assert not GL.is_ring(P("LINESTRING(0 0,1 0,2 0)"))
    with pytest.raises(ValueError):
        GL.is_ring(P("POINT(1 2)"))
    assert GL.is_valid(P("POLYGON((0 0,4 0,4 4,0 4,0 0))"))
    assert not GL.is_valid(P("POLYGON((0 0,4 4,4 0,0 4,0 0))"))
    assert GL.is_valid(P("POLYGON((0 0,6 0,6 6,0 6,0 0),(1 1,2 1,2 2,1 2,1 1))"))
    assert not GL.is_valid(P("POLYGON((0 0,6 0,6 6,0 6,0 0),(0 1,2 1,2 2,0 2,0 1))"))
    assert GL.validate(P("POLYGON((0 0,4 4,4 0,0 4,0 0))")) is None


# --- constructive (geo_construct.result goldens) ----------------------------

def test_construct_goldens():
    assert R(GL.convex_hull(P("MULTIPOINT(0 0, 4 0, 4 4, 0 4, 2 2)"))) == \
        "POLYGON((0 0,4 0,4 4,0 4,0 0))"
    assert R(GL.convex_hull(P("MULTIPOINT(0 0, 1 1, 2 2)"))) == "LINESTRING(0 0,2 2)"
    assert R(GL.convex_hull(P("MULTIPOINT(5 5, 5 5)"))) == "POINT(5 5)"
    assert R(GL.simplify(P("LINESTRING(0 0, 5 0.0001, 10 0)"), 0.001)) == \
        "LINESTRING(0 0,10 0)"
    assert R(GL.simplify(P("LINESTRING(0 0, 5 5, 10 0)"), 0.001)) == \
        "LINESTRING(0 0,5 5,10 0)"
    assert R(GL.collect(P("POINT(0 0)"), P("LINESTRING(0 0, 1 1)"))) == \
        "GEOMETRYCOLLECTION(POINT(0 0),LINESTRING(0 0,1 1))"


def test_hull_idempotent_and_containing():
    random.seed(11)
    for _ in range(15):
        pts = [(round(random.uniform(0, 10), 2), round(random.uniform(0, 10), 2))
               for _ in range(12)]
        h = GL.convex_hull(("MULTIPOINT", pts))
        assert R(GL.convex_hull(h)) == R(h)
        if h[0] == "POLYGON":
            for p in pts:
                assert GL._pt_loc(h[1], p[0], p[1]) != 0


# --- lineref / discrete (geo_lineref / geo_discrete goldens) ----------------

def test_lineref_goldens():
    line = P("LINESTRING(0 0, 10 0)")
    bent = P("LINESTRING(0 0, 10 0, 10 10)")
    assert R(GL.line_interpolate_point(line, 0.5)) == "POINT(5 0)"
    assert R(GL.line_interpolate_point(bent, 0.75)) == "POINT(10 5)"
    assert R(GL.line_interpolate_points(line, 0.25)) == "MULTIPOINT(2.5 0,5 0,7.5 0,10 0)"
    assert R(GL.line_interpolate_points(line, 1.0)) == "POINT(10 0)"
    assert R(GL.point_at_distance(bent, 15)) == "POINT(10 5)"
    with pytest.raises(ValueError):
        GL.point_at_distance(line, 99)
    with pytest.raises(ValueError):
        GL.line_interpolate_points(line, 0)
    with pytest.raises(ValueError):
        GL.line_interpolate_point(P("POINT(1 1)"), 0.5)


def test_discrete_goldens():
    l1, l2 = P("LINESTRING(0 0, 10 0)"), P("LINESTRING(0 1, 10 1)")
    assert GL.hausdorff(l1, l2) == 1.0
    assert GL.frechet(l1, l2) == 1.0
    assert GL.frechet(l1, P("LINESTRING(0 0, 10 5)")) == 5.0
    assert GL.hausdorff(P("MULTIPOINT(0 0, 0 3)"), P("MULTIPOINT(4 0, 4 3)")) == 4.0


# --- geojson (geo_geojson.result goldens) -----------------------------------

def test_geojson_goldens():
    assert GL.to_geojson(P("POINT(1 2)")) == '{"type":"Point","coordinates":[1,2]}'
    assert GL.to_geojson(P("POINT(1.23456 2.34567)"), 2) == \
        '{"type":"Point","coordinates":[1.23,2.35]}'
    assert GL.to_geojson(P("GEOMETRYCOLLECTION(POINT(1 1), LINESTRING(0 0, 1 1))")) == \
        ('{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":'
         '[1,1]},{"type":"LineString","coordinates":[[0,0],[1,1]]}]}')
    assert R(GL.from_geojson('{"type":"Point","coordinates":[3,4]}')) == "POINT(3 4)"
    assert R(GL.from_geojson(GL.to_geojson(P("POLYGON((0 0,4 0,4 4,0 4,0 0))")))) == \
        "POLYGON((0 0,4 0,4 4,0 4,0 0))"
    with pytest.raises(ValueError):
        GL.from_geojson('{"type":"Point"}')


def test_ewkt_srid_split():
    srid, wkt = GL.split_srid("SRID=4326;POINT(1 2)")
    assert srid == 4326 and wkt == "POINT(1 2)"
    assert GL.split_srid("POINT(1 2)") == (None, "POINT(1 2)")
