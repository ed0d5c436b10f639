"""Polygon-polygon predicate tests: known cases (overlap, nesting, disjoint,
touch, collinear-edge touch, point×polygon) plus a randomized sweep checked
against an independent pure-Python reference implementation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from matrixone_spark.functions import geo as G


def _eval(spark, pairs: "list[tuple[str, str]]"):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "id long, wa string, wb string"
    )
    ga, gb = G.st_geomfromtext("wa"), G.st_geomfromtext("wb")
    rows = (
        df.select(
            "id",
            G.st_intersects(ga, gb).alias("inter"),
            G.st_contains(ga, gb).alias("cont"),
            G.st_within(ga, gb).alias("within"),
            G.st_disjoint(ga, gb).alias("disj"),
        )
        .orderBy("id")
        .collect()
    )
    return rows


def _rect(x0, y0, x1, y1):
    return (
        f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
    )


def test_known_cases(spark):
    pairs = [
        (_rect(0, 0, 4, 4), _rect(2, 2, 6, 6)),      # 0 partial overlap
        (_rect(0, 0, 10, 10), _rect(2, 2, 3, 3)),    # 1 b nested in a
        (_rect(0, 0, 1, 1), _rect(5, 5, 6, 6)),      # 2 disjoint
        (_rect(0, 0, 2, 2), _rect(2, 0, 4, 2)),      # 3 share an edge (touch)
        (_rect(0, 0, 2, 2), _rect(2, 2, 4, 4)),      # 4 share one corner point
        (_rect(0, 0, 8, 8), "POLYGON((3 1, 7 3, 3 5, 3 1))"),  # 5 triangle in rect
        ("POINT(1 1)", _rect(0, 0, 4, 4)),           # 6 point inside polygon
        ("POINT(9 9)", _rect(0, 0, 4, 4)),           # 7 point outside polygon
    ]
    r = _eval(spark, pairs)
    assert [x.inter for x in r] == [True, True, False, True, True, True, True, False]
    assert [x.cont for x in r] == [False, True, False, False, False, True, False, False]
    # within: only the interior point (case 6) is within its polygon
    assert [x.within for x in r] == [False, False, False, False, False, False, True, False]
    assert [x.disj for x in r] == [not x.inter for x in r]
    # symmetric: nested-in reversed
    r2 = _eval(spark, [(b, a) for a, b in pairs[:2]])
    assert [x.within for x in r2] == [False, True]


# --- independent reference implementation (floats, same conventions) --------


def _ref_segs(pts):
    return list(zip(pts, pts[1:]))


def _ref_cross(o, p, q):
    return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])


def _ref_seg_int(s, t):
    (a, b), (c, d) = s, t
    d1 = _ref_cross(c, d, a)
    d2 = _ref_cross(c, d, b)
    d3 = _ref_cross(a, b, c)
    d4 = _ref_cross(a, b, d)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0:
        return True

    def on(dv, p, seg):
        (sa, sb) = seg
        return dv == 0 and min(sa[0], sb[0]) <= p[0] <= max(sa[0], sb[0]) and min(sa[1], sb[1]) <= p[1] <= max(sa[1], sb[1])

    return on(d1, a, t) or on(d2, b, t) or on(d3, c, s) or on(d4, d, s)


def _ref_pip(pts, p):
    cnt = 0
    for (ax, ay), (bx, by) in _ref_segs(pts):
        if (ay > p[1]) != (by > p[1]) and p[0] < (bx - ax) * (p[1] - ay) / (by - ay) + ax:
            cnt += 1
    return cnt % 2 == 1


def _ref_intersects(pa, pb):
    if any(_ref_seg_int(s, t) for s in _ref_segs(pa) for t in _ref_segs(pb)):
        return True
    return _ref_pip(pb, pa[0]) or _ref_pip(pa, pb[0])


def _ref_contains(pa, pb):
    return all(_ref_pip(pa, p) for p in pb) and not any(
        _ref_seg_int(s, t) for s in _ref_segs(pa) for t in _ref_segs(pb)
    )


def test_randomized_vs_reference(spark):
    rng = random.Random(7)
    pairs, expect = [], []
    for _ in range(60):
        # random rect with integer coords; random diamond with .5-offset center
        x0, y0 = rng.randint(0, 6), rng.randint(0, 6)
        x1, y1 = x0 + rng.randint(1, 5), y0 + rng.randint(1, 5)
        cx, cy = rng.randint(0, 6) + 0.5, rng.randint(0, 6) + 0.5
        r = rng.randint(1, 4)
        ra = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        db = [(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r), (cx + r, cy)]
        pairs.append((_rect(x0, y0, x1, y1),
                      "POLYGON((" + ", ".join(f"{x} {y}" for x, y in db) + "))"))
        expect.append((_ref_intersects(ra, db), _ref_contains(ra, db), _ref_contains(db, ra)))
    rows = _eval(spark, pairs)
    for row, (ei, ec, ew) in zip(rows, expect):
        assert row.inter == ei, f"pair {row.id}: intersects {row.inter} != ref {ei}"
        assert row.cont == ec, f"pair {row.id}: contains {row.cont} != ref {ec}"
        assert row.within == ew, f"pair {row.id}: within {row.within} != ref {ew}"


def test_polygon_query_matches_oracle(spark):
    from matrixone_spark.queries import load_all
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, load_all()["geo_polygon_predicates"])
