"""Geo core: WKT points + bounding boxes as pure column expressions.

Reference: ~190 st_* functions over WKB geometry (pkg/geo/,
function/func_s2h3.go; SURVEY §2.8 marks the full surface optional). This
module implements the point/bbox core that covers the common analytical
shapes (distance filters, containment joins) WITHOUT any geometry library:
WKT 'POINT(x y)' round-trips through regexp + cast, all math is plain
doubles inside codegen — so it runs at 100 TB and oracle-checks against
DuckDB with the same expressions.

Full polygon/linestring support would slot in as a Sedona-style UDF layer;
declared out of round-1 scope (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def st_point(x, y) -> Column:
    """ST_POINT(x, y) → WKT string (reference st_point, pkg/geo/)."""
    return F.concat(F.lit("POINT("), _c(x).cast("string"), F.lit(" "), _c(y).cast("string"), F.lit(")"))


def st_x(p) -> Column:
    """ST_X('POINT(x y)')."""
    return F.regexp_extract(_c(p), r"POINT\(([-0-9.eE]+) ([-0-9.eE]+)\)", 1).cast("double")


def st_y(p) -> Column:
    return F.regexp_extract(_c(p), r"POINT\(([-0-9.eE]+) ([-0-9.eE]+)\)", 2).cast("double")


def st_distance(a, b) -> Column:
    """Euclidean ST_DISTANCE between two WKT points."""
    dx = st_x(a) - st_x(b)
    dy = st_y(a) - st_y(b)
    return F.sqrt(dx * dx + dy * dy)


def st_dwithin(a, b, d: float) -> Column:
    """ST_DWITHIN: distance ≤ d (squared compare — no sqrt on the hot path)."""
    dx = st_x(a) - st_x(b)
    dy = st_y(a) - st_y(b)
    return (dx * dx + dy * dy) <= (d * d)


def mbr_contains(xmin, ymin, xmax, ymax, p) -> Column:
    """MBR containment (reference mbr* family): point inside bbox."""
    px, py = st_x(p), st_y(p)
    return (px >= _c(xmin)) & (px <= _c(xmax)) & (py >= _c(ymin)) & (py <= _c(ymax))
