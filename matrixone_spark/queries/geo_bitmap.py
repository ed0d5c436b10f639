"""Geo point/bbox core + bitmap-style distinct rollup.

- Geo (functions/geo.py): WKT points derived deterministically from supplier
  coordinates; distance/containment as pure expressions, oracle-matched.
- Bitmap aggregates (reference list_agg.go:583 bitmap_construct_agg /
  bitmap_or_agg + scalar bitmap_count/bit_position/bucket_number over
  roaring bitmaps, cgo/croaring.c): the reference's documented use-case is
  two-level exact distinct counting — bucket values, build per-bucket
  bitmaps, OR them, count. Reproduced with the same bucket structure
  (bucket = v >> 15) and exact distinct semantics; roaring is the
  serialization, not the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.functions import geo as G
from matrixone_spark.queries import register


@register(
    "geo_point_battery",
    oracle="""
WITH pts AS (
  SELECT s_suppkey,
         CONCAT('POINT(', CAST(CAST(s_suppkey % 100 AS DOUBLE) AS VARCHAR), ' ',
                CAST(CAST(s_suppkey % 37 AS DOUBLE) AS VARCHAR), ')') AS wkt
  FROM supplier)
SELECT s_suppkey, wkt,
       CAST(regexp_extract(wkt, 'POINT\\(([-0-9.eE]+) ([-0-9.eE]+)\\)', 1) AS DOUBLE) AS x,
       CAST(regexp_extract(wkt, 'POINT\\(([-0-9.eE]+) ([-0-9.eE]+)\\)', 2) AS DOUBLE) AS y,
       ROUND(sqrt(POW(CAST(s_suppkey % 100 AS DOUBLE) - 50.0, 2)
                + POW(CAST(s_suppkey % 37 AS DOUBLE) - 18.0, 2)), 9) AS dist_center,
       CASE WHEN CAST(s_suppkey % 100 AS DOUBLE) BETWEEN 20 AND 60
             AND CAST(s_suppkey % 37 AS DOUBLE) BETWEEN 10 AND 25 THEN 1 ELSE 0 END AS in_bbox
FROM pts
""",
    tags=("geo",),
    doc="st_point/st_x/st_y/st_distance/mbr_contains point core (pkg/geo/ st_* family subset as pure expressions; full polygon surface deferred per SURVEY §2.12).",
)
def geo_point_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = Catalog(spark, sf_dir).table("supplier")
    pts = s.select(
        "s_suppkey",
        G.st_point((F.col("s_suppkey") % 100).cast("double"), (F.col("s_suppkey") % 37).cast("double")).alias("wkt"),
    )
    center = G.st_point(F.lit(50.0), F.lit(18.0))
    return pts.select(
        "s_suppkey",
        "wkt",
        G.st_x("wkt").alias("x"),
        G.st_y("wkt").alias("y"),
        F.round(G.st_distance(F.col("wkt"), center), 9).alias("dist_center"),
        G.mbr_contains(F.lit(20.0), F.lit(10.0), F.lit(60.0), F.lit(25.0), F.col("wkt"))
        .cast("int")
        .alias("in_bbox"),
    )


@register(
    "geo_distance_join",
    oracle="""
WITH pts AS (
  SELECT s_suppkey, CAST(s_suppkey % 100 AS DOUBLE) AS x, CAST(s_suppkey % 37 AS DOUBLE) AS y
  FROM supplier)
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       ROUND(sqrt(POW(a.x - b.x, 2) + POW(a.y - b.y, 2)), 9) AS dist
FROM pts a JOIN pts b ON a.s_suppkey < b.s_suppkey
WHERE POW(a.x - b.x, 2) + POW(a.y - b.y, 2) <= 9.0
""",
    tags=("geo", "join"),
    doc="ST_DWITHIN self-join (distance ≤ 3): the spatial-join shape; squared-distance predicate avoids sqrt on the join condition. At 100 TB this would go through a grid-cell bucket join first (same pattern as SimHash prefix blocking).",
)
def geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = Catalog(spark, sf_dir).table("supplier")
    pts = s.select(
        "s_suppkey",
        G.st_point((F.col("s_suppkey") % 100).cast("double"), (F.col("s_suppkey") % 37).cast("double")).alias("wkt"),
    )
    a = pts.select(F.col("s_suppkey").alias("id_a"), F.col("wkt").alias("wa"))
    b = pts.select(F.col("s_suppkey").alias("id_b"), F.col("wkt").alias("wb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(G.st_dwithin(F.col("wa"), F.col("wb"), 3.0))
        .select("id_a", "id_b", F.round(G.st_distance("wa", "wb"), 9).alias("dist"))
    )


@register(
    "bitmap_distinct_rollup",
    oracle="""
WITH bucketed AS (
  SELECT l_returnflag, l_partkey // 32768 AS bucket_number, l_partkey AS v
  FROM lineitem),
per_bucket AS (
  SELECT l_returnflag, bucket_number, COUNT(DISTINCT v) AS bitmap_count
  FROM bucketed GROUP BY l_returnflag, bucket_number)
SELECT l_returnflag,
       CAST(SUM(bitmap_count) AS BIGINT) AS exact_distinct,
       COUNT(*) AS n_buckets
FROM per_bucket GROUP BY l_returnflag
""",
    tags=("agg", "bitmap"),
    doc="bitmap_construct_agg/bitmap_or_agg/bitmap_count/bucket_number semantics (list_agg.go:583-606, croaring): two-level exact distinct count — bucket by v>>15 (32768 = reference bucket width), per-bucket distinct, sum. Roaring is the reference's serialization; the distributed semantics are identical.",
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Catalog(spark, sf_dir).table("lineitem")
    bucketed = l.select(
        "l_returnflag",
        (F.col("l_partkey") / 32768).cast("bigint").alias("bucket_number"),
        F.col("l_partkey").alias("v"),
    )
    per_bucket = bucketed.groupBy("l_returnflag", "bucket_number").agg(
        F.countDistinct("v").alias("bitmap_count")
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum("bitmap_count").cast("bigint").alias("exact_distinct"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
