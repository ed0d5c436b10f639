"""Table-function (TVF) coverage — SURVEY §2.10.

Reference dispatch: colexec/table_function/table_function.go:145-201 —
generate_series (int + datetime), unnest, generate_random_*, parse_jsonl,
load_file_chunks. Plus CROSS/OUTER APPLY lateral joins
(colexec/apply/apply.go:66, compile.go:4653).

Spark: F.sequence + explode IS generate_series; lateral = explode over a
per-row expression; posexplode gives WITH ORDINALITY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.queries import register


@register(
    "tvf_generate_series",
    oracle="""
SELECT g.n, g.n * g.n AS sq
FROM generate_series(1, 1000) g(n)
""",
    tags=("tvf",),
    doc="generate_series(start, stop) (table_function/generate_series.go) → spark.range. At 100 TB scale spark.range partitions the domain across executors.",
)
def tvf_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1, 1001).select(
        F.col("id").alias("n"), (F.col("id") * F.col("id")).alias("sq")
    )


@register(
    "tvf_generate_series_step",
    oracle="""
SELECT g.n FROM generate_series(100, 0, -7) g(n)
""",
    tags=("tvf",),
    doc="generate_series with negative step (generate_series.go step handling).",
)
def tvf_generate_series_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame([(1,)], "x int").select(
        F.explode(F.sequence(F.lit(100), F.lit(0), F.lit(-7))).alias("n")
    )


@register(
    "tvf_generate_series_ts",
    oracle="""
SELECT g.ts FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                 TIMESTAMP '2024-01-03 00:00:00',
                                 INTERVAL 6 HOUR) g(ts)
""",
    tags=("tvf",),
    doc="datetime generate_series (generate_series.go datetime mode) → sequence of timestamps + explode.",
)
def tvf_generate_series_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame([(1,)], "x int").select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-03 00:00:00").cast("timestamp"),
                F.expr("INTERVAL 6 HOURS"),
            )
        ).alias("ts")
    )


@register(
    "tvf_lateral_series",
    oracle="""
SELECT n.n_nationkey, g.i
FROM nation n, LATERAL (SELECT unnest(generate_series(0, n.n_regionkey)) AS i) g
""",
    tags=("tvf", "join"),
    doc="CROSS APPLY generate_series per row (colexec/apply/apply.go:66 lateral TVF) → explode(sequence(...)) — row count varies per input row.",
)
def tvf_lateral_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).table("nation")
    return n.select(
        "n_nationkey",
        F.explode(F.sequence(F.lit(0), F.col("n_regionkey"))).alias("i"),
    )


@register(
    "tvf_unnest_ordinality",
    oracle="""
SELECT d.doc_id, t.i AS pos, t.w AS word
FROM (SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id < 50) d,
     LATERAL (SELECT unnest(words) AS w,
                     unnest(generate_series(1, len(words))) AS i) t
""",
    tags=("tvf", "text"),
    doc="unnest WITH ORDINALITY (unnest.go) → posexplode (1-based to match MySQL/DuckDB).",
)
def tvf_unnest_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 50)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    )


@register(
    "tvf_outer_apply",
    oracle="""
SELECT r.r_regionkey, g.i
FROM region r LEFT JOIN
     (SELECT r2.r_regionkey AS k, u.i
      FROM region r2, LATERAL (SELECT unnest(generate_series(1, r2.r_regionkey - 2)) AS i) u
      WHERE r2.r_regionkey >= 3) g
  ON r.r_regionkey = g.k
""",
    tags=("tvf", "join"),
    doc="OUTER APPLY (compile.go:4653 Node_OUTERAPPLY): rows with empty TVF output survive with NULL → explode_outer.",
)
def tvf_outer_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = Catalog(spark, sf_dir).table("region")
    # sequence(1, k-2) is empty/invalid for k<3 → NULL array → explode_outer keeps the row
    seq = F.when(F.col("r_regionkey") >= 3, F.sequence(F.lit(1), F.col("r_regionkey") - 2))
    return r.select("r_regionkey", F.explode_outer(seq).alias("i"))


@register(
    "tvf_random_deterministic",
    oracle=None,  # random generators can't hash-match; shape gate only
    tags=("tvf", "approx"),
    doc="generate_random_int64/float64 (table_function/genrandom.go) → spark.range + rand/randn with fixed seed; rows-only gate (values engine-specific).",
)
def tvf_random_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1000).select(
        F.col("id"),
        (F.rand(seed=42) * 100).alias("r_uniform"),
        F.randn(seed=42).alias("r_normal"),
    )
