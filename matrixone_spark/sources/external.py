"""External data ingest / export — SURVEY §2.1 External + ExternalWrite.

Reference: the External operator (colexec/external/external.go:206, 11k LoC)
reads CSV (:616 parallel chunk offsets), JSONLINE (types.go:375), and Parquet
(:152) from local FS / S3 stages / inline, with LOAD DATA options (field and
line terminators, headers, compression auto-detect); ExternalWrite implements
SELECT ... INTO OUTFILE (colexec/externalwrite/). The reference hand-splits
CSV files into parallel chunk readers (compile/scope.go:710
buildLoadParallelRun) — Spark's DataSource framework does exactly this
natively (one task per file split), so this module is a thin option-mapping
layer, not an engine.

S3/stages: the same spark.read calls take s3a:// URIs on a real cluster —
nothing here assumes local paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: "StructType | str | None" = None,
    header: bool = True,
    field_terminator: str = ",",
    line_terminator: "str | None" = None,
    enclosed_by: str = '"',
    compression: "str | None" = None,
) -> DataFrame:
    """LOAD DATA ... FIELDS TERMINATED BY ... ENCLOSED BY ... parity
    (external.go CSV path; options map 1:1 to Spark CSV reader options)."""
    reader = (
        spark.read.option("header", header)
        .option("sep", field_terminator)
        .option("quote", enclosed_by)
        .option("mode", "PERMISSIVE")  # MySQL LOAD DATA is permissive
    )
    if line_terminator:
        reader = reader.option("lineSep", line_terminator)
    if compression:
        reader = reader.option("compression", compression)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: "StructType | str | None" = None
) -> DataFrame:
    """JSONLINE external table (external/types.go:375) → spark.read.json
    (one JSON object per line; parse_jsonl_file TVF parity)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet external table (external.go:152)."""
    return spark.read.parquet(path)


def write_outfile(
    df: DataFrame,
    path: str,
    fmt: str = "csv",
    header: bool = True,
    field_terminator: str = ",",
    mode: str = "overwrite",
    partition_by: "list[str] | None" = None,
) -> None:
    """SELECT ... INTO OUTFILE parity (colexec/externalwrite/).

    At 100 TB: partition_by routes output into partition directories
    (partition-pruned reads downstream); writes are task-parallel (one file
    per task — coalesce upstream if a single file is required)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", header).option("sep", field_terminator).csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def read_connector(
    spark: SparkSession, kind: str, options: "dict[str, str] | None" = None
) -> DataFrame:
    """Connector scans (reference MongoScan pkg/sql/colexec/mongodbscan/,
    Iceberg table scans pkg/datasync/ — SURVEY §2.1).

    Spark-first mapping: both are DataSource V2 formats —
    ``spark.read.format("mongodb")`` (mongo-spark-connector) and
    ``spark.read.format("iceberg")`` / catalog tables
    (iceberg-spark-runtime). The connector JARs are not present in this
    container, so this raises a clear error naming the package to add; on
    a real cluster the happy path is exactly the builder below.
    """
    options = options or {}
    jars = {
        "mongodb": "org.mongodb.spark:mongo-spark-connector_2.13",
        "iceberg": "org.apache.iceberg:iceberg-spark-runtime-3.5_2.13",
    }
    if kind not in jars:
        raise ValueError(f"unknown connector {kind!r} (supported: {sorted(jars)})")
    reader = spark.read.format(kind)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # connector jar absent in this container
        raise NotImplementedError(
            f"{kind} connector requires --packages {jars[kind]} on the cluster; "
            f"underlying error: {type(e).__name__}"
        ) from e
