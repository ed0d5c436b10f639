"""Structured Streaming over the events table.

Reference parity: the reference has no streaming dataflow engine — its
streaming-ish surface is CDC tailing an append log into a sink with resumable
watermarks (pkg/cdc/, reader_v2_*.go; SURVEY §2.11). The Spark-native
analogue: readStream over the append-only events source → windowed
aggregation with event-time watermark → sink. Here the sink is an in-memory
table and the trigger is availableNow, so the same entry point serves the
batch driver contract; swap sink/trigger for a real deployment
(kafka/delta + processingTime).

Correctness: complete-mode aggregation over a bounded source must equal the
batch computation — that equality IS the oracle gate (streaming query result
vs plain SQL over the same parquet).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the batch-read schema
    (nanos→us fixup included via the same catalog conversion)."""
    from matrixone_spark.catalog import Catalog, _fix_nanos_timestamps

    import os

    cat = Catalog(spark, sf_dir)
    path = cat.path("events")
    batch_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(batch_schema).format("parquet")
    if os.path.isfile(path):
        # file-source streams need a directory: stream the parent dir with a
        # glob pinned to this table's file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return _fix_nanos_timestamps(reader.load(path))


def run_streaming_aggregate(
    spark: SparkSession,
    sf_dir: str,
    agg_builder,
    watermark: "tuple[str, str] | None" = ("ts", "1 hour"),
) -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) and return
    the final result as a batch DataFrame."""
    stream = _events_stream(spark, sf_dir)
    if watermark:
        stream = stream.withWatermark(*watermark)
    agg = agg_builder(stream)
    name = f"stream_result_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def tumbling_event_counts(stream: DataFrame) -> DataFrame:
    """Per-hour, per-type event counts + exact value sum (decimal for
    hash-stability, as everywhere)."""
    return (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("_wstart"), "event_type", "n", "total_value")
    )


def sliding_user_activity(stream: DataFrame) -> DataFrame:
    """Sliding 2h/1h distinct-ish activity per window (approx_count_distinct
    is the streaming-safe distinct; exact distinct isn't incremental)."""
    return (
        stream.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(F.col("w.start").alias("_wstart"), "n_events", "approx_users")
    )


def run_cdc_sink(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    checkpoint: str,
    transform=None,
) -> None:
    """CDC-style sink: stream the append-only events source into a parquet
    target via foreachBatch — the Spark analogue of the reference's CDC
    pipeline (pkg/cdc/sinker.go:60 sinks tailed changes into MySQL with
    resumable watermarks; here the checkpoint is the resume point).

    foreachBatch gives per-micro-batch batch-DataFrame semantics, so the same
    sink code could MERGE into anything (JDBC, Delta); parquet append here.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        out.write.mode("append").parquet(target_path)

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def session_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native streaming session windows (F.session_window) — the streaming
    counterpart of operators/timewindow.sessionize."""
    return (
        stream.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
