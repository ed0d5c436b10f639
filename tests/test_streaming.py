"""Streaming gates beyond the oracle: streaming session windows must equal
the batch gaps-and-islands sessionizer on a bounded source."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.operators.timewindow import sessionize
from matrixone_spark.queries import load_all
from tests.conftest import SF_DIR


def test_stream_sessions_equal_batch(spark):
    streaming = (
        load_all()["stream_session_windows"].fn(spark, SF_DIR)
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
        .collect()
    )
    e = Catalog(spark, SF_DIR).table("events").filter(F.col("user_id") <= 10)
    batch = (
        sessionize(e, "ts", 1800, ["user_id"])
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
        .collect()
    )
    assert [(r.user_id, r.session_start, r.n_events) for r in streaming] == [
        (r.user_id, r.session_start, r.n_events) for r in batch
    ]


def test_cdc_sink_foreachbatch_exactly_once(spark):
    """CDC sink: all source rows land once; a re-run with the same checkpoint
    is a no-op (resume semantics, pkg/cdc reader watermark parity)."""
    import shutil

    from pyspark.sql import functions as F

    from matrixone_spark.streaming.events import run_cdc_sink

    tmp = "/root/repo/.tmp_test_cdc"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        run_cdc_sink(
            spark, SF_DIR, f"{tmp}/out", f"{tmp}/ckpt",
            transform=lambda df: df.filter(F.col("event_type") == "purchase"),
        )
        src_n = (
            Catalog(spark, SF_DIR).table("events")
            .filter(F.col("event_type") == "purchase").count()
        )
        got_n = spark.read.parquet(f"{tmp}/out").count()
        assert got_n == src_n
        # resume: no new files → no duplicate rows
        run_cdc_sink(
            spark, SF_DIR, f"{tmp}/out", f"{tmp}/ckpt",
            transform=lambda df: df.filter(F.col("event_type") == "purchase"),
        )
        assert spark.read.parquet(f"{tmp}/out").count() == src_n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_multimodal_decoder_stub_raises(spark):
    from matrixone_spark.operators.multimodal import real_decoder

    import pytest

    with pytest.raises(NotImplementedError):
        real_decoder(b"bytes", "image/png")


def test_stateful_state_survives_micro_batches(spark, tmp_path):
    """applyInPandasWithState must accumulate across micro-batches: split the
    events into two files, force one file per trigger, and check the
    converged totals equal the batch aggregate over everything."""
    import pandas as pd
    from pyspark.sql import functions as F
    from matrixone_spark.catalog import Catalog
    from matrixone_spark.streaming import events as E

    src = Catalog(spark, "/root/testdata/sf0.001").table("events").select("user_id", "value", "ts")
    half = src.count() // 2
    pdf = src.toPandas()
    two_files = tmp_path / "events_split"
    two_files.mkdir()
    pdf.iloc[:half].to_parquet(two_files / "part1.parquet", index=False)
    pdf.iloc[half:].to_parquet(two_files / "part2.parquet", index=False)

    schema = spark.read.parquet(str(two_files)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(two_files))
    )
    # same operator body as stateful_user_stats, driven by the 2-batch stream
    import uuid as _uuid
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([
        StructField("user_id", LongType()), StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ])
    state_schema = StructType([StructField("n", LongType()), StructField("cents", LongType())])

    def update(key, pdf_iter, state):
        n, cents = state.get if state.exists else (0, 0)
        for p in pdf_iter:
            n += len(p)
            cents += int(p["value"].mul(100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]})

    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.groupBy("user_id")
        .applyInPandasWithState(update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
        .writeStream.outputMode("update").format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    sink = spark.table(name).toPandas()
    # at least one user must have emitted twice (proof of multi-batch state)
    assert sink.groupby("user_id").size().max() >= 2
    final = sink.sort_values("n_events").groupby("user_id").last().reset_index()
    expect = (
        src.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        ).toPandas()
    )
    merged = final.merge(expect, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(expect)
    assert (merged.n_events_s == merged.n_events_b).all()
    assert (merged.sum_cents_s == merged.sum_cents_b).all()


def test_stream_session_isolates_caller_confs(spark):
    """r13 advice fix: bounded drains run on an isolated child session — the
    caller's session-global confs (shuffle.partitions) must never be mutated,
    even transiently, and the child carries the drain confs."""
    from matrixone_spark.streaming.events import (
        _STATE_PARTITIONS,
        _stream_session,
        run_streaming_aggregate,
        tumbling_event_counts,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = run_streaming_aggregate(spark, SF_DIR, tumbling_event_counts)
    assert out.count() > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    ss = _stream_session(spark)
    assert ss is not spark
    assert ss.conf.get("spark.sql.shuffle.partitions") == _STATE_PARTITIONS
    assert ss.conf.get("spark.sql.streaming.noDataMicroBatches.enabled") == "false"
    # reused across drains (one child per application)
    assert _stream_session(spark) is ss
