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
