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


def test_multimodal_decoder_stub_raises(spark):
    from matrixone_spark.operators.multimodal import real_decoder

    import pytest

    with pytest.raises(NotImplementedError):
        real_decoder(b"bytes", "image/png")
