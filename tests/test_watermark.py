"""Watermark semantics: late data beyond the watermark must be DROPPED in
append-mode streaming aggregation (the reference's CDC watermarks are
resume points, pkg/cdc/reader_v2; Spark watermarks additionally bound state
and drop late rows — this is the behavior a 100 TB streaming deployment
relies on for bounded state)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

TMP = "/root/repo/.tmp_test_watermark"


@pytest.fixture()
def iodirs():
    shutil.rmtree(TMP, ignore_errors=True)
    src = f"{TMP}/src"
    os.makedirs(src)
    yield src
    shutil.rmtree(TMP, ignore_errors=True)


def test_append_mode_drops_late_rows(spark, iodirs):
    src = iodirs
    from datetime import datetime

    schema = "ts timestamp, v int"
    t = lambda s: datetime.fromisoformat(s)
    batch1 = spark.createDataFrame(
        [(t("2024-01-01 00:05:00"), 1), (t("2024-01-01 02:00:00"), 2)], schema
    )  # second row advances watermark far past hour 0
    batch2 = spark.createDataFrame(
        [(t("2024-01-01 00:07:00"), 100), (t("2024-01-01 02:10:00"), 3)], schema
    )  # first row is >1h late → must be dropped
    ckpt = f"{TMP}/ckpt"
    out = f"{TMP}/out"

    def run_pass():
        # a checkpointed availableNow pass = one-or-more micro-batches over
        # the new files; the watermark persists in the checkpoint between
        # passes, exactly like a restarted production job
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.sum("v").alias("total"))
            .select(F.col("w.start").alias("ws"), "total")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1.coalesce(1).write.mode("append").parquet(src)
    run_pass()  # watermark advances to 02:00 - 1h = 01:00 → hour-0 finalized
    batch2.coalesce(1).write.mode("append").parquet(src)
    run_pass()  # late 00:07 row arrives behind the 01:00 watermark
    rows = {
        r.ws.isoformat(): r.total
        for r in spark.read.schema("ws timestamp, total long").parquet(out).collect()
    }
    # hour-0 window was finalized by the watermark after batch1: total=1,
    # the late v=100 row must NOT appear
    assert rows.get("2024-01-01T00:00:00") == 1, rows
    assert 100 not in rows.values()
