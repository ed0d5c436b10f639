"""Streaming + multimodal coverage.

- Streaming queries run a REAL Structured Streaming job (readStream →
  watermark → window agg → availableNow → memory sink) and are oracle-gated
  against the equivalent batch SQL: bounded-source streaming must equal batch.
- Multimodal: binary payload + metadata plumbing with mapInPandas feature
  extraction; decode itself is stubbed (no codec libs in the container), the
  Spark-side machinery is real and oracle-gated via deterministic features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.operators.multimodal import attach_media, extract_features
from matrixone_spark.queries import register
from matrixone_spark.streaming.events import (
    run_streaming_aggregate,
    session_windows,
    sliding_user_activity,
    tumbling_event_counts,
)


@register(
    "stream_tumbling_counts",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS _wstart,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "bench"),
    doc="Structured Streaming tumbling-window counts with 1h watermark (CDC-analogue surface, SURVEY §2.11; pkg/cdc/ reader watermarks) — complete-mode result over the bounded source must equal batch SQL.",
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_aggregate(spark, sf_dir, tumbling_event_counts)


@register(
    "stream_session_windows",
    oracle=None,  # session merge boundaries are engine-specific state logic;
    # batch gaps-and-islands equivalence is gated in tests/test_streaming.py
    tags=("streaming", "approx"),
    doc="Native streaming session windows (F.session_window, 30-min gap) — the streaming counterpart of sessionize_events; equality with the batch gaps-and-islands sessionizer is pytest-gated.",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_aggregate(
        spark, sf_dir, lambda s: session_windows(s.filter(F.col("user_id") <= 10))
    )


@register(
    "stream_sliding_activity",
    oracle=None,  # approx_count_distinct (streaming-safe distinct) is estimator-specific
    tags=("streaming", "approx"),
    doc="Sliding 2h/1h streaming window with approx_count_distinct users (exact distinct is not incrementally maintainable).",
)
def stream_sliding_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_aggregate(spark, sf_dir, sliding_user_activity)


@register(
    "stream_static_join",
    oracle="""
SELECT c.c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
GROUP BY c.c_mktsegment
""",
    tags=("streaming", "join"),
    doc="Stream-static join: streaming events joined to the static customer dim (broadcast), aggregated per segment — the canonical streaming-enrichment shape; complete-mode result equals batch SQL.",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = Catalog(spark, sf_dir).table("customer")

    def agg(stream: DataFrame) -> DataFrame:
        enriched = stream.filter(F.col("event_type") == "purchase").join(
            customer, F.col("user_id") == F.col("c_custkey")
        )
        return enriched.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )

    return run_streaming_aggregate(spark, sf_dir, agg, watermark=None)


@register(
    "multimodal_features",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS digest,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                                    WHEN 1 THEN 'audio/wav'
                                    ELSE 'video/mp4' END AS media_type
FROM documents WHERE doc_id < 200
""",
    tags=("multimodal", "udf"),
    doc="Multimodal binary-column pipeline: attach payload+metadata (datalink/blob parity, types.go:85-87), extract features via Arrow-batched mapInPandas. Deterministic fake decoder (real decode stubbed: no codec libs) keeps it oracle-checkable.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 200)
    return extract_features(attach_media(d))


@register(
    "multimodal_metadata_stats",
    oracle="""
SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                                    WHEN 1 THEN 'audio/wav'
                                    ELSE 'video/mp4' END AS media_type,
       COUNT(*) AS n,
       CAST(SUM((doc_id % 16 + 1) * 64 * (doc_id % 9 + 1) * 64) AS BIGINT) AS total_pixels
FROM documents
GROUP BY 1
""",
    tags=("multimodal",),
    doc="Typed-metadata aggregation over the media table (width/height stay queryable columns beside the opaque payload).",
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    m = attach_media(d)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("width").cast("bigint") * F.col("height")).alias("total_pixels"),
    )


@register(
    "multimodal_png_decode",
    oracle="""
SELECT doc_id,
       CAST(doc_id % 16 + 1 AS INT) AS width,
       CAST(doc_id % 9 + 1 AS INT) AS height,
       'png' AS fmt
FROM documents WHERE doc_id < 300
""",
    tags=("multimodal", "udf"),
    doc=(
        "REAL image decode path end-to-end: synthesize a spec-valid "
        "zlib-compressed PNG per row (operators/multimodal.py png_bytes), "
        "then recover its dimensions by actually parsing the bytes "
        "(decode_image_meta: PNG IHDR; PIL pixel decode when importable). "
        "The oracle recomputes the dimensions from the id formula — any "
        "synthesis or parse bug mismatches. Both steps are Arrow-batched "
        "mapInPandas (load_file_chunks/blob parity, types.go:85-87)."
    ),
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from matrixone_spark.operators.multimodal import decode_png_media, attach_png_media

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 300)
    return decode_png_media(attach_png_media(d))


@register(
    "stream_stream_join",
    oracle="""
SELECT v.event_id AS v_id, c.event_id AS c_id, v.user_id,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM events v
JOIN events c ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND c.event_type = 'click'
""",
    tags=("streaming", "join"),
    doc=(
        "Stream-stream inner interval join (views × clicks per user within 30 "
        "minutes), both sides watermarked so join state is bounded — the "
        "streaming counterpart of the CDC feed join (pkg/cdc/). Append-mode "
        "drain over the bounded source must equal the batch interval join."
    ),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from matrixone_spark.streaming.events import stream_stream_interval_join

    return stream_stream_interval_join(spark, sf_dir, window="30 minutes")


@register(
    "stream_stateful_user_stats",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY user_id
""",
    tags=("streaming", "udf"),
    doc=(
        "Custom stateful operator via applyInPandasWithState: per-user "
        "running (count, cents-sum) in the keyed state store across "
        "micro-batches (Spark-native analogue of the reference's resumable "
        "CDC consumers, pkg/cdc/ reader watermarks). Integer-cents state "
        "keeps accumulation exact; converged totals equal the batch groupBy."
    ),
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from matrixone_spark.streaming.events import stateful_user_stats

    return stateful_user_stats(spark, sf_dir)


@register(
    "stream_dedup_exactly_once",
    oracle="""
SELECT event_id, event_type, user_id
FROM events WHERE user_id <= 5
""",
    tags=("streaming",),
    doc=(
        "Streaming dedup under at-least-once delivery: stream unioned with "
        "itself (every event delivered twice) → dropDuplicatesWithinWatermark "
        "on event_id emits each exactly once, with dedup state bounded by "
        "the 1h watermark horizon (unbounded dedup state is the classic "
        "streaming OOM at scale). Oracle = the undoubled batch relation."
    ),
)
def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    from matrixone_spark.streaming.events import dedup_within_watermark

    return dedup_within_watermark(spark, sf_dir)


@register(
    "multimodal_resize",
    oracle="""
WITH d AS (
  SELECT doc_id,
         CAST(doc_id % 6 + 1 AS INT) * 8 AS w,
         CAST(doc_id % 4 + 1 AS INT) * 8 AS h,
         CAST(doc_id % 251 AS INT)       AS seed
  FROM documents WHERE doc_id < 120)
SELECT d.doc_id,
       d.w AS in_w, d.h AS in_h,
       12 AS out_w, 8 AS out_h,
       CAST(SUM((d.seed + 3 * ((x.x * d.w) // 12) + c.c + ((y.y * d.h) // 8))
                % 256) AS BIGINT) AS checksum
FROM d
JOIN generate_series(0, 7)  AS y(y) ON TRUE
JOIN generate_series(0, 11) AS x(x) ON TRUE
JOIN generate_series(0, 2)  AS c(c) ON TRUE
GROUP BY d.doc_id, d.w, d.h
""",
    tags=("multimodal", "udf"),
    doc=(
        "REAL image resize path: per-doc synthetic PNG (closed-form pixels) "
        "-> clean-room PNG decode (zlib inflate + spec defilter, operators/"
        "multimodal.py png_decode_pixels) -> nearest-neighbor resize -> "
        "checksum of the RESIZED pixel buffer. The oracle recomputes the "
        "checksum arithmetically (no image lib in DuckDB), so a decode or "
        "resampling bug cannot hash-match. Arrow-batched mapInPandas, "
        "constant memory — the 100 TB image-preprocessing shape."
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from matrixone_spark.operators import multimodal as MM

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 120)

    def synth(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            ids = pdf["doc_id"]
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [
                    MM.png_bytes((int(i) % 6 + 1) * 8, (int(i) % 4 + 1) * 8,
                                 seed=int(i) % 251)
                    for i in ids
                ],
            })

    media = d.select("doc_id").mapInPandas(synth, MM.PNG_MEDIA_SCHEMA)
    return MM.resize_media(media, 12, 8)


@register(
    "multimodal_frame_sample",
    oracle="""
WITH d AS (
  SELECT doc_id,
         CAST(doc_id % 5 + 2 AS INT) AS nf,
         CAST(doc_id % 251 AS INT)   AS seed
  FROM documents WHERE doc_id < 100),
f AS (
  SELECT d.doc_id, d.seed, g.idx
  FROM d JOIN generate_series(0, 6) AS g(idx) ON g.idx < d.nf
  WHERE g.idx % 2 = 0)
SELECT f.doc_id,
       CAST(f.idx AS INT) AS frame_idx,
       8 AS frame_w, 8 AS frame_h,
       CAST(SUM((f.seed + f.idx + xb.xb + y.y) % 256) AS BIGINT) AS checksum
FROM f
JOIN generate_series(0, 7)  AS y(y)  ON TRUE
JOIN generate_series(0, 23) AS xb(xb) ON TRUE
GROUP BY f.doc_id, f.idx
""",
    tags=("multimodal", "udf"),
    doc=(
        "Video frame sampling: per-doc MOVF container (length-prefixed PNG "
        "frames, operators/multimodal.py movf_bytes) -> parse container -> "
        "keep every 2nd frame -> decode sampled frames -> per-frame pixel "
        "checksum; one input row fans out to its sampled frames. Oracle "
        "recomputes frame membership and checksums arithmetically."
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from matrixone_spark.operators import multimodal as MM

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 100)

    def synth(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            ids = pdf["doc_id"]
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [
                    MM.movf_bytes(int(i) % 5 + 2, 8, 8, seed=int(i) % 251)
                    for i in ids
                ],
            })

    media = d.select("doc_id").mapInPandas(synth, MM.PNG_MEDIA_SCHEMA)
    return MM.sample_frames(media, 2)


@register(
    "multimodal_audio_energy",
    oracle="""
WITH d AS (
  SELECT doc_id, CAST(doc_id % 97 AS INT) AS seed
  FROM documents WHERE doc_id < 150),
s AS (
  SELECT d.doc_id, g.i,
         ((d.seed * 31 + g.i * 7) % 4001) - 2000 AS v
  FROM d JOIN generate_series(0, 239) AS g(i) ON TRUE)
SELECT doc_id,
       CAST(i // 64 AS INT) AS win_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy
FROM s GROUP BY doc_id, i // 64
""",
    tags=("multimodal", "udf"),
    doc=(
        "Audio framing + energy: per-doc deterministic int16 PCM "
        "(operators/multimodal.py pcm_bytes) -> fixed 64-sample windows -> "
        "exact integer sum-of-squares per window (numpy over Arrow "
        "batches). Integer energies make the gate bit-exact; the oracle "
        "regenerates the same samples from the closed form."
    ),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from matrixone_spark.operators import multimodal as MM

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 150)

    def synth(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            ids = pdf["doc_id"]
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [MM.pcm_bytes(240, seed=int(i) % 97) for i in ids],
            })

    media = d.select("doc_id").mapInPandas(synth, MM.PNG_MEDIA_SCHEMA)
    return MM.audio_energy(media, 64)
