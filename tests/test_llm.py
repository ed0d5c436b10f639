"""LLM function plumbing: determinism, batching, transport injection."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixone_spark.functions.llm import (
    EMBED_DIM,
    llm_chat,
    llm_embedding,
    set_llm_transport,
)


def test_embedding_deterministic_and_shaped(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "different")], "id long, t string"
    )
    rows = df.select("id", llm_embedding("t").alias("emb")).collect()
    embs = {r.id: r.emb for r in rows}
    assert len(embs[1]) == EMBED_DIM
    assert embs[1] == embs[2] != embs[3]  # content-determined, stable


def test_chat_and_null_handling(spark):
    df = spark.createDataFrame([(1, "hi"), (2, None)], "id long, p string")
    rows = {r.id: r.out for r in df.select("id", llm_chat("p").alias("out")).collect()}
    assert rows[1].startswith("[fake-chat] echo:hi")
    assert rows[2] == "[fake-chat] echo:"


def test_transport_injection(spark):
    def fake(endpoint, model, texts):
        # runs in the worker process — prove endpoint/model arrive via output
        return [f"custom[{endpoint}|{model}]:{t}" for t in texts]

    set_llm_transport(chat=fake)
    try:
        df = spark.createDataFrame([("a",), ("b",)], "p string")
        out = [r.o for r in df.select(llm_chat("p", "http://ep", "m1").alias("o")).collect()]
        assert sorted(out) == ["custom[http://ep|m1]:a", "custom[http://ep|m1]:b"]
    finally:
        set_llm_transport()
