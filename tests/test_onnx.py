"""onnx_run plumbing: determinism, session injection, NULL handling, and
exact oracle parity of the fake linear model (mirrors tests/test_llm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixone_spark.functions.onnx import (
    fake_linear_session,
    onnx_run,
    set_onnx_runtime,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.0]), (3, [0.0, 0.0, 0.0, 0.0]), (4, None)],
        "id long, v array<float>",
    )


def test_fake_linear_deterministic(spark):
    rows = {r.id: r.s for r in _df(spark).select("id", onnx_run("v", b"linear:3:4").alias("s")).collect()}
    assert rows[1] == rows[2]  # content-determined
    # all-zero vector scores exactly the bias
    assert rows[3] == 3 / 10.0
    assert rows[4] is None  # NULL row → NULL score
    # closed-form check: w_j = ((3*(j+1)) % 97)/97 - 0.5
    w = [((3 * (j + 1)) % 97) / 97.0 - 0.5 for j in range(4)]
    expect = sum(x * wj for x, wj in zip([1.0, 2.0, 3.0, 4.0], w)) + 0.3
    assert abs(rows[1] - expect) < 1e-12


def test_runtime_injection(spark):
    calls = []

    def loader(model):
        def run(vectors):
            return [float(len(v)) if v is not None else None for v in vectors]

        calls.append(model)
        return run

    set_onnx_runtime(loader)
    try:
        rows = {r.id: r.s for r in _df(spark).select("id", onnx_run("v", b"anymodel").alias("s")).collect()}
        assert rows[1] == 4.0 and rows[4] is None
    finally:
        set_onnx_runtime()


def test_bad_fake_spec_raises():
    try:
        fake_linear_session(b"not-a-spec")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "set_onnx_runtime" in str(e)


def test_onnx_query_matches_oracle(spark):
    from matrixone_spark.queries import load_all
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, load_all()["onnx_run_score"])
