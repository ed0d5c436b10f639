"""ML-inference queries — SURVEY §2.8 onnx_run (func_builtin_onnx.go).

The registry entry scores every embedding with the deterministic fake linear
model (functions/onnx.py): the oracle replays the identical sequential
float64 fold in DuckDB, so the comparison is bit-exact without rounding —
same discipline as queries/vector.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.functions.onnx import fake_linear_oracle_expr, onnx_run
from matrixone_spark.queries import register

_MODEL = b"linear:3:64"  # seed=3, dim=64 (embeddings table dim)


@register(
    "onnx_run_score",
    oracle=f"""
SELECT vec_id,
       {fake_linear_oracle_expr("embedding", seed=3, dim=64)} AS score
FROM embeddings
WHERE vec_id < 400
""",
    tags=("mlai", "onnx"),
    doc=(
        "onnx_run(model, embedding) batch inference "
        "(func_builtin_onnx.go:38-47, session cached per expression "
        "instance — here per Python worker closure; pkg/mlai/onnx/). "
        "Deterministic fake runtime in-container; injectable real "
        "onnxruntime path via set_onnx_runtime."
    ),
)
def onnx_run_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("embeddings").filter(F.col("vec_id") < 400)
    return e.select("vec_id", onnx_run("embedding", _MODEL).alias("score"))
