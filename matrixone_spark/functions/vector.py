"""Vector/array math — SURVEY §2.8 vector family.

Reference: vecf32/vecf64 column types (pkg/container/types/types.go:99-104)
with kernels in pkg/vectorize/moarray/ — l1_norm, l2_norm, inner_product,
cosine_similarity, l2_distance, cosine_distance, vector_dims, normalize_l2,
summation, subvector (function/func_binary_array_distance_test.go).

Spark-first: embeddings are ArrayType(FloatType) columns; every op below is a
pure array expression (F.aggregate / F.transform / F.zip_with) that runs
JVM-side inside codegen — no UDF, no Python, broadcast-friendly. Elements are
cast to double before reduction; F.aggregate folds sequentially (index order),
so results are IEEE-deterministic and reproducible across partitionings —
required for the DuckDB hash-gate and for stable KNN ranking at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _d(col) -> Column:
    """array<float> → array<double> (widen before arithmetic)."""
    return F.transform(_c(col), lambda v: v.cast("double"))


def _fold_sum(arr: Column) -> Column:
    """Sequential in-order double sum of an array expression."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def vector_dims(col) -> Column:
    """vector_dims(v). Reference: moarray dims."""
    return F.size(_c(col))


def l1_norm(col) -> Column:
    """Σ|x_i|. Reference: moarray l1_norm."""
    return _fold_sum(F.transform(_d(col), lambda v: F.abs(v)))


def l2_norm_sq(col) -> Column:
    return _fold_sum(F.transform(_d(col), lambda v: v * v))


def l2_norm(col) -> Column:
    """sqrt(Σx²). Reference: moarray l2_norm."""
    return F.sqrt(l2_norm_sq(col))


def summation(col) -> Column:
    """Σx_i. Reference: moarray summation."""
    return _fold_sum(_d(col))


def inner_product(a, b) -> Column:
    """−(a·b) — the reference NEGATES the dot product so smaller means
    closer, like its other distances (metric.InnerProduct returns -sum,
    vectorindex/metric/distance_func.go:206)."""
    return -_fold_sum(F.zip_with(_d(a), _d(b), lambda x, y: x * y))


def l2_distance_sq(a, b) -> Column:
    """Σ(a-b)². Reference: l2_distance_sq."""
    return _fold_sum(F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)))


def l2_distance(a, b) -> Column:
    """Euclidean distance. Reference: moarray l2_distance; powers the L2 join
    (colexec/productl2/product_l2.go:70)."""
    return F.sqrt(l2_distance_sq(a, b))


def cosine_similarity(a, b) -> Column:
    """a·b / (|a||b|) — the POSITIVE dot here (inner_product carries the
    reference's negated-distance convention). Reference: moarray
    cosine_similarity."""
    return _fold_sum(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    ) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a, b) -> Column:
    """1 - cosine_similarity. Reference: moarray cosine_distance."""
    return 1 - cosine_similarity(a, b)


def normalize_l2(col) -> Column:
    """v / |v|₂ (zero vector → NULL elements, matching reference error-free
    mode). Reference: moarray normalize_l2."""
    n = l2_norm(col)
    return F.transform(_d(col), lambda v: F.when(n != 0, v / n))


def subvector(col, start: int, length: "int | None" = None) -> Column:
    """subvector(v, start[, len]) — 1-based like the SQL surface.
    Reference: moarray subvector."""
    return F.slice(_c(col), start, length) if length is not None else F.slice(
        _c(col), start, F.size(_c(col))
    )


def lit_vector(vec: "list[float]") -> Column:
    """Constant query vector as an array<double> literal.

    r13 (guide §5, driver work): built as ONE SQL expression string parsed
    JVM-side — the Column-API form (`F.array(*[F.lit(v) ...])`) cost a py4j
    round-trip per element (65 for a 64-dim query vector) of driver-side
    Python latency per plan build. `repr(float)` is the shortest exact
    round-trip decimal, and the `D` suffix makes each element a DoubleType
    literal, so the parsed array is bit-identical to the old literals.
    """
    return F.expr(lit_vector_sql(vec))


def lit_vector_sql(vec: "list[float]") -> str:
    """SQL-string form of lit_vector (composable into larger expressions)."""
    return "array({})".format(", ".join(f"{float(v)!r}D" for v in vec))


def _d_sql(col_sql: str) -> str:
    return f"transform({col_sql}, v -> CAST(v AS DOUBLE))"


def _fold_sum_sql(arr_sql: str) -> str:
    return f"aggregate({arr_sql}, 0.0D, (acc, v) -> acc + v)"


def l2_distance_sql(a_sql: str, b_sql: str) -> str:
    """SQL-string form of l2_distance — same expression tree, one parse call
    (r13 guide §5 driver work; the Column-API lambda chain costs ~40 py4j
    round-trips per use)."""
    zw = f"zip_with({_d_sql(a_sql)}, {_d_sql(b_sql)}, (x, y) -> (x - y) * (x - y))"
    return f"sqrt({_fold_sum_sql(zw)})"


# --- base64 vector codecs (func_unary.go:5849 VecFromBase64: base64 of the
# raw little-endian element bytes, as produced by to_base64(vec);
# function_id.go vecf32/vecf64/vecf16/vecbf16/vecint8/vecuint8_from_base64).
# Arrow-batched numpy codecs — byte reinterpretation has no Column form. ---

import base64 as _b64

import numpy as _np
import pandas as _pd
from pyspark.sql.functions import pandas_udf as _pandas_udf
from pyspark.sql.types import ArrayType as _ArrayType
from pyspark.sql.types import DoubleType as _DoubleType
from pyspark.sql.types import FloatType as _FloatType
from pyspark.sql.types import StringType as _StringType

_NP_DTYPES = {
    "float32": "<f4",
    "float64": "<f8",
    "float16": "<f2",
    "int8": "i1",
    "uint8": "u1",
}


def vec_to_base64(col, dtype: str = "float32") -> Column:
    """to_base64(vector): base64 of the little-endian element bytes."""
    nd = _NP_DTYPES[dtype]

    @_pandas_udf(_StringType())
    def enc(vs: _pd.Series) -> _pd.Series:
        return _pd.Series(
            [
                None
                if v is None
                else _b64.b64encode(_np.asarray(v, dtype=nd).tobytes()).decode()
                for v in vs
            ],
            dtype="object",
        )

    return enc(_c(col))


def vec_from_base64(col, dtype: str = "float32") -> Column:
    """vecf32_from_base64 et al.: decode base64 → element array (NULL on
    invalid base64 / length not a multiple of the element size — the
    batch analogue of the reference's per-row error)."""
    nd = _NP_DTYPES[dtype]
    out_type = _ArrayType(_FloatType() if dtype in ("float32", "float16") else _DoubleType())
    as_float = dtype in ("float32", "float16")

    @_pandas_udf(out_type)
    def dec(ss: _pd.Series) -> _pd.Series:
        out = []
        for s in ss:
            if s is None:
                out.append(None)
                continue
            try:
                raw = _b64.b64decode(s, validate=True)
            except Exception:
                out.append(None)
                continue
            size = _np.dtype(nd).itemsize
            if len(raw) % size != 0:
                out.append(None)
                continue
            arr = _np.frombuffer(raw, dtype=nd)
            out.append(
                [float(x) for x in arr.astype("<f4" if as_float else "<f8")]
            )
        return _pd.Series(out, dtype="object")

    return dec(_c(col))


def vecf32_from_base64(col) -> Column:
    """function_id.go VECF32_FROM_BASE64."""
    return vec_from_base64(col, "float32")


def vecf64_from_base64(col) -> Column:
    """function_id.go VECF64_FROM_BASE64."""
    return vec_from_base64(col, "float64")


def vecf16_from_base64(col) -> Column:
    """function_id.go VECF16_FROM_BASE64."""
    return vec_from_base64(col, "float16")


def vecbf16_from_base64(col) -> Column:
    """function_id.go VECBF16_FROM_BASE64 (bfloat16 = float32 with the
    trailing 16 mantissa bits dropped; numpy lacks bf16, decode widens via
    uint16<<16 bit-reinterpretation)."""
    import numpy as np

    @_pandas_udf(_ArrayType(_FloatType()))
    def dec(ss: _pd.Series) -> _pd.Series:
        out = []
        for s in ss:
            if s is None:
                out.append(None)
                continue
            try:
                raw = _b64.b64decode(s, validate=True)
            except Exception:
                out.append(None)
                continue
            if len(raw) % 2 != 0:
                out.append(None)
                continue
            u16 = np.frombuffer(raw, dtype="<u2").astype(np.uint32) << 16
            out.append([float(x) for x in u16.view(np.float32)])
        return _pd.Series(out, dtype="object")

    return dec(_c(col))


def vecint8_from_base64(col) -> Column:
    """function_id.go VECINT8_FROM_BASE64."""
    return vec_from_base64(col, "int8")


def vecuint8_from_base64(col) -> Column:
    """function_id.go VECUINT8_FROM_BASE64."""
    return vec_from_base64(col, "uint8")
