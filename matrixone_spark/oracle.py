"""DuckDB oracle runner + strict frame comparison.

Mirrors the driver's t2 gate: run the Spark query and the oracle SQL on the
same parquet tables, sort columns by name, sort rows, compare values. Our
tests are STRICTER than the driver (bit-exact floats) so that whatever hash
the driver uses, matching here implies matching there.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb
import pandas as pd

from matrixone_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connect(sf_dir)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_value(v):
    """Canonicalize one cell for comparison."""
    if v is None:
        return "<null>"
    if isinstance(v, (bytes, bytearray, memoryview)):
        # Spark fetches BINARY as bytes, DuckDB as bytearray — same payload
        return ("s", "0x" + bytes(v).hex())
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == 0.0:
            v = 0.0  # -0.0 == 0.0
        return ("f", repr(v))
    if isinstance(v, Decimal):
        # integral Decimals in uint64 range (e.g. Spark decimal(20,0) for
        # BIGINT UNSIGNED) must compare as ints, like the uint64 cells DuckDB
        # fetches; beyond 2^64 DuckDB itself fetches float64, so fall through
        if v == v.to_integral_value() and 2**52 <= abs(v) < 2**64:
            return ("i", int(v))
        return ("f", repr(float(v)))
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, (pd.Timestamp,)):
        if pd.isna(v):
            return "<null>"
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return ("t", v.isoformat())
    if isinstance(v, (pd.Timedelta, _dt.timedelta)):
        # MySQL/the reference evaluate date1 - date2 as a NUMBER of days
        # (dtype/TimeToInt.sql test18: -2935); Spark hands back an interval.
        # Whole-day intervals canonicalize to their day count, others to
        # total seconds — matching DuckDB's numeric answer.
        td = pd.Timedelta(v)
        if pd.isna(td):
            return "<null>"
        secs = td.total_seconds()
        if secs == int(secs) and int(secs) % 86400 == 0:
            return ("f", repr(secs / 86400.0))
        return ("f", repr(secs))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int,)):
        return ("f", repr(float(v))) if abs(v) < 2**52 else ("i", v)
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm_value(x) for x in v))
    if hasattr(v, "tolist"):  # numpy scalar / array
        t = v.tolist()
        if isinstance(t, list):
            return ("l", tuple(_norm_value(x) for x in t))
        return _norm_value(t)
    if hasattr(v, "date") and not isinstance(v, str):  # datetime.date/datetime
        return ("t", pd.Timestamp(v).isoformat())
    return ("s", str(v))


def canonical_rows(pdf: pd.DataFrame) -> "tuple[list, list[str]]":
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_value(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return rows, cols


def _dtype_kind(dtype) -> str:
    """Bucket a pandas dtype the way the driver's type-sensitive hash sees it:
    integer / float / bool / datetime / other."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    return "other"


def compare_dtypes(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> "list[str]":
    """Driver-hash parity check the value-normalisation cannot provide:
    _norm_value folds ints < 2^52 and Decimals to float repr, but the driver's
    value hash is dtype-sensitive (tpch_q12 r01: DuckDB HUGEINT fetched as
    float64 vs Spark bigint → hash_match false with identical values). Compare
    fetched pandas dtype kinds column-by-column so that divergence fails here
    first."""
    problems: list[str] = []
    for c in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        sk, ok = _dtype_kind(spark_pdf[c].dtype), _dtype_kind(oracle_pdf[c].dtype)
        if sk != ok:
            # all-null columns legitimately fetch as float64(NaN) vs object
            if spark_pdf[c].isna().all() and oracle_pdf[c].isna().all():
                continue
            problems.append(f"dtype mismatch on {c!r}: spark={spark_pdf[c].dtype} ({sk}) oracle={oracle_pdf[c].dtype} ({ok})")
    return problems


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> "list[str]":
    """Return a list of mismatch descriptions (empty = exact match)."""
    problems: list[str] = []
    s_rows, s_cols = canonical_rows(spark_pdf)
    o_rows, o_cols = canonical_rows(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return problems
    if len(spark_pdf) or len(oracle_pdf):
        problems.extend(compare_dtypes(spark_pdf, oracle_pdf))
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            problems.append(f"row {i} differs:\n  spark : {a}\n  oracle: {b}")
            if len(problems) > 5:
                problems.append("...")
                break
    return problems
