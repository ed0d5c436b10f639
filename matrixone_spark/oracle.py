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
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == 0.0:
            v = 0.0  # -0.0 == 0.0
        return ("f", repr(v))
    if isinstance(v, Decimal):
        return ("f", repr(float(v)))
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, (pd.Timestamp,)):
        if pd.isna(v):
            return "<null>"
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return ("t", v.isoformat())
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


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> "list[str]":
    """Return a list of mismatch descriptions (empty = exact match)."""
    problems: list[str] = []
    s_rows, s_cols = canonical_rows(spark_pdf)
    o_rows, o_cols = canonical_rows(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            problems.append(f"row {i} differs:\n  spark : {a}\n  oracle: {b}")
            if len(problems) > 5:
                problems.append("...")
                break
    return problems
