"""Approximate-aggregate quality gates (rank-error bounds, not hash equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.queries import load_all
from tests.conftest import SF_DIR


def test_approx_percentile_rank_error(spark):
    """Greenwald-Khanna guarantees rank error <= n/accuracy: the approx
    percentile's RANK (not value) lands within the tolerance window."""
    q = load_all()["agg_approx_percentile"]
    approx = {r.l_returnflag: r for r in q.fn(spark, SF_DIR).collect()}
    l = Catalog(spark, SF_DIR).table("lineitem")
    for flag, row in approx.items():
        vals = sorted(
            x.l_quantity
            for x in l.filter(F.col("l_returnflag") == flag).select("l_quantity").collect()
        )
        n = len(vals)
        tol = max(2, n // 10000 + 1)  # rank slack: n/accuracy, min a couple ranks
        for pct, got in ((0.5, row.p50), (0.9, row.p90)):
            target = int(pct * (n - 1))
            lo = vals[max(0, target - tol)]
            hi = vals[min(n - 1, target + tol)]
            assert lo <= got <= hi, (flag, pct, got, lo, hi, n)
