"""Measure DRIVER-SIDE DataFrame construction time per bench query.

Times `q.fn(spark, sf_dir)` without any action — pure Python/py4j plan-build
latency, the component the r13 SQL-string rewrites target (guide §5, driver).
Not part of the driver contract; a measurement tool only.

Usage: python tools/build_time_probe.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

from matrixone_spark.queries import load_all
from matrixone_spark.session import get_spark

BENCH_TAG = "bench"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    names = sorted(n for n, q in registry.items() if BENCH_TAG in q.tags)
    spark = get_spark("mospark-build-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        q = registry[name]
        q.fn(spark, sf_dir)  # warm any per-process caches (index builds etc.)
        best = min(
            (lambda t0: (q.fn(spark, sf_dir), time.time() - t0)[1])(time.time())
            for _ in range(reps)
        )
        rows.append((best, name))
    for best, name in sorted(rows, reverse=True):
        print(f"{best:7.3f}s  {name}")
    print(f"total build: {sum(b for b, _ in rows):.3f}s")


if __name__ == "__main__":
    main()
