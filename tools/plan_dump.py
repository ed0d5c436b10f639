"""Dump .explain('formatted') for bench-tagged (or named) queries.

Usage:
  python tools/plan_dump.py before            # all bench queries -> plans/$ROUND/<q>_before.txt
  python tools/plan_dump.py after q1 q2 ...   # named queries -> plans/$ROUND/<q>_after.txt

Round directory from $SPARK_GRAFT_PLAN_ROUND (default r13).
"""

from __future__ import annotations

import os
import sys

from matrixone_spark.queries import load_all
from matrixone_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    if not names:
        names = sorted(n for n, q in registry.items() if "bench" in q.tags)
    spark = get_spark("mospark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = registry[name].fn(spark, sf_dir)
            # execute first so AQE's FINAL plan (isFinalPlan=true, runtime
            # join conversions, coalesced reads) is what gets recorded.
            # collect() (not a noop write) because the write wraps the plan
            # in a NEW query execution — the df's own AQE plan would stay
            # unexecuted and explain would print the initial plan.
            df.collect()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
