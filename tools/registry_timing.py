"""Time EVERY registered query (cold + warm) at $SPARK_GRAFT_SF_DIR.

Optimization-round census: the bench covers 18 queries; this sweeps all ~195
so non-bench outliers surface. Prints one JSON line per query plus a sorted
summary. Not part of the driver contract — a measurement tool only.

Usage: python tools/registry_timing.py [out.json] [warm_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

from matrixone_spark.queries import load_all
from matrixone_spark.session import get_spark


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/registry_timing.json"
    warm_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("mospark-registry-timing")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.sql("SELECT 1").collect()
    spark.range(1000).mapInArrow(lambda it: it, "id long").count()

    results: dict[str, dict] = {}
    for name, q in registry.items():
        rec: dict = {}
        try:
            t0 = time.time()
            rows = q.fn(spark, sf_dir).collect()
            rec["cold"] = round(time.time() - t0, 3)
            rec["rows"] = len(rows)
            warm = []
            for _ in range(warm_runs):
                t0 = time.time()
                q.fn(spark, sf_dir).collect()
                warm.append(round(time.time() - t0, 3))
            rec["warm"] = min(warm)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:200]
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    ok = {n: r for n, r in results.items() if "warm" in r}
    top = sorted(ok.items(), key=lambda kv: -kv[1]["warm"])[:30]
    print("\n== slowest warm ==")
    for n, r in top:
        print(f"{r['warm']:8.3f}s  (cold {r['cold']:7.3f}s, {r['rows']} rows)  {n}")
    errs = {n: r["err"] for n, r in results.items() if "err" in r}
    if errs:
        print("\n== errors ==")
        for n, e in errs.items():
            print(f"{n}: {e}")
    print(f"\ntotal warm: {sum(r['warm'] for r in ok.values()):.2f}s over {len(ok)} queries")


if __name__ == "__main__":
    main()
