"""Replay single BVT scripts and dump EVERY mismatch/ref_fail detail to
stdout (tools/bvt_replay.py prints only the first 3). Triage aid.

Usage: python tools/bvt_debug.py dtype/year.sql dtype/decimal.test ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CASES = "/root/reference/test/distributed/cases"


def main() -> None:
    from matrixone_spark.bvt_runner import CoExecutor, RefResults
    from matrixone_spark.session import get_spark

    spark = get_spark("bvt-debug")
    spark.sparkContext.setLogLevel("ERROR")
    for rel in sys.argv[1:]:
        path = os.path.join(CASES, rel)
        text = open(path, errors="replace").read()
        ref = None
        rf = path.rsplit(".", 1)[0] + ".result"
        if os.path.exists(rf):
            ref = RefResults(open(rf, errors="replace").read())
        co = CoExecutor(spark)
        details: list = []
        t0 = time.time()
        stats = co.run_script(text, details=details, ref=ref)
        print(f"== {rel}: {stats} ({time.time()-t0:.0f}s)")
        for stmt, s_rows, o_rows in details:
            print("  STMT:", " ".join(stmt.split())[:200])
            print("    spark:", s_rows)
            print("    other:", o_rows)


if __name__ == "__main__":
    main()
