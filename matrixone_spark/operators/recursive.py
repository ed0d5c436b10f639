"""Recursive CTE: driver-side fixpoint loop.

Reference: WITH RECURSIVE executes as a batch loop between MergeCTE /
MergeRecursive operators (colexec/mergerecursive/mergerecursive.go:47,
mergecte/mergecte.go:64) with a per-batch Recursive flag
(container/batch/types.go:46); BVT corpus test/distributed/cases/recursive_cte/.

Spark has no native recursive CTE → the loop lives on the driver, each
iteration a distributed step:

    result = base
    frontier = base
    while frontier non-empty and depth < max_iter:
        frontier = step(frontier) [minus seen rows, UNION semantics]
        result   = result ∪ frontier

UNION (distinct) recursion subtracts already-seen rows each round — that both
dedups and terminates cycles, mirroring MySQL's distinct-recursion rule.
localCheckpoint() per iteration truncates the growing lineage (plan depth is
the classic failure mode of driver-loop recursion at scale); iterations are
O(depth) Spark jobs, each fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from typing import Callable


def recursive_cte(
    base: DataFrame,
    step: "Callable[[DataFrame], DataFrame]",
    distinct: bool = True,
    max_iter: int = 100,
) -> DataFrame:
    """Fixpoint of base ∪ step(base) ∪ step(step(base)) ∪ ...

    distinct=True → UNION recursion (dedup + cycle-safe);
    distinct=False → UNION ALL recursion (caller guarantees termination).
    """
    result = base.localCheckpoint(eager=True)
    frontier = result
    for _ in range(max_iter):
        nxt = step(frontier)
        if distinct:
            nxt = nxt.distinct().exceptAll(result.distinct())
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return result
        result = result.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(f"recursive CTE did not converge within {max_iter} iterations")
