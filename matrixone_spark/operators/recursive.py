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
    # r12 perf shape: accumulate CHECKPOINTED FRONTIER PIECES and union them
    # lazily instead of re-checkpointing the whole accumulated result every
    # round. The old loop materialized O(|result|) per iteration (checkpoint
    # of result ∪ nxt) — O(depth × total) copies overall — and re-ran
    # .distinct() over the accumulated result each round although the result
    # is distinct by construction (base is distinct'd once; every appended
    # frontier is distinct and disjoint from what came before). Lineage
    # stays shallow without the per-round result checkpoint because the
    # union's children are all checkpointed leaves. subtract() is EXCEPT
    # DISTINCT (dedups the left side, null-safe anti join) — it equals the
    # old distinct().exceptAll(result.distinct()) exactly, including the
    # old behavior of passing base duplicates through to the output
    # untouched (base is deliberately NOT distinct'd here, as before).
    result = base.localCheckpoint(eager=True)
    pieces = [result]
    frontier = result
    for _ in range(max_iter):
        nxt = step(frontier)
        if distinct:
            seen = pieces[0]
            for p in pieces[1:]:
                seen = seen.unionAll(p)
            nxt = nxt.subtract(seen)
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            out = pieces[0]
            for p in pieces[1:]:
                out = out.unionAll(p)
            return out
        pieces.append(nxt)
        frontier = nxt
    raise RuntimeError(f"recursive CTE did not converge within {max_iter} iterations")
