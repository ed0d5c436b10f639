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
localCheckpoint() per round truncates the growing lineage (plan depth is
the classic failure mode of driver-loop recursion at scale); rounds are
O(depth / fuse_levels) Spark jobs, each fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from typing import Callable

_LVL = "_rcte_lvl"


def recursive_cte(
    base: DataFrame,
    step: "Callable[[DataFrame], DataFrame]",
    distinct: bool = True,
    max_iter: int = 100,
    fuse_levels: int = 2,
) -> DataFrame:
    """Fixpoint of base ∪ step(base) ∪ step(step(base)) ∪ ...

    distinct=True → UNION recursion (dedup + cycle-safe);
    distinct=False → UNION ALL recursion (caller guarantees termination).

    r12 shape: accumulate CHECKPOINTED FRONTIER PIECES and union them lazily
    instead of re-checkpointing the whole accumulated result every round
    (O(depth × total) copies). subtract() is EXCEPT DISTINCT (dedups the left
    side, null-safe anti join) — it equals the old
    distinct().exceptAll(result.distinct()) exactly, including passing base
    duplicates through untouched (base is deliberately NOT distinct'd).

    r13 shape (guide §2.4/§2.6 — the wall here is driver-round latency, not
    executor work): fuse ``fuse_levels`` recursion levels into ONE driver
    round. Each round builds the k levels lazily (level j+1 steps from the
    lazy level j), unions them with a level tag, lazily localCheckpoints the
    union, and runs a single groupBy(tag).count() job that materializes the
    checkpoint AND yields every level's row count — replacing the old
    per-level eager-checkpoint job + isEmpty job (2 jobs/level → 1 job/k
    levels). Levels after the first empty one are discarded unexecuted,
    exactly like the old loop, which never stepped past an empty frontier
    (step(∅) is ∅ for any join/filter/project step, so the discarded tail is
    empty anyway). The trade: inside one round, level j's lazy subtree is
    re-evaluated by each later level's step+subtract (no barrier between
    them) — per-level work × ~2 for k=2 — bought against halving the number
    of synchronous driver rounds; measured a clear wall win on the
    scheduler-latency-bound hierarchy query while executor time stays small.
    fuse_levels=1 reproduces the r12 per-level loop exactly.
    """
    result = base.localCheckpoint(eager=True)
    pieces = [result]
    frontier = result
    levels_done = 0
    assert _LVL not in base.columns, f"column {_LVL} collides with recursion internals"
    while levels_done < max_iter:
        k = min(fuse_levels, max_iter - levels_done)
        seen = pieces[0]
        for p in pieces[1:]:
            seen = seen.unionAll(p)
        lvls: "list[DataFrame]" = []
        cur = frontier
        for _ in range(k):
            nxt = step(cur)
            if distinct:
                sub = seen
                for p in lvls:
                    sub = sub.unionAll(p)
                nxt = nxt.subtract(sub)
            lvls.append(nxt)
            cur = nxt
        tagged = None
        for j, p in enumerate(lvls):
            t = p.select(F.lit(j).alias(_LVL), "*")
            tagged = t if tagged is None else tagged.unionAll(t)
        tagged = tagged.localCheckpoint(eager=False)
        counts = {int(r[0]): r[1] for r in tagged.groupBy(_LVL).count().collect()}
        advanced = 0
        for j in range(k):
            if counts.get(j, 0) == 0:
                break
            piece = tagged.filter(F.col(_LVL) == j).drop(_LVL)
            pieces.append(piece)
            frontier = piece
            advanced += 1
            levels_done += 1
        if advanced < k:
            out = pieces[0]
            for p in pieces[1:]:
                out = out.unionAll(p)
            return out
    raise RuntimeError(f"recursive CTE did not converge within {max_iter} iterations")
