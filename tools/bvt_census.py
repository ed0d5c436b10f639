"""Census of the BVT replay's silent denominator (VERDICT r9 ask #9).

`both_failed` (neither replay engine ran the statement) and `skipped`
(session-layer SkipStatement / issue-blocks / state-taint) are the
uncompared remainder behind BVT_REPORT.md's `compared` headline. This
tool buckets every such statement (captured per-run via
``BVT_CENSUS=<path> tools/bvt_replay.py …``) so the denominator is
auditable: how much is DDL/admin noise vs genuinely implementable
surface.

Usage: python tools/bvt_census.py /tmp/r10/census*.jsonl
Writes BVT_CENSUS.md at the repo root (linked from BVT_REPORT.md).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter, defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# bucket → (description, [patterns matched against the lowercased stmt])
BUCKETS = [
    ("account/role/privilege admin", [
        r"^\s*(create|drop|alter)\s+(account|user|role|publication|stage|snapshot|pitr)\b",
        r"^\s*(grant|revoke)\b", r"^\s*set\s+role\b", r"^\s*create\s+.*\bsubscription\b",
        r"\bmo_catalog\b", r"^\s*restore\b", r"^\s*upgrade\b",
    ]),
    ("session/admin SET & SHOW & protocol", [
        r"^\s*set\s+", r"^\s*show\s+", r"^\s*use\s+", r"^\s*kill\b",
        r"^\s*(desc|describe)\b", r"^\s*explain\b", r"^\s*analyze\b",
        r"^\s*call\b", r"^\s*backup\b", r"^\s*load\s+extension\b",
        r"^\s*select\s+(@@|current_role|current_account|user\(\)|current_user|connection_id|last_query_id|mo_|version\(\)|row_count\(\)|last_insert_id)",
        r"^\s*prepare\b", r"^\s*execute\b", r"^\s*deallocate\b",
    ]),
    ("DDL the replay models differently (indexes/partitions/views/sequences)", [
        r"^\s*create\s+(unique\s+|fulltext\s+)?index\b", r"^\s*drop\s+index\b",
        r"^\s*alter\s+table\b.*\b(add|drop)\s+(index|key|partition|column|constraint)\b",
        r"^\s*create\s+(or\s+replace\s+)?view\b.*definer", r"\bpartition\s+by\b",
        r"^\s*create\s+sequence\b", r"^\s*(alter|drop)\s+sequence\b",
        r"\bauto_increment\s*=", r"^\s*alter\s+view\b", r"^\s*rename\s+table\b",
        r"^\s*create\s+temporary\s+table\b.*\bselect\b",
    ]),
    ("unsupported storage/engine clauses (cluster by, external, snapshots)", [
        r"\bcluster\s+by\b", r"^\s*create\s+external\s+table\b",
        r"\binfile\b", r"\boutfile\b", r"\bdatalink\b", r"\bstage://",
        r"\{mo_ts\b", r"\bsnapshot\s*=",
    ]),
    ("transaction control divergence", [
        r"^\s*(begin|start\s+transaction|commit|rollback|savepoint)\b",
        r"^\s*lock\s+tables\b", r"^\s*unlock\s+tables\b",
    ]),
    ("vendor-typed DDL (vector/json/enum/set/geometry corner types)", [
        r"^\s*create\s+table\b.*\b(vecf32|vecf64|geometry|geography|enum\s*\(|set\s*\(|json|uuid|blob|longtext)\b",
    ]),
    ("cross-database qualified references (dbN.tbl — replay is single-db)", [
        r"\b(?:db|test|mysql|tpch|abc|vecdb|emis|procedure_test)\w*\s*\.\s*\w+",
    ]),
    ("other CREATE/DROP/TRUNCATE shapes", [
        r"^\s*(create|drop|truncate|alter)\b",
    ]),
    ("INSERT/UPDATE/DELETE/LOAD the replay could not express", [
        r"^\s*(insert|replace|update|delete|load|merge)\b", r"^\s*with\b.*\b(update|delete|insert)\b",
    ]),
    ("SELECT surface (genuinely implementable residue)", [
        r"^\s*\(*\s*(select|with|values|table)\b",
    ]),
]


def bucket_of(stmt: str) -> str:
    low = stmt.lower()
    for name, pats in BUCKETS:
        for p in pats:
            if re.search(p, low):
                return name
    return "unclassified"


def main() -> None:
    paths: "list[str]" = []
    for a in sys.argv[1:]:
        paths.extend(glob.glob(a))
    per_status: "dict[str, Counter]" = defaultdict(Counter)
    samples: "dict[tuple, list]" = defaultdict(list)
    total = Counter()
    for p in paths:
        for line in open(p, errors="replace"):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            b = bucket_of(rec.get("stmt", ""))
            st = rec.get("status", "?")
            per_status[st][b] += 1
            total[st] += 1
            if len(samples[(st, b)]) < 3:
                samples[(st, b)].append(rec.get("stmt", "")[:140])
    lines = [
        "# BVT_CENSUS — the uncompared denominator, bucketed",
        "",
        "Captured statement-by-statement during the latest full re-replay",
        "(`BVT_CENSUS=… tools/bvt_replay.py`). `skipped` = session-layer",
        "SkipStatement / @bvt:issue blocks / state-taint reads;",
        "`both_failed` = neither Spark-dialect nor DuckDB ran it;",
        "`duck_only` = only DuckDB parsed it (Spark-dialect gap).",
        "",
    ]
    for st in ("skipped", "both_failed", "duck_only"):
        cnt = per_status.get(st)
        if not cnt:
            continue
        lines.append(f"## {st} ({total[st]} statements)")
        lines.append("")
        lines.append("| bucket | n | share | example |")
        lines.append("|---|---|---|---|")
        for b, n in cnt.most_common():
            ex = (samples[(st, b)] or [""])[0].replace("|", "\\|")
            lines.append(
                f"| {b} | {n} | {100.0 * n / max(total[st], 1):.0f}% | `{ex}` |"
            )
        lines.append("")
    out = os.path.join(REPO, "BVT_CENSUS.md")
    open(out, "w").write("\n".join(lines) + "\n")
    print("wrote", out, dict(total))


if __name__ == "__main__":
    main()
