"""MySQL-dialect SQL text → Spark SQL translation (SURVEY §3.1 'thin
MySQL-dialect compatibility layer').

Most MySQL OLAP SQL parses in Spark unchanged (backtick identifiers, DIV,
IFNULL, CASE, LIMIT/OFFSET, INTERVAL arithmetic all work natively — the
reference's goyacc grammar pkg/sql/parsers/dialect/mysql/mysql_sql.y overlaps
heavily with Spark's). This module rewrites the known divergences:

- DATE_FORMAT(x, '%Y-%m')  → date_format(x, 'yyyy-MM')   (pattern language)
- STR_TO_DATE(s, fmt)      → to_timestamp(s, java-fmt)
- GROUP_CONCAT(x SEPARATOR s) → concat_ws + collect_list (sorted for
  determinism, matching the reference's ordered group_concat)
- RAND(seed)               → rand(seed)  (name-compatible already)

Translation is token-light regex on string literals — not a full parser; the
aim is the common BVT query shapes, with the DataFrame API as the complete
surface underneath.
"""

from __future__ import annotations

import re

from matrixone_spark.functions.mysql import mysql_format_to_java

_DATE_FORMAT_RE = re.compile(
    r"(date_format|str_to_date)\s*\(\s*([^,()]+(?:\([^()]*\))?[^,()]*)\s*,\s*'([^']*)'\s*\)",
    re.IGNORECASE,
)
_GROUP_CONCAT_RE = re.compile(
    r"group_concat\s*\(\s*([^()]+?)\s*(?:separator\s+'([^']*)')?\s*\)", re.IGNORECASE
)

# System/meta no-arg calls (VERSION(), DATABASE(), CONNECTION_ID(), ...) are
# session-context lookups in the reference (function_id.go:1053-1081); here
# they fold to literals at translate time (functions/system.py rationale).
_SYSTEM_FN_RE = re.compile(
    r"\b(version|git_version|database|schema|user|current_user|session_user"
    r"|system_user|current_role|connection_id|charset|collation"
    r"|last_insert_id|found_rows|row_count)\s*\(\s*\)",
    re.IGNORECASE,
)


def translate(sql: str) -> str:
    """Rewrite MySQL-dialect constructs into Spark SQL."""
    from matrixone_spark.functions.system import DEFAULT_CONTEXT, sql_literals

    sys_lits = sql_literals(DEFAULT_CONTEXT)

    def fmt_repl(m: "re.Match") -> str:
        fn, arg, fmt = m.group(1).lower(), m.group(2), mysql_format_to_java(m.group(3))
        if fn == "str_to_date":
            return f"to_timestamp({arg}, '{fmt}')"
        return f"date_format({arg}, '{fmt}')"

    def gc_repl(m: "re.Match") -> str:
        arg, sep = m.group(1), m.group(2) if m.group(2) is not None else ","
        return f"concat_ws('{sep}', array_sort(collect_list({arg})))"

    out = _DATE_FORMAT_RE.sub(fmt_repl, sql)
    out = _GROUP_CONCAT_RE.sub(gc_repl, out)
    out = _SYSTEM_FN_RE.sub(lambda m: sys_lits[m.group(1).lower()], out)
    return out
