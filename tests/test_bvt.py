"""BVT-surface tests: harvest real reference .sql files end-to-end and gate
the curated battery against the DuckDB oracle.

The reference's user surface is MySQL SQL text (959 BVT files); these tests
prove (a) the harvester parses a broad slice of those files, (b) the
harvested constant SELECTs run through Engine.mysql_sql (the dialect
translator), and (c) the embedded battery still derives from the reference
tree and matches DuckDB exactly (the driver gate replays the same compare).
"""

from __future__ import annotations

import os

import pytest

from matrixone_spark.bvt_harvest import (
    harvest_constant_selects,
    is_constant_select,
    select_exprs,
    split_statements,
)
from matrixone_spark.mysql_dialect import translate

_REF = "/root/reference/test/distributed/cases"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference BVT tree not present"
)


def test_split_statements_quote_aware():
    stmts = split_statements("select 'a;b'; select 2;\nselect ';'")
    assert stmts == ["select 'a;b'", "select 2", "select ';'"]


def test_constant_select_filter():
    assert is_constant_select("select abs(-10)")
    assert is_constant_select("SELECT greatest(1,2), least(3,4)")
    assert not is_constant_select("select a from t")
    assert not is_constant_select("select rand()")
    assert not is_constant_select("select (select 1)")
    assert not is_constant_select("select @v")
    # FROM inside a string literal must NOT disqualify
    assert is_constant_select("select length('from t')")


def test_select_exprs_top_level_commas():
    assert select_exprs("select greatest(1,2), 'a,b', least(3,4)") == [
        "greatest(1,2)",
        "'a,b'",
        "least(3,4)",
    ]


@needs_reference
def test_harvest_parses_many_reference_files():
    """End-to-end parse over the real BVT tree: dozens of files must yield
    constant selects (the battery's raw material)."""
    files = harvest_constant_selects("function/*.sql")
    files.update(harvest_constant_selects("function/*.test"))
    assert len(files) >= 40, f"only {len(files)} files yielded constant selects"
    total = sum(len(v) for v in files.values())
    assert total >= 1000, f"only {total} constant selects harvested"


@needs_reference
def test_harvested_statements_run_on_spark(spark):
    """A sample of freshly-harvested statements (not the curated embeds) must
    translate and execute on Spark — the translator handles raw BVT text."""
    files = harvest_constant_selects("function/func_ascii.sql")
    stmts = [s for v in files.values() for s in v][:20]
    assert stmts, "harvest returned nothing for func_ascii.sql"
    ok = 0
    for s in stmts:
        try:
            spark.sql(translate(s)).collect()
            ok += 1
        except Exception:
            pass
    assert ok >= len(stmts) * 0.7, f"only {ok}/{len(stmts)} harvested statements ran"


@needs_reference
def test_battery_expressions_still_in_reference():
    """Every embedded battery expression must appear in its claimed source
    file — the battery derives from real reference content."""
    from matrixone_spark.queries.bvt import BVT_NUMERIC, BVT_STRING

    cache: "dict[str, str]" = {}
    missing = []
    for src, expr in (BVT_NUMERIC + BVT_STRING)[:50]:
        if src not in cache:
            with open(os.path.join(_REF, src), encoding="utf-8", errors="replace") as f:
                cache[src] = f.read().lower()
        if expr.lower() not in cache[src]:
            missing.append((src, expr))
    assert not missing, f"battery entries not found in reference sources: {missing[:5]}"


def test_battery_matches_oracle(spark):
    from matrixone_spark.queries import load_all
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, load_all()["bvt_select_battery"])
