"""Driver-gate mirror: every registered query with an oracle must hash-match
DuckDB on the same parquet tables. Runs at sf0.001 by default (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to mirror the driver exactly."""

from __future__ import annotations

import pytest

from matrixone_spark.queries import load_all
from tests.conftest import assert_matches_oracle

_REG = load_all()
_WITH_ORACLE = sorted(n for n, q in _REG.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _REG.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, name):
    assert_matches_oracle(spark, _REG[name])


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    from tests.conftest import SF_DIR

    df = _REG[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
