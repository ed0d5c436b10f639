"""LOAD DATA fidelity (external.go:616 option surface): SET clauses, inline
data, stage URLs, IGNORE N LINES, \\N nulls, gzip auto-detect."""

from __future__ import annotations

import gzip
import os

import pytest

from matrixone_spark.sources.external import load_data, resolve_stage_url

CSV = "id|name|val\n1|alpha|10\n2|\\N|20\n3|gamma|\\N\n"


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(CSV)
    gz = tmp_path / "in2.csv.gz"
    gz.write_bytes(gzip.compress(CSV.encode()))
    return tmp_path


def test_stage_url_resolution():
    stages = {"warehouse": "file:///data/wh", "s3stage": "s3a://bucket/pfx/"}
    assert resolve_stage_url("stage://warehouse/t/x.csv", stages) == "file:///data/wh/t/x.csv"
    assert resolve_stage_url("stage://s3stage/y", stages) == "s3a://bucket/pfx/y"
    assert resolve_stage_url("/plain/path.csv", stages) == "/plain/path.csv"
    with pytest.raises(ValueError):
        resolve_stage_url("stage://nope/x", stages)


def test_load_csv_nulls_and_set(spark, csv_dir):
    df = load_data(
        spark,
        str(csv_dir / "in.csv"),
        schema="id int, name string, val int",
        header=True,
        field_terminator="|",
        set_clauses={"val": "coalesce(val, 0) * 2", "tag": "upper(coalesce(name, 'missing'))"},
    )
    rows = {r.id: (r.name, r.val, r.tag) for r in df.collect()}
    assert rows[1] == ("alpha", 20, "ALPHA")
    assert rows[2] == (None, 40, "MISSING")  # \N parsed as NULL
    assert rows[3] == ("gamma", 0, "GAMMA")  # NULL val -> SET coalesce


def test_load_gzip_autodetect(spark, csv_dir):
    df = load_data(
        spark,
        str(csv_dir / "in2.csv.gz"),
        schema="id int, name string, val int",
        header=True,
        field_terminator="|",
    )
    assert df.count() == 3


def test_ignore_lines_per_file(spark, csv_dir):
    # no header flag; IGNORE 1 LINES drops the header row of EACH file
    df = load_data(
        spark,
        str(csv_dir / "in.csv"),
        schema="id int, name string, val int",
        header=False,
        field_terminator="|",
        ignore_lines=1,
    )
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]


def test_inline_data(spark):
    df = load_data(
        spark,
        inline="a,1\nb,2\nc,3",
        schema="k string, v int",
    )
    assert {(r.k, r.v) for r in df.collect()} == {("a", 1), ("b", 2), ("c", 3)}
    # inline + ignore_lines skips leading lines of the literal
    df2 = load_data(spark, inline="skip me\na,1", schema="k string, v int", ignore_lines=1)
    assert [(r.k, r.v) for r in df2.collect()] == [("a", 1)]


def test_inline_and_path_mutually_exclusive(spark):
    with pytest.raises(ValueError):
        load_data(spark)
    with pytest.raises(ValueError):
        load_data(spark, "/x.csv", inline="a,1")
