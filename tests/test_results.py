"""ResultStore (save_query_result/result_scan) + SnapshotStore analogues."""

import pytest

from matrixone_spark.catalog import Catalog
from matrixone_spark.results import ResultStore, SnapshotStore

SF_DIR = "/root/testdata/sf0.001"


def test_result_scan_roundtrip(spark, tmp_path):
    store = ResultStore(spark, str(tmp_path / "results"))
    nation = Catalog(spark, SF_DIR).table("nation").select("n_nationkey", "n_name")
    qid = store.save(nation)
    assert store.last_query_id() == qid
    back = store.result_scan().orderBy("n_nationkey").collect()
    orig = nation.orderBy("n_nationkey").collect()
    assert back == orig
    # explicit id works too, unknown id raises
    assert store.result_scan(qid).count() == len(orig)
    with pytest.raises(FileNotFoundError):
        store.result_scan("deadbeef")


def test_snapshot_immutable_copy(spark, tmp_path):
    snaps = SnapshotStore(spark, str(tmp_path / "snaps"))
    region = Catalog(spark, SF_DIR).table("region")
    snaps.create("v1", "region", region)
    assert snaps.list() == ["v1"]
    assert snaps.tables("v1") == ["region"]
    got = snaps.read("v1", "region").orderBy("r_regionkey").collect()
    assert got == region.orderBy("r_regionkey").collect()
    # snapshots are immutable: re-creating the same name/table fails
    with pytest.raises(Exception):
        snaps.create("v1", "region", region)
    snaps.drop("v1")
    assert snaps.list() == []
