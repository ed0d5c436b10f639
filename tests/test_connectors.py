"""Connector builder assertions without connector jars (r3 verdict ask #9).

The reference scans MongoDB collections (pkg/sql/colexec/mongodbscan/
mongoscan.go:150) and Iceberg tables (pkg/sql/compile/
compile_iceberg_scan.go); our Spark-first mapping is the DataSource-V2
builder in sources/external.py read_connector. The real connector jars are
absent in this container, so these tests register PYTHON DataSource
implementations under the same format names — proving read_connector emits
``format(kind)`` + every option through the DSv2 API (the registered source
receives them verbatim), which is exactly the contract a real
mongo-spark-connector / iceberg-runtime jar would see on a cluster."""

from __future__ import annotations

import pytest

from matrixone_spark.sources.external import read_connector


def _register_fake(spark, fmt: str):
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class FakeReader(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def read(self, partition):
            # surface the received options as rows: (key, value)
            for k in sorted(self.options):
                yield (str(k), str(self.options[k]))

    class FakeSource(DataSource):
        @classmethod
        def name(cls):
            return fmt

        def schema(self):
            return "opt_key string, opt_value string"

        def reader(self, schema):
            return FakeReader(self.options)

    spark.dataSource.register(FakeSource)


def test_mongodb_builder_emits_format_and_options(spark):
    _register_fake(spark, "mongodb")
    opts = {"connection.uri": "mongodb://example:27017", "database": "db1", "collection": "events"}
    df = read_connector(spark, "mongodb", opts)
    got = {r["opt_key"]: r["opt_value"] for r in df.collect()}
    # Spark lower-cases option keys in the DSv2 CaseInsensitiveMap
    got_l = {k.lower(): v for k, v in got.items()}
    for k, v in opts.items():
        assert got_l.get(k.lower()) == v, (k, got)


def test_iceberg_builder_emits_format_and_options(spark):
    _register_fake(spark, "iceberg")
    opts = {"path": "s3://bucket/warehouse/tbl", "snapshot-id": "123456"}
    df = read_connector(spark, "iceberg", opts)
    got = {r["opt_key"].lower(): r["opt_value"] for r in df.collect()}
    for k, v in opts.items():
        assert got.get(k.lower()) == v, (k, got)


def test_unknown_connector_rejected(spark):
    with pytest.raises(ValueError, match="unknown connector"):
        read_connector(spark, "cassandra", {})


def test_absent_jar_names_package(spark):
    # a format with no implementation anywhere must raise the actionable
    # error naming the --packages coordinate (sources/external.py:235)
    fresh = spark.newSession()
    with pytest.raises(NotImplementedError, match="mongo-spark-connector"):
        read_connector(fresh, "mongodb", {"database": "d"})
