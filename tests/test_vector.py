"""Vector operator tests beyond the oracle gate: IVF recall vs exact KNN
(reference defines approx-index correctness as recall, SURVEY §7 'vector
index recall parity')."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.operators.knn import IvfIndex, knn_exact
from tests.conftest import SF_DIR

QVEC = [float(i % 7) / 7.0 for i in range(64)]


def test_ivf_recall_vs_exact(spark):
    e = Catalog(spark, SF_DIR).table("embeddings")
    exact_ids = {r.vec_id for r in knn_exact(e, "embedding", QVEC, 10, "vec_id").collect()}
    idx = IvfIndex.build(e, "embedding", "vec_id", n_centroids=8)
    approx_ids = {r.vec_id for r in idx.search(QVEC, 10, nprobe=3).collect()}
    recall = len(exact_ids & approx_ids) / len(exact_ids)
    assert recall >= 0.9, f"IVF recall {recall} below 0.9 (exact={exact_ids}, approx={approx_ids})"


def test_ivf_full_probe_equals_exact(spark):
    """nprobe = n_centroids must reproduce exact KNN precisely."""
    e = Catalog(spark, SF_DIR).table("embeddings")
    exact_ids = [r.vec_id for r in knn_exact(e, "embedding", QVEC, 5, "vec_id").collect()]
    idx = IvfIndex.build(e, "embedding", "vec_id", n_centroids=4)
    approx_ids = [r.vec_id for r in idx.search(QVEC, 5, nprobe=4).collect()]
    assert exact_ids == approx_ids


def test_knn_exact_plan_has_no_shuffle_before_topk(spark):
    """ProductL2 parity must plan as TakeOrderedAndProject, not sort+shuffle."""
    e = Catalog(spark, SF_DIR).table("embeddings")
    plan = knn_exact(e, "embedding", QVEC, 10, "vec_id")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
