"""Dedup operator gates beyond the oracle: LSH recall vs exact Jaccard,
SimHash identity property."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from tests.conftest import SF_DIR


def test_minhash_lsh_recall(spark):
    d = Catalog(spark, SF_DIR).table("documents").filter(F.col("doc_id") < 250)
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(d, "doc_id", "text", 3, 0.2).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(d, "doc_id", "text", 32, 8, 3, 0.2).collect()
    }
    assert lsh <= exact, "LSH must be a subset (exact verification)"
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8 over {len(exact)} true pairs"


def test_simhash_identity_and_stability(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "a completely different sentence about spark engines")],
        "id long, text string",
    )
    pairs = simhash_pairs(df, "id", "text", max_hamming=0).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    h = df.select(simhash("text").alias("h")).collect()
    assert h[0].h == h[1].h != h[2].h
