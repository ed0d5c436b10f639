"""Deduplication coverage over the documents table (LLM-pipeline operators).

Exact + n-gram-Jaccard are oracle-gated (deterministic, SQL-expressible);
MinHash-LSH and SimHash are rows-only with pytest recall/property gates
(tests/test_dedup.py) — their hash functions (Spark xxhash64) have no DuckDB
equivalent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixone_spark.catalog import Catalog
from matrixone_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from matrixone_spark.queries import register

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


@register(
    "dedup_exact_groups",
    oracle="""
SELECT md5(text) AS digest, COUNT(*) AS n_copies, MIN(doc_id) AS keeper
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) > 1
""",
    tags=("dedup",),
    doc="Exact duplicate groups by content digest (FuzzyFilter exact path at batch scale, fuzzyfilter/filter.go:201): hash-groupBy, keep lowest id.",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    return (
        d.groupBy(F.md5("text").alias("digest"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_copies") > 1)
    )


@register(
    "dedup_exact_keep",
    oracle="""
SELECT COUNT(*) AS kept FROM (
  SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
""",
    tags=("dedup",),
    doc="Exact dedup keep-count (operators/dedup.py exact_dedup: window row_number over digest).",
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    return exact_dedup(d, "text", "doc_id").agg(F.count(F.lit(1)).alias("kept"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents WHERE doc_id < 250
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) g
  WHERE len(t) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.2
""",
    tags=("dedup", "bench"),
    doc="n-gram Jaccard near-dup pairs (3-word shingles, j ≥ 0.2): explode → shingle-join → pair counts. The exact core that LSH approximates.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 250)
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)


@register(
    "dedup_minhash_lsh",
    oracle=None,  # LSH bucketing uses Spark xxhash64 — recall gated in tests/test_dedup.py
    tags=("dedup", "approx", "bench"),
    doc="MinHash(32 perms)+LSH(8 bands) candidate pairs with exact-Jaccard verification (j ≥ 0.2). Precision exact by construction; recall vs dedup_ngram_jaccard pytest-gated ≥0.8.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 250)
    return minhash_lsh_pairs(d, "doc_id", "text", num_perm=32, bands=8, threshold=0.2)


@register(
    "dedup_simhash",
    oracle=None,  # Spark-hash-specific signatures
    tags=("dedup", "approx"),
    doc="SimHash-64 near-dup pairs (Hamming ≤ 10, 16-bit prefix blocking); property-tested (identical text → distance 0).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 150)
    return simhash_pairs(d, "doc_id", "text", max_hamming=10)


@register(
    "dedup_components",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents WHERE doc_id < 250
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) g
  WHERE len(t) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.2
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(node, lab) AS (
  SELECT doc_id, doc_id FROM toks
  UNION
  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, MIN(lab) AS component FROM reach GROUP BY node
""",
    tags=("dedup",),
    doc=(
        "Near-dup clustering: ngram-Jaccard pairs (j ≥ 0.2) → connected "
        "components by min-label propagation (operators/dedup.py "
        "connected_components) — dedup PAIRS become canonical GROUPS "
        "(component = smallest reachable doc_id; keep component == doc_id). "
        "Oracle: DuckDB recursive-CTE reachability over the same edge set."
    ),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from matrixone_spark.operators.dedup import connected_components

    d = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 250)
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)
    nodes = d.select(F.col("doc_id").alias("node"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return connected_components(nodes, edges).select(
        F.col("node").alias("doc_id"), "component"
    )
