"""r13 regex-count text-scoring variants: the *_rx forms in
functions/text.py must be bit-equal to the token-array *_t forms they
replace in the scan-stage queries, and the rewritten queries' scan stages
must stay free of CodegenFallback higher-order functions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import matrixone_spark.functions.text as T
from matrixone_spark.queries import load_all
from tests.conftest import SF_DIR

# unicode, empties, digits, consecutive stopwords, boundary punctuation,
# null, case-folding expansions (İ lowers to i + combining dot)
NASTY = [
    "", "the the the", "a", "and123 and 123and the-a.of,is",
    "der die und ein ist", "el la de y es", "le la et un est",
    "The A OF And IS", "  punct!!! ###  ", "mixé café naïve",
    "İstanbul DER Üben", "word " * 30, "supercalifragilistic " * 25,
    "a1b2c3 x y z the of and is a", "la la la", None,
    "0 1 2 3 4 5 6 7 8 9 the", "...is...", "is", "thèse the",
    "of is", "is is", "a a a and", "est--est", "y\ty\ny",
]


def test_rx_variants_equal_array_forms(spark):
    df = spark.createDataFrame([(t,) for t in NASTY], "text string")
    toks = T.tokenize("text")
    rows = df.select(
        F.size(toks).alias("old_n"),
        T.token_count_rx("text").alias("new_n"),
        F.aggregate(toks, F.lit(0.0), lambda a, x: a + F.length(x)).alias("old_sum"),
        T.sum_token_len_rx("text").cast("double").alias("new_sum"),
        T.avg_token_len_t(toks).alias("old_avg"),
        T.avg_token_len_rx("text").alias("new_avg"),
        *[T.lang_score_t(toks, lang).alias(f"old_{lang}") for lang in sorted(T.DEFAULT_STOPWORDS)],
        *[T.lang_score_rx("text", lang).alias(f"new_{lang}") for lang in sorted(T.DEFAULT_STOPWORDS)],
        T.lang_guess_t(toks).alias("old_guess"),
        T.lang_guess_rx("text").alias("new_guess"),
        T.quality_score_t(toks, "text").alias("old_q"),
        T.quality_score_rx("text").alias("new_q"),
    ).collect()
    for r in rows:
        assert r.old_n == r.new_n, r
        if r.old_sum is None:
            assert r.new_sum is None, r
        else:
            assert r.old_sum == r.new_sum, r
        assert (
            r.old_avg == r.new_avg
            or (math.isnan(r.old_avg) and math.isnan(r.new_avg))
        ), r
        for lang in sorted(T.DEFAULT_STOPWORDS):
            assert r[f"old_{lang}"] == r[f"new_{lang}"], (lang, r)
        assert r.old_guess == r.new_guess, r
        assert r.old_q == r.new_q, r


def test_pipeline_scan_stage_codegen(spark):
    """The pushed-down quality/langid Filter must contain no lambdafunction
    (CodegenFallback) — the only higher-order expressions left in the plan
    are the survivors-only fingerprint projection."""
    df = load_all()["pipeline_clean_corpus"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scoring predicate (regexp_count desugars to size(regexp_extract_all))
    # must sit in a `*(n) Filter` — i.e. INSIDE whole-stage codegen, which is
    # impossible if any CodegenFallback higher-order function leaked back in
    for line in plan.splitlines():
        if "Filter" in line and "regexp_extract_all" in line:
            assert line.lstrip().lstrip("+-: ").startswith("*("), line[:300]
            break
    else:
        raise AssertionError("no regex scoring Filter found:\n" + plan[:2000])


def test_token_stats_no_higher_order_functions(spark):
    plan = (
        load_all()["text_token_stats"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lambdafunction" not in plan, plan[:2000]


def test_sql_string_dispatch_equals_column_path(spark):
    """r13 driver-work conversions: every function that dispatches a plain
    column NAME to a one-call F.expr SQL string must stay bit-equal to its
    Column-API fallback path (same expression tree, just parsed JVM-side)."""
    from matrixone_spark.operators.dedup import word_shingles

    df = spark.createDataFrame([(t,) for t in NASTY], "text string")
    c = F.col("text")
    pairs = [
        ("tokenize", T.tokenize("text"), T.tokenize(c)),
        ("shingles", word_shingles("text", 3), word_shingles(c, 3)),
        ("fingerprint", T.fingerprint("text"), T.fingerprint(c)),
        ("token_count", T.token_count_rx("text"), T.token_count_rx(c)),
        ("sum_len", T.sum_token_len_rx("text"), T.sum_token_len_rx(c)),
        ("avg_len", T.avg_token_len_rx("text"), T.avg_token_len_rx(c)),
        ("lang_en", T.lang_score_rx("text", "en"), T.lang_score_rx(c, "en")),
        ("guess", T.lang_guess_rx("text"), T.lang_guess_rx(c)),
        ("quality", T.quality_score_rx("text"), T.quality_score_rx(c)),
    ]
    cols = []
    for name, s_form, c_form in pairs:
        cols.append(s_form.alias(f"s_{name}"))
        cols.append(c_form.alias(f"c_{name}"))
    for r in df.select(*cols).collect():
        for name, _, _ in pairs:
            assert r[f"s_{name}"] == r[f"c_{name}"], (name, r)
