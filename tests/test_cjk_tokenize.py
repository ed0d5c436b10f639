"""CJK tokenizer parity gates (r4 verdict ask #8).

Reference: pkg/monlp/tokenizer/simple.go (latin/cjk state machine,
outputCJK overlapping rune trigrams), pkg/fulltext/fulltext.go:919
ParsePatternInNLMode, jieba_test.go's example sentences."""

from __future__ import annotations

import pytest

from matrixone_spark.functions.text import tokenize, tokenize_mixed_py

CASES = [
    "我来到北京清华大学 Hello World3",
    "苹果",
    "ABC中文字符def, 你好。",
    "mixed 混合 text 文本处理 engine",
    "numbers123字符456tail",
    "  punctuation!!!只有，标点。^^  ",
    "ひらがなとカタカナのテキスト",
    "한국어 텍스트 처리",
    "",
]


def test_trigram_semantics():
    # outputCJK: 3-rune window sliding by 1; short runs emit whole run
    assert tokenize_mixed_py("苹果") == ["苹果"]
    assert tokenize_mixed_py("苹果香") == ["苹果香"]
    assert tokenize_mixed_py("苹果香蕉") == ["苹果香", "果香蕉"]
    # latin lowercased, digits glued (simple.go latinToken)
    assert tokenize_mixed_py("Hello123 World") == ["hello123", "world"]
    # CJK punctuation breaks runs (isBreakerRune: unicode.IsPunct)
    assert tokenize_mixed_py("你好，世界啊") == ["你好", "世界啊"]


def test_spark_column_matches_python_mirror(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    got = [r[0] for r in df.select(tokenize("s", mode="mixed")).collect()]
    for c, g in zip(CASES, got):
        assert g == tokenize_mixed_py(c), c


def test_fulltext_cjk_oracle(spark, registry):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, registry["fulltext_cjk"])


def test_mixed_mode_phrase_rejected(spark, registry):
    from matrixone_spark.catalog import Catalog
    from matrixone_spark.operators.fulltext import FullTextIndex
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    d = Catalog(spark, SF_DIR).table("documents").limit(20)
    idx = FullTextIndex.build(d, "doc_id", "text", mode="mixed")
    with pytest.raises(ValueError, match="positional"):
        idx.match_pattern('"some phrase"')
