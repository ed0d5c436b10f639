"""Boolean-mode MATCH...AGAINST grammar: parser + sequential-eval parity
with the reference's Pattern.Eval (pkg/fulltext/fulltext.go:381-510)."""

from __future__ import annotations

import math

import pytest

from matrixone_spark.operators import fulltext_pattern as fp
from matrixone_spark.operators.fulltext import FullTextIndex

DOCS = [
    (1, "apple banana cherry"),
    (2, "apple apple durian"),
    (3, "banana cherry"),
    (4, "cherry durian apple"),
    (5, "elderberry fig"),
    (6, "apple  banana"),  # two separators: phrase "apple banana" must NOT match
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return FullTextIndex.build(df, "doc_id", "text")


def docs(idx, pattern, algo="tfidf"):
    return sorted(r.doc_id for r in idx.match_pattern(pattern, algo=algo).collect())


def scores(idx, pattern, algo="tfidf"):
    return {r.doc_id: r.score for r in idx.match_pattern(pattern, algo=algo).collect()}


# ---------------------------------------------------------------- parser


def test_parse_ops_and_star():
    ps = fp.parse_boolean("+apple -ban* <x >y ~z (a b)")
    assert [p.op for p in ps] == [fp.PLUS, fp.MINUS, fp.LESSTHAN, fp.GREATERTHAN, fp.RANKLESS, fp.GROUP]
    assert ps[1].children[0].op == fp.STAR
    assert [c.op for c in ps[5].children] == [fp.TEXT, fp.TEXT]


def test_parse_phrase_positions():
    ps = fp.parse_boolean('"apple banana  cherry"')
    assert ps[0].op == fp.PHRASE
    kids = ps[0].children
    assert [(c.text, c.position) for c in kids] == [
        ("apple", 0), ("banana", 6), ("cherry", 14)]


def test_parse_rejects_double_operator():
    with pytest.raises(ValueError):
        fp.parse_boolean("+-apple")


# ----------------------------------------------------------------- eval


def test_required_forbidden(idx):
    assert docs(idx, "+apple -durian") == [1, 6]


def test_leading_minus_empties(idx):
    # Eval MINUS with nil result returns empty (fulltext.go:422-425)
    assert docs(idx, "-apple") == []
    assert docs(idx, "-apple banana") == [1, 3, 6]  # OR re-includes


def test_optional_before_plus_is_required(idx):
    # sequential EvalPlusPlus: 'banana +apple' AND-folds the running state,
    # so a doc with apple but no banana is excluded (order-sensitive!)
    assert docs(idx, "banana +apple") == [1, 6]
    # reversed order: optional banana only adds score (PlusOR keeps doc 2/4)
    assert docs(idx, "+apple banana") == [1, 2, 4, 6]


def test_or_reincludes_after_minus(idx):
    # no '+' anywhere → EvalOR re-includes docs the '-' dropped: doc 1
    # (apple+banana+cherry) comes back via cherry; doc 6 (apple+banana,
    # no cherry) stays dropped
    assert docs(idx, "apple -banana cherry") == [1, 2, 3, 4]


def test_wildcard_prefix(idx):
    assert docs(idx, "+ban*") == [1, 3, 6]
    assert docs(idx, "+e*") == [5]


def test_group_max_and_plus(idx):
    got = scores(idx, "+durian +(apple banana)")
    assert sorted(got) == [2, 4]
    n = len(DOCS)
    idf2 = lambda df: math.log10(n / df) ** 2  # noqa: E731
    # apple df=4, banana df=3, durian df=2; group combine = MAX of matched
    exp = round(idf2(2) + max(idf2(4), 0.0), 6)  # only apple matched in docs 2,4
    assert got[2] == pytest.approx(exp, abs=1e-6)


def test_bare_group_replaces_state(idx):
    # reference Eval case GROUP shadows the running result — a later bare
    # group discards everything before it
    assert docs(idx, "elderberry (banana)") == [1, 3, 6]


def test_weights(idx):
    n = len(DOCS)
    idf2 = lambda df: math.log10(n / df) ** 2  # noqa: E731
    got = scores(idx, "apple ~banana")
    # doc 1: apple (df=4) + (-1)*banana (df=3)
    assert got[1] == pytest.approx(round(idf2(4) - idf2(3), 6), abs=1e-6)
    got = scores(idx, "apple <cherry")
    assert got[1] == pytest.approx(round(idf2(4) + 0.9 * idf2(3), 6), abs=1e-6)
    got = scores(idx, "apple >cherry")
    assert got[1] == pytest.approx(round(idf2(4) + 1.1 * idf2(3), 6), abs=1e-6)


def test_boolean_tf_is_one(idx):
    # doc 2 has apple twice; boolean mode ignores occurrences (sql.go
    # GROUP BY doc_id) → same score as single-occurrence docs
    got = scores(idx, "+apple")
    assert got[1] == got[2] == got[4] == got[6]


def test_phrase_exact_separator(idx):
    # doc 6 'apple  banana' (two separators) must not match the
    # single-space pattern: anchor deltas are char-offset exact
    assert docs(idx, '"apple banana"') == [1]
    assert docs(idx, '"banana cherry"') == [1, 3]


def test_phrase_score(idx):
    n = len(DOCS)
    got = scores(idx, '"banana cherry"')
    exp = round(2 * math.log10(n / 2) ** 2, 6)  # df = 2 phrase docs, 2 kids
    assert got[1] == pytest.approx(exp, abs=1e-6) and got[3] == got[1]
