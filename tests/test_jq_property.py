"""Property tests for the mini-jq evaluator (func_builtin_jq.go analogue).

Pure-Python (no Spark session) — exercises the evaluator the jq/try_jq
pandas UDFs wrap, against randomly generated JSON documents.
"""

import json

from hypothesis import given, settings, strategies as st

from matrixone_spark.functions.json_fns import _dumps, _jq_run

_keys = st.sampled_from(["a", "b", "c", "k1", "k2"])
_scalars = st.one_of(
    st.integers(-1000, 1000),
    st.text(alphabet="xyz", max_size=5),
    st.booleans(),
    st.none(),
)
_json_vals = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(_keys, inner, max_size=4),
    ),
    max_leaves=10,
)
_docs = st.dictionaries(_keys, _json_vals, min_size=0, max_size=5)


@settings(max_examples=60, deadline=None)
@given(doc=_docs, key=_keys)
def test_field_access_matches_dict_get(doc, key):
    assert _jq_run(_dumps(doc), f".{key}") == _dumps(doc.get(key))


@settings(max_examples=60, deadline=None)
@given(doc=_docs)
def test_identity_and_keys(doc):
    s = _dumps(doc)
    assert json.loads(_jq_run(s, ".")) == doc
    assert json.loads(_jq_run(s, "keys")) == sorted(doc.keys())
    assert json.loads(_jq_run(s, "length")) == len(doc)


@settings(max_examples=60, deadline=None)
@given(arr=st.lists(st.integers(-100, 100), min_size=0, max_size=6))
def test_array_ops(arr):
    s = _dumps({"a": arr})
    assert json.loads(_jq_run(s, ".a | length")) == len(arr)
    if arr:
        assert json.loads(_jq_run(s, ".a | add")) == sum(arr)
        got = _jq_run(s, ".a[]")
        assert [json.loads(x) for x in got.split("\n")] == arr
    for i in range(len(arr) + 2):
        assert json.loads(_jq_run(s, f".a[{i}]")) == (arr[i] if i < len(arr) else None)


@settings(max_examples=40, deadline=None)
@given(doc=_docs, k1=_keys, k2=_keys)
def test_two_segment_path(doc, k1, k2):
    inner = doc.get(k1)
    s = _dumps(doc)
    if inner is None or isinstance(inner, dict):
        expected = None if inner is None else inner.get(k2)
        assert _jq_run(s, f".{k1}.{k2}") == _dumps(expected)
    else:
        # field access on a non-object is a jq error -> try semantics = None
        try:
            _jq_run(s, f".{k1}.{k2}")
            raised = False
        except ValueError:
            raised = True
        assert raised
