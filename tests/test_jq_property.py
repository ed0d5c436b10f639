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


@settings(max_examples=60, deadline=None)
@given(arr=st.lists(st.integers(-100, 100), min_size=0, max_size=6), n=st.integers(-50, 50))
def test_select_map_arith_match_python(arr, n):
    """select/map/arithmetic vs straightforward Python over random ints."""
    s = _dumps({"a": arr})
    got = _jq_run(s, f".a | map(. * 2 + 1)")
    assert json.loads(got) == [x * 2 + 1 for x in arr]
    picked = _jq_run(s, f".a[] | select(. > {n})")
    want = [x for x in arr if x > n]
    if not want:
        assert picked == ""
    else:
        assert [json.loads(x) for x in picked.split("\n")] == want
    flags = _jq_run(s, ".a | map(if . < 0 then -1 else 1 end)")
    assert json.loads(flags) == [-1 if x < 0 else 1 for x in arr]


def test_jq_extended_constructs():
    doc = _dumps({"items": [{"p": 3, "q": 2}, {"p": 10, "q": 0}, {"p": 7, "q": 5}],
                  "tag": "x", "lim": 5})
    # select over object stream + field arithmetic
    out = _jq_run(doc, '.items[] | select(.q > 0) | .p * .q')
    assert [json.loads(x) for x in out.split("\n")] == [6, 35]
    # map + add (sum of products)
    assert json.loads(_jq_run(doc, '.items | map(.p * .q) | add')) == 41
    # comparisons use jq total order; strings compare lexically
    assert json.loads(_jq_run(doc, '.tag == "x"')) is True
    assert json.loads(_jq_run(doc, '.tag < "y"')) is True
    # if/then/else with missing else = identity
    assert json.loads(_jq_run(doc, 'if .lim > 3 then "big" else "small" end')) == "big"
    assert json.loads(_jq_run(_dumps(7), 'if . > 99 then 0 end')) == 7
    # not / floor / abs / % / unary minus
    assert json.loads(_jq_run(_dumps(None), 'not')) is True
    assert json.loads(_jq_run(_dumps(3.7), 'floor')) == 3
    assert json.loads(_jq_run(_dumps(-4), 'abs')) == 4
    assert json.loads(_jq_run(_dumps(17), '. % 5')) == 2
    assert json.loads(_jq_run(_dumps(17), '-. + 20')) == 3
    # object + object merges, array + array concats, string + string concats
    assert json.loads(_jq_run(_dumps({"x": {"a": 1}, "y": {"b": 2}}), '.x + .y | keys')) == ["a", "b"]
    assert json.loads(_jq_run(_dumps({"x": [1, 2], "y": [3]}), '.x + .y')) == [1, 2, 3]
    assert json.loads(_jq_run(_dumps({"x": "ab", "y": "cd"}), '.x + .y')) == "abcd"
    # errors still raise (try_jq gives NULL at the UDF layer)
    for bad in ('.a +', 'map(.x)', 'select(', '.x ^ 2', 'floor extra'):
        try:
            _jq_run(_dumps({"a": 1}), bad)
            raised = False
        except ValueError:
            raised = True
        assert raised, bad


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
