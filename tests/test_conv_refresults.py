"""Pure-Python gates for MySQL-exact CONV and the .result-file oracle.

conv goldens come from the reference BVT (function/func_conv.result,
distinct/distinct.result); RefResults parsing is gated on the actual
reference .result format (header ``➤``, row separator ``𝄀``, column
separator ``¦``, error lines without a header).
"""

from __future__ import annotations

from matrixone_spark.bvt_runner import RefResults
from matrixone_spark.functions.mysql import _conv_scalar as conv


def test_conv_reference_goldens():
    # func_conv.result goldens
    assert conv("+10", 10, 16) == "A"
    assert conv("-17", -10, 16) == "FFFFFFFFFFFFFFEF"
    assert conv("17", -10, 16) == "11"
    assert conv("-9223372036854775808", 10, 16) == "8000000000000000"
    assert conv("+9223372036854775808", 10, 16) == "8000000000000000"
    assert conv("-17", 10, 16) == "FFFFFFFFFFFFFFEF"
    assert conv("18446744073709551615", 10, 16) == "FFFFFFFFFFFFFFFF"
    assert conv("18446744073709551616", 10, 16) == "FFFFFFFFFFFFFFFF"  # + clamps
    assert conv("-18446744073709551615", 10, 16) == "1"  # - wraps
    assert conv("-18446744073709551616", 10, 16) == "0"
    assert conv("", 10, 16) is None
    assert conv("abc", 16, 10) == "2748"
    assert conv("10xyz", 10, 16) == "A"  # parse stops at first invalid digit
    assert conv("xyz", 10, 16) == "0"
    assert conv("18446744073709551615", 10, -10) == "-1"  # negative to_base = signed render
    assert conv("17", 10, -16) == "11"
    assert conv("a", 16, 2) == "1010"
    assert conv("10", 1, 10) is None  # base out of range
    assert conv("10", 10, 37) is None
    assert conv(None, 10, 16) is None


def test_refresults_rows_and_errors():
    text = (
        "select 1 + 1 as s;\n"
        "➤ s[4,32,0]  𝄀\n"
        "2\n"
        "select a, b from t\n"
        "order by a;\n"
        "➤ a[4,32,0]  ¦  b[4,32,0]  𝄀\n"
        "1  ¦  9  𝄀\n"
        "2  ¦  9\n"
        "select bad();\n"
        "invalid input: no such function\n"
        "select '' as e;\n"
        "➤ e[1,255,0]  𝄀\n"
        "\n"
    )
    ref = RefResults(text)
    assert ref.claim("select 1 + 1 as s") == ("rows", [["2"]])
    # multi-line echo matches the single-line statement
    assert ref.claim("select a, b from t order by a") == ("rows", [["1", "9"], ["2", "9"]])
    assert ref.claim("select bad()") == ("error", "invalid input: no such function")
    # a blank data row is a single empty-string cell
    assert ref.claim("select '' as e") == ("rows", [[""]])
    # unknown statement → None, cursor not wedged
    assert ref.claim("select never_ran()") is None


def test_refresults_sequential_claims():
    text = (
        "select x from v;\n"
        "➤ x[4,32,0]  𝄀\n"
        "1\n"
        "select x from v;\n"
        "➤ x[4,32,0]  𝄀\n"
        "1  𝄀\n"
        "2\n"
    )
    ref = RefResults(text)
    assert ref.claim("select x from v") == ("rows", [["1"]])
    # the second claim of the same text resolves to the *second* occurrence
    assert ref.claim("select x from v") == ("rows", [["1"], ["2"]])
