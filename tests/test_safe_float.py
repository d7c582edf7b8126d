"""Property test: the safe_float column expression matches the reference's
Python semantics (tools/storage.py:144-174) token for token."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_loganalyzer_spark.functions import safe_float, safe_float_py

TOKENS = st.sampled_from(
    [
        "1", "2.5", "-1", "-1.0", "0", "inf", "nan", "INF", "NaN", "Inf",
        "1e3", "-7.25", "abc", "", "12 34 -1", "1e308", "100", "0.001",
        "-inf", "3,4", "1.79769e+308",
        # edge spellings verified identical between float() and try_cast
        "infinity", "-infinity", "+inf", "Infinity", "1e400", "-1e400",
        "5.", ".5", "+5", "1E3", "9e999",
    ]
)


@st.composite
def value_strings(draw):
    toks = draw(st.lists(TOKENS, min_size=0, max_size=5))
    return " ".join(toks)


@settings(max_examples=30, deadline=None)
@given(st.lists(value_strings(), min_size=1, max_size=20))
def test_safe_float_matches_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r[0] for r in df.select(safe_float("v")).collect()]
    want = [safe_float_py(v) for v in values]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if w is None or g is None:
            assert g == w, (g, w, values)
        elif math.isnan(w):
            assert math.isnan(g)
        else:
            assert g == w, (g, w, values)


def test_safe_float_reference_cases(spark):
    # the documented idiosyncrasies, pinned
    cases = {
        "12 34 -1": 34.0,          # token max, sentinel dropped
        "-1": -1.0,                # sole sentinel kept
        "-1 -1": -1.0,             # all sentinels kept
        "inf 5": 5.0,              # literal inf skipped as a token
        "inf": float("inf"),       # ...but the whole-string fallback parses it
        "1e309": float("inf"),     # overflow-inf KEPT (matches float('1e309'))
        "abc": None,
        "3.5": 3.5,
        "": None,
        "0 -1": 0.0,
        # ADVICE-flagged edge cases, pinned explicitly
        "-inf": float("-inf"),        # token parses (only literal inf/nan skip)
        "infinity": float("inf"),     # not in the skip set, parses to +inf
        "-infinity": float("-inf"),
        "1e400": float("inf"),        # overflow -> +inf, kept
        "-1e400": float("-inf"),
        "-1 5": 5.0,                  # sentinel dropped when others exist
        "5 -1": 5.0,
        "-1.0": -1.0,                 # lone sentinel (float form) kept
        "inf -1": -1.0,               # inf skipped -> only sentinel -> kept
        "nan nan": None,              # all tokens skipped -> fallback float('nan nan') fails
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = dict(zip(cases, [r[0] for r in df.select(safe_float("v")).collect()]))
    for k, want in cases.items():
        assert got[k] == want or (got[k] is None and want is None), (k, got[k], want)
