"""``safe_float`` — the reference's idiosyncratic numeric coercion, as a
native (JVM-side, codegen-able) column expression.

Semantics (reference: tools/storage.py:144-174, mirrored at
tools/anomaly_detector.py:169-184):

1. Split the string on whitespace.
2. Per token: skip literal ``inf``/``nan`` (case-insensitive, exact match —
   ``-inf``/``infinity`` are NOT skipped and parse to infinities, and a
   decimal overflow like ``1e400`` parses to +inf and is kept);
   otherwise keep the token if it parses as a double.
3. If any tokens parsed: drop sentinel ``-1`` values *when other values
   exist*; return the max of what remains.
4. If nothing parsed: return NULL.

Implemented with array higher-order functions — no Python UDF, so it stays
inside whole-stage codegen and runs at full speed over 100 TB.

Known token-level deviations from bare ``float()`` (both verified against
Spark 4's try_cast and judged acceptable for trace-log payloads):
- Python's numeric-literal underscores (``float("1_0") == 10.0``) are not
  SQL-parseable; such tokens are treated as unparseable.
- Signed NaN tokens (``+nan``/``-nan``) parse to NaN in Python, where the
  reference's ``max(nums)`` over a NaN is ORDER-DEPENDENT (ill-defined);
  we drop NaN tokens, which equals the reference whenever a non-NaN token
  precedes the NaN.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_float(col: Column | str) -> Column:
    """Column expression matching the reference's ``safe_float``."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    parsed = F.filter(
        F.transform(
            toks,
            lambda t: F.when(~F.lower(t).isin("inf", "nan"), t.try_cast("double")),
        ),
        lambda x: x.isNotNull() & ~F.isnan(x),
    )
    non_sentinel = F.filter(parsed, lambda x: x != F.lit(-1.0))
    # step 4 fallback: float(whole_string) — which (unlike Spark's cast)
    # accepts python-float spellings of inf/nan
    low = F.lower(F.trim(c))
    fallback = (
        F.when(low.isin("inf", "+inf", "infinity", "+infinity"), F.lit(float("inf")))
        .when(low.isin("-inf", "-infinity"), F.lit(float("-inf")))
        .when(low.isin("nan", "+nan", "-nan"), F.lit(float("nan")))
        .otherwise(F.trim(c).try_cast("double"))
    )
    return F.when(
        F.size(parsed) > 0,
        F.when(F.size(non_sentinel) > 0, F.array_max(non_sentinel)).otherwise(
            F.array_max(parsed)
        ),
    ).otherwise(fallback)


def safe_float_py(v) -> float | None:
    """Pure-Python reimplementation of the same contract, used only in
    property tests to cross-check the column expression (and as the
    documented spec — byte-for-byte what the reference computes)."""
    if v is None:
        return None
    if isinstance(v, (int, float)):
        try:
            return float(v)
        except Exception:
            return None
    if isinstance(v, str):
        nums = []
        for p in v.split():
            if p.lower() in {"inf", "nan"}:
                continue
            try:
                nums.append(float(p))
            except Exception:
                continue
        if nums:
            cleaned = [n for n in nums if n != -1]
            if cleaned:
                nums = cleaned
            return max(nums)
        try:
            return float(v)
        except Exception:
            return None
    return None
