"""M7 — similarity-based answer scoring (SURVEY §2.9).

Reference: log_analysis/evaluate_ai.py:24-25, 75-91 — predictions are
scored against canonical labels with ``SequenceMatcher(...).ratio() >
0.6`` and accuracy is the mean of that flag.

Spark-first: SequenceMatcher has no JVM analogue, so the ratio column is
the edit-distance normalization ``1 - levenshtein(a,b)/max(len)`` — the
standard distributed-friendly similarity with the same [0,1] range and
threshold contract (documented deviation: SequenceMatcher's ratio is
2M/(len_a+len_b) over matching blocks, which is Python-only and
row-at-a-time). ``levenshtein`` is a JVM built-in, so scoring a corpus is
one codegen'd pass, no Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def similarity_ratio(a: Column | str, b: Column | str) -> Column:
    """Case-insensitive edit-distance similarity in [0, 1]."""
    ca = F.lower(F.col(a) if isinstance(a, str) else a)
    cb = F.lower(F.col(b) if isinstance(b, str) else b)
    denom = F.greatest(F.length(ca), F.length(cb), F.lit(1))
    return 1 - F.levenshtein(ca, cb) / denom


def score_predictions(
    df: DataFrame,
    pred_col: str = "pred",
    truth_col: str = "truth",
    threshold: float = 0.6,
) -> DataFrame:
    """Per-row scoring: similarity + correct flag (ratio > threshold)."""
    sim = similarity_ratio(pred_col, truth_col)
    return df.withColumn("sim", sim).withColumn(
        "is_correct", F.col("sim") > threshold
    )


def eval_accuracy(
    scored: DataFrame, group_by: list[str] | None = None
) -> DataFrame:
    """Accuracy = mean(is_correct), optionally per group (the
    reference's final ``correct / len(results)``)."""
    agg = [
        F.avg(F.col("is_correct").cast("double")).alias("accuracy"),
        F.count(F.lit(1)).alias("n"),
    ]
    return scored.groupBy(*(group_by or [])).agg(*agg)
