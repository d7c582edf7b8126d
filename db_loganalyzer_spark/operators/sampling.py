"""Deterministic sampling / split assignment for training-data pipelines.

Train/val/test membership must be a pure function of the document id —
reproducible across runs, engines, and re-partitions; never
``df.sample()`` (seed + partitioning dependent) for split assignment.

The hash is Knuth multiplicative hashing over exact BIGINT arithmetic
(id * 2654435761 mod 2^32), restatable verbatim in any SQL engine —
unlike xxhash64/sha2, whose availability differs across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth's multiplicative constant
M32 = 4294967296


def hash_bucket(c: Column | str, n_buckets: int = 100, salt: int = 0) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer id."""
    col = F.col(c) if isinstance(c, str) else c
    return ((col.cast("long") * KNUTH + salt) % M32) % n_buckets


def assign_split(
    c: Column | str,
    splits: list[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
    salt: int = 0,
) -> Column:
    """Split label from cumulative percentage thresholds over the hash
    bucket. ``splits`` is (name, percent) with percents summing to 100."""
    total = sum(p for _, p in splits)
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    b = hash_bucket(c, 100, salt)
    expr = None
    acc = 0
    for name, pct in splits:
        acc += pct
        cond = b < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: list[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
    salt: int = 0,
) -> DataFrame:
    """Attach a deterministic ``split`` column. Pure projection — a 100 TB
    split pass is scan-bound; downstream writers partitionBy('split')."""
    return df.withColumn("split", assign_split(id_col, splits, salt))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: int = 0,
    denominator: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum sampling — the dataset-MIXING primitive:
    keep each row iff ``hash_bucket(id) < rate[stratum] * denominator``,
    so "30% of web, 100% of books, 5% of logs" is a pure projection over
    the corpus (scan-bound at 100 TB, no shuffle) and membership is a
    stable function of (id, salt): re-runs, engine ports, and upstream
    re-partitions all select the SAME documents. Rates are exact at
    1/denominator resolution; ``df.sample()`` can do none of this."""
    col = F.col(strata_col)
    thresh = None
    for stratum, rate in sorted(rates.items()):
        t = F.lit(int(rate * denominator))
        thresh = F.when(col == stratum, t) if thresh is None else thresh.when(col == stratum, t)
    thresh = thresh.otherwise(F.lit(int(default_rate * denominator)))
    return df.filter(hash_bucket(id_col, denominator, salt) < thresh)


def split_sizes(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: list[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
    salt: int = 0,
) -> DataFrame:
    """Per-split document counts (the audit view of hash_split)."""
    return (
        hash_split(df, id_col, splits, salt)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    by: list[str] = ("source",),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous greedy sequence packing for LLM training batches: within
    each ``by`` shard, documents are taken in ``id_col`` order and packed
    into bins of ~``budget_tokens`` whitespace tokens. A document joins the
    current pack whenever the pack has ANY room left (overflow-tolerant
    greedy — the standard contiguous-fill strategy when docs are much
    smaller than the context window), so

        ``pack_id = floor((cumulative_tokens - doc_tokens) / budget)``

    which makes the whole assignment one window cumulative sum — no
    sequential fold, no Python. Key-parallel at scale: each shard's
    window is independent, and the deterministic (id-ordered) fill means
    reruns and engines agree exactly.

    Returns one row per pack: shard keys, pack_id, n_docs, pack_tokens,
    first/last doc id.
    """
    from .textstats import token_count

    by = list(by)
    w = (
        Window.partitionBy(*by)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    assigned = (
        df.select(*by, F.col(id_col), token_count(text_col).alias("n_toks"))
        .withColumn("__cum", F.sum("n_toks").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("__cum") - F.col("n_toks")) / F.lit(float(budget_tokens))).cast("long"),
        )
    )
    return assigned.groupBy(*by, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("pack_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def group_sample(
    df: DataFrame,
    group_by: list[str],
    k: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic uniform sample of k rows per group: rank rows by
    an avalanche hash of their id (sketches.mix32) and keep the first
    k. The "show me a few examples from every stratum" query at scale —
    stable across runs, engines, and partitionings, unlike
    ``df.sample()`` (seed + partitioning dependent) or ``LIMIT``
    (order-nondeterministic).

    Partition-local window + WindowGroupLimit: Spark pushes the rank
    filter into a per-partition top-k, so no group's full row set is
    ever sorted. Ties (hash collisions) break on the id itself.
    """
    from db_loganalyzer_spark.operators.sketches import mix32

    w = Window.partitionBy(*group_by).orderBy(
        mix32(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def budget_select(
    df: DataFrame,
    budget_tokens: int,
    by: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget corpus selection: within each group, keep the
    highest quality-per-token documents until the group's token budget
    is spent (the greedy knapsack every data-mixing recipe actually
    runs). Deterministic: value = quality_score / tokens ordered with
    the id tiebreak, and the running spend is an exact integer window
    sum — the same selection on any engine or partitioning.

    One scan computes tokens + quality as column expressions; the
    cumulative spend is a partition-local window over (group)-ordered
    rows. Emits the kept rows with their running total.
    """
    from db_loganalyzer_spark.operators.textstats import (
        quality_score,
        token_count,
    )

    by = list(by or ["source"])
    tok = token_count(F.col(text_col)).cast("long")
    q = quality_score(F.col(text_col))
    d = df.select(
        *by,
        F.col(id_col),
        tok.alias("n_tokens"),
        q.alias("quality"),
        F.when(tok > 0, q / tok).otherwise(F.lit(0.0)).alias(
            "value_per_token"
        ),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("value_per_token").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.withColumn(
        "cum_tokens", F.sum("n_tokens").over(w).cast("long")
    ).filter(F.col("cum_tokens") <= budget_tokens)


def temperature_mixture_rates(
    df: DataFrame,
    strata_col: str = "source",
    denominator: int = 1_000_000,
) -> DataFrame:
    """Data-driven domain-mixing rates: flatten the empirical domain
    distribution toward ``p_d^0.5`` (temperature resampling, the
    standard multi-domain/multilingual training-mix move). Acceptance
    rate per domain is ``sqrt(n_min / n_d)`` — the smallest domain keeps
    everything, a domain 100x larger keeps 10% — so the selected corpus
    follows ``~ sqrt(n_d)`` without any per-row state.

    alpha is fixed at 0.5 because sqrt is IEEE correctly-rounded (the
    identical double in every engine); a pow(x, alpha) rate would drift
    in the last ulp across libm implementations and flip boundary
    documents. Rates are integer micro-thresholds for the same reason.

    Returns one tiny row per domain: (strata, n_docs, threshold) —
    broadcast it back onto the corpus (:func:`temperature_resample`).
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("__n_min"))
    # FLOOR(x + 0.5), the dsum idiom, not ROUND: floor of a double is
    # exact and identical in every engine; ROUND half-up on the decimal
    # string can split from a C engine's rint on .5 boundaries.
    return counts.crossJoin(F.broadcast(n_min)).select(
        strata_col,
        "n_docs",
        F.floor(
            F.sqrt(F.col("__n_min").cast("double") / F.col("n_docs"))
            * denominator
            + F.lit(0.5)
        )
        .cast("long")
        .alias("threshold"),
    )


def temperature_resample(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: int = 0,
    denominator: int = 1_000_000,
) -> DataFrame:
    """M16 — deterministic temperature-flattened domain mixture: two tiny
    aggregates compute the per-domain rate, a broadcast join attaches it,
    and membership is the same pure hash-threshold projection as
    :func:`stratified_sample` — scan-bound at 100 TB, no wide shuffle,
    stable under re-partitioning and engine ports."""
    rates = temperature_mixture_rates(df, strata_col, denominator)
    return (
        df.join(F.broadcast(rates.select(strata_col, "threshold")), strata_col)
        .filter(hash_bucket(id_col, denominator, salt) < F.col("threshold"))
        .drop("threshold")
    )


def weighted_priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """M18 — deterministic weight-proportional top-k sample (priority
    sampling, Duffield-Lund-Thorup): each row gets priority ``w / u``
    with ``u`` a pure-hash uniform in (0, 1], and the k highest
    priorities are kept — heavier documents proportionally more likely,
    yet membership is a pure function of (id, salt) like every split in
    this module: reproducible across runs, engines, and re-partitions,
    unlike ``df.sample``'s seed+partitioning dependence.

    Scale shape: the priority is a projection; the selection is
    ``orderBy(...).limit(k)``, which Spark plans as
    TakeOrderedAndProject — per-partition top-k heaps merged on one
    reducer, never a global sort (pinned in tests/test_plans.py).
    Cross-engine exactness: ``u = (hash+1) / 2^32`` and ``w / u`` are
    single IEEE divisions (correctly rounded in every engine), and ties
    break on the id, so the cut is bit-stable.
    """
    u = (hash_bucket(id_col, M32, salt) + 1).cast("double") / F.lit(
        float(M32)
    )
    pri = F.col(weight_col).cast("double") / u
    return (
        df.withColumn("priority", pri)
        .orderBy(F.desc("priority"), F.col(id_col))
        .limit(k)
    )


def padded_batches(
    df: DataFrame,
    batch_size: int = 8,
    by: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_sorted: bool = True,
) -> DataFrame:
    """PACK02 — padded-batch accounting, the OTHER packing regime: where
    ``pack_sequences`` concatenates documents into fixed token budgets
    (pretraining), fine-tuning/inference batches PAD every sequence to
    the batch max — so batch composition, not bin fill, decides the
    waste. ``length_sorted=True`` pins the standard mitigation (sort by
    length before batching, so batch members have near-equal lengths
    and ``max*n - sum ≈ 0``); ``False`` is the naive arrival-order
    baseline the sorted form is measured against.

    Per group: order by (tokens desc, id) [or (id) when unsorted],
    row_number, batch = (rn-1) / batch_size, then one groupBy emits
    n_seqs, max/sum tokens and the padding waste — exact integers, one
    key shuffle, key-parallel like pack_sequences. The ragged tail
    batch is included (its padding is real).
    """
    from db_loganalyzer_spark.operators.textstats import token_count

    by = list(by or ["source"])
    d = df.select(
        *by,
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_toks"),
    )
    order = (
        [F.col("n_toks").desc(), F.col(id_col)]
        if length_sorted
        else [F.col(id_col)]
    )
    w = Window.partitionBy(*by).orderBy(*order)
    batched = d.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )
    return batched.groupBy(*(by + ["batch_id"])).agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.max("n_toks").cast("long").alias("max_toks"),
        F.sum("n_toks").cast("long").alias("sum_toks"),
        (F.max("n_toks") * F.count(F.lit(1)) - F.sum("n_toks"))
        .cast("long")
        .alias("pad_toks"),
    )
