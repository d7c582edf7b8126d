"""Keyword relevance ranking over the document corpus: TF-IDF term
extraction and BM25 search (Robertson & Spärck Jones; the scoring used
by Lucene/Elasticsearch, restated as pure DataFrame algebra).

These complement the embedding side (operators/similarity.py): ANN
finds semantically-near documents, BM25/TF-IDF find lexically-relevant
ones — a training-data pipeline uses both (keyword-targeted corpus
slices, duplicate-boilerplate term audits).

Scale shape:
- token explode -> two-phase groupBy (doc_id, term): the only pass over
  raw text; everything after runs on (doc, term) statistics;
- document frequency is a groupBy over the (doc, term) frame (partial
  agg; each pair appears once so COUNT(*) is the doc count);
- BM25 filters to the query's terms BEFORE aggregating — per-query work
  is proportional to postings of the query terms, not the corpus;
- corpus constants (N, avg doc length) ride along as a broadcast 1-row
  frame, never a driver collect;
- the per-doc top-k is a partition-local window over (doc, term) rows.

Float determinism (oracle hash-matching): scores are built from exact
integer tf/df/N and one ``ln`` call, rounded to 6 decimals BEFORE
ranking in both engines, with the term / doc_id as the total-order
tiebreak — the same discipline as the cosine entries in similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from db_loganalyzer_spark.operators.textstats import tokens


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf) — whitespace terms of the normalized text."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF
    (``tf * ln(N/df)``). Terms appearing in every document score 0 and
    still rank below rarer terms; ties break on the term itself."""
    tf = term_frequencies(df, id_col, text_col)
    # document frequency as a count window over the tf frame itself —
    # NOT a groupBy+join back: that would put the token-explode pass in
    # two lineages and Spark would run the expensive text scan twice
    # (verified in the physical plan). One explode, then only (doc,
    # term)-level shuffles.
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
    n = df.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.withColumn("df", dfreq)
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "rank", "term", "tf", "df", "score")
    )


def bm25_search(
    df: DataFrame,
    query: str,
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25:

    ``sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * len/avglen))``
    with ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``.

    The postings scan filters to the query's terms before any shuffle,
    so cost tracks the query terms' postings, not corpus size. Query
    terms are normalized with the same tokenizer as the corpus.
    """
    q_terms = sorted(
        {t for t in query.lower().split() if t}
    )
    if not q_terms:
        raise ValueError("empty query")
    toks = df.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    )
    lens = toks.select(
        id_col, F.size("__toks").cast("long").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    # doc length rides along through the tf aggregate (F.first — it is
    # constant per doc) instead of a join back to the full-corpus lens
    # frame: one fewer shuffle of corpus-sized data. df per query term
    # is a count window over the tiny postings frame, not a
    # groupBy+join that would fork the lineage.
    tf = (
        toks.select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .filter(F.col("term").isin(q_terms))
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.first("dl").alias("dl"),
        )
    )
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
    avg_len = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.withColumn("df", dfreq)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * (F.col("dl") / avg_len))
            ),
        )
    )
    # sum the per-term contributions in FIXED sorted-term order (one
    # conditional-max column per query term, added left to right), not
    # F.sum(contrib): float addition is order-dependent and a plain SUM
    # would hash-differ from the oracle at the rounding boundary.
    per_cols = [
        F.max(F.when(F.col("term") == t, F.col("contrib"))).alias(
            f"__c{i}"
        )
        for i, t in enumerate(q_terms)
    ]
    acc = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(q_terms)):
        acc = acc + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    scored = (
        per_term.groupBy(id_col)
        .agg(*per_cols, F.count(F.lit(1)).cast("long").alias("n_terms_hit"))
        .select(
            id_col,
            F.round(acc, 6).alias("score"),
            "n_terms_hit",
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )


def bigram_lm_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus bigram language-model counts: for every adjacent token
    pair, the count and the conditional probability P(w2 | w1) —
    the n-gram statistics pass behind corpus-quality audits (stuck
    boilerplate shows up as near-1.0 conditionals) and classical LM
    baselines.

    Pairs come from zipping each token array with its own tail
    (``arrays_zip(slice, slice)``) — pure JVM array ops, one explode,
    no self-join and no window over raw tokens; then one partial-agg
    shuffle to (w1, w2) counts. The conditional divides by the w1 row
    total via a window over the O(vocab^2-bounded) pair frame. Pair
    order within a document never crosses document boundaries.
    """
    from db_loganalyzer_spark.operators.textstats import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # Clamp the slice length at 0: a doc whose normalized text has <2
    # tokens would otherwise hand F.slice a negative length and kill
    # the whole job (INVALID_PARAMETER_VALUE.LENGTH). Zero-length
    # slices zip to an empty array, so empty/1-token docs simply
    # contribute no pairs — matching the generate_series oracle.
    npairs = F.greatest(n - 1, F.lit(0))
    pairs = df.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, npairs).alias("w1"),
                F.slice(toks, 2, npairs).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    w = Window.partitionBy("w1")
    return counts.select(
        "w1",
        "w2",
        "n",
        (F.col("n") / F.sum("n").over(w)).alias("p_cond"),
    )


def doc_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T15 — per-document cross-entropy / perplexity under the corpus
    bigram LM (:func:`bigram_lm_counts`): the classic model-based
    quality score — templated/boilerplate docs score near-zero entropy,
    token-salad outliers score high — used to rank what t07's
    rule-based gate can't see.

    Plan shape: one pair explode (same JVM ``arrays_zip`` lineage as
    the LM itself), one (w1, w2)-key shuffle join of doc pairs against
    the vocab^2-bounded LM frame, one per-doc partial agg. No UDFs, no
    window over raw tokens.

    Determinism discipline: each pair's negative log-probability is
    rounded to 6 decimals (``ln`` is the one library call) and scaled
    to an exact BIGINT micro-unit BEFORE the per-doc sum, so the
    accumulation is order-free integer math; the entropy is then two
    IEEE divisions of exact integers, and ``exp`` (the second library
    call) is rounded to 6 decimals. Docs with < 2 tokens surface with
    ``n_pairs = 0`` and NULL scores rather than dropping out.
    """
    toks = tokens(F.col(text_col))
    npairs = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, npairs).alias("w1"),
                F.slice(toks, 2, npairs).alias("w2"),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    lm = bigram_lm_counts(df, id_col, text_col).select("w1", "w2", "p_cond")
    nll_us = (
        F.floor(F.round(-F.log(F.col("p_cond")), 6) * 1_000_000 + F.lit(0.5))
        .cast("long")
    )
    agg = (
        pairs.join(lm, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(nll_us).alias("__nll_sum"),
        )
    )
    entropy = (F.col("__nll_sum").cast("double") / 1_000_000.0) / F.col(
        "n_pairs"
    ).cast("double")
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("long")).alias(
                "n_pairs"
            ),
            entropy.alias("cross_entropy"),
            F.round(F.exp(entropy), 6).alias("perplexity"),
        )
    )
