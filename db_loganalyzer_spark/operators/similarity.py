"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs:
- brute-force cosine top-k: exact; the small-query-set baseline. Cost is
  |queries| x |corpus| dot products — fine when the query side broadcasts.
- LSH-bucketed ANN (random hyperplanes): corpus hashed once into
  sign-pattern buckets; a query only scores its own bucket (+ optional
  multi-probe). The corpus side shuffles once on bucket id.

Dot products use F.zip_with + F.aggregate (JVM-side, no Python); the
hyperplanes are generated deterministically from a seed via numpy and
shipped as literals (they're tiny: n_planes x dim).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread


def dot(u: Column, v: Column) -> Column:
    return F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(u: Column) -> Column:
    return F.sqrt(F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(u: Column, v: Column) -> Column:
    return dot(u, v) / (norm(u) * norm(v))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector: broadcast the query
    side, score everything, TakeOrdered per query. Excludes self-matches
    when ids collide."""
    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = (
        corpus.select(id_col, vec_col)
        .crossJoin(q)
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine", F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4)
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (numpy RNG with fixed seed)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def _plane_dots(vec: Column, planes: list[list[float]]) -> list[Column]:
    return [
        dot(vec, F.array(*[F.lit(float(x)) for x in p])) for p in planes
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit i = (vec . plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, d in enumerate(_plane_dots(vec, planes)):
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_probe_buckets(
    vec: Column, planes: list[list[float]], n_probe: int
) -> Column:
    """Multi-probe bucket list: the home bucket plus the n_probe-1
    single-bit flips of the LEAST-confident bits (smallest |dot| — the
    hyperplanes the vector sits closest to, i.e. where a true neighbor
    most likely landed on the other side). Classic multi-probe LSH:
    recall of extra hash tables for the cost of extra probes."""
    dots = _plane_dots(vec, planes)
    home = lsh_bucket(vec, planes)
    if n_probe <= 1:
        return F.array(home)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(d).alias("a"), F.lit(i).alias("i"))
                for i, d in enumerate(dots)
            ]
        )
    )
    # shiftleft needs a Python-int bit count; a literal 2^i lookup array
    # keeps the flip mask exact for any plane count up to 63
    pow2 = F.array(*[F.lit(1 << i).cast("long") for i in range(len(planes))])
    flips = F.transform(
        F.slice(ranked, 1, n_probe - 1),
        lambda s: home.bitwiseXOR(F.element_at(pow2, s["i"] + 1)),
    )
    return F.concat(F.array(home), flips)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_probe: int = 1,
) -> DataFrame:
    """ANN top-k: score only corpus vectors in the query's hyperplane
    bucket(s). Recall < 1 by construction (documented approximate path);
    raise recall with fewer planes or ``n_probe`` > 1 (each query also
    probes the n_probe-1 least-confident single-bit-flip buckets — see
    lsh_probe_buckets). Each corpus vector lives in exactly one bucket
    and probe lists are distinct, so no candidate dedup is needed.

    At scale: the corpus bucket assignment is computed once (narrow) and
    the join is equi on bucket — a hash shuffle, never a cross join;
    multi-probe only multiplies the (broadcast) query side.

    ``n_planes=None`` (the default) computes the occupancy dial from the
    corpus size (:func:`auto_n_planes`, one count job) so the default
    call stays scale-safe as the corpus grows; deterministic pipelines
    pin it explicitly."""
    if n_planes is None:
        n_planes = auto_n_planes(corpus)
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        id_col, vec_col, lsh_bucket(F.col(vec_col), planes).alias("bucket")
    )
    q = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(
            lsh_probe_buckets(F.col(query_vec_col), planes, n_probe)
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine", F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4)
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _sqdist(u: Column, cent: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(u, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    max_iter: int = 20,
) -> list[list[float]]:
    """Coarse quantizer for IVF: distributed Spark ML KMeans over the
    corpus (k-means|| init, fixed seed). Centroids are tiny
    (n_cells x dim) and come back to the driver to be shipped as
    literals — the classic train-small/apply-wide split."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        )
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _cell_dists(vec: Column, centroids: list[list[float]]) -> Column:
    return F.array(
        *[
            F.struct(_sqdist(vec, c).alias("d"), F.lit(i).alias("cell"))
            for i, c in enumerate(centroids)
        ]
    )


def ivf_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id (argmin squared L2) as a pure column
    expression — struct ordering makes array_min pick (min d, min cell)."""
    return F.array_min(_cell_dists(vec, centroids))["cell"]


def ivf_probe_cells(
    vec: Column, centroids: list[list[float]], n_probe: int
) -> Column:
    """The n_probe nearest cells for a query vector (multi-probe list)."""
    return F.transform(
        F.slice(F.array_sort(_cell_dists(vec, centroids)), 1, n_probe),
        lambda s: s["cell"],
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: list[list[float]] | None = None,
    cell_vec_col: str | None = None,
    query_cell_vec_col: str | None = None,
) -> DataFrame:
    """IVF ANN top-k: KMeans coarse quantizer -> corpus partitioned into
    cells (one narrow pass) -> each query probes its n_probe nearest
    cells -> exact cosine + per-query top-k on the candidates only.

    ``cell_vec_col``/``query_cell_vec_col`` optionally decouple the
    vectors used for cell assignment/probing from the ones scored — e.g.
    integer-quantized copies whose distance comparisons are exact (the
    deterministic-oracle configuration), while cosine still uses the raw
    doubles.

    The scale shape: the fit sees the corpus once (or a sample via
    ``centroids=``); assignment is scan-bound column arithmetic; the
    candidate join is equi on cell, so the corpus shuffles once on cell
    id and only ~n_probe/n_cells of it is ever scored per query. With
    ``n_probe == n_cells`` the probe covers every cell and the result is
    exactly brute force — the recall/latency dial is explicit.
    """
    cell_vec_col = cell_vec_col or vec_col
    query_cell_vec_col = query_cell_vec_col or query_vec_col
    if centroids is None:
        centroids = fit_ivf_centroids(
            corpus, n_cells=n_cells, seed=seed, vec_col=cell_vec_col
        )
    c = corpus.select(
        id_col, vec_col, ivf_cell(F.col(cell_vec_col), centroids).alias("cell")
    )
    q = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(
            ivf_probe_cells(F.col(query_cell_vec_col), centroids, n_probe)
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine",
            F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def auto_n_planes(
    corpus: DataFrame, target_bucket_size: int = 500, floor: int = 4
) -> int:
    """The LSH occupancy dial, computed instead of guessed: with a fixed
    plane count, bucket occupancy grows linearly with the corpus and the
    self-join's candidate pairs grow QUADRATICALLY (measured 6.5x
    super-linear at a 10x corpus, BASELINE.md round-6) — the scale rule
    is ``n_planes ~ log2(n / target_bucket_size)``, i.e. add one plane
    per corpus doubling. Costs one count job; pass the result to
    :func:`embedding_near_dups` / :func:`lsh_topk`.

    NOTE: deterministic pipelines (the oracle-paired registry entries)
    should pin ``n_planes`` explicitly — an auto value changes with the
    corpus and with it every bucket id.
    """
    import math

    n = corpus.count()
    return max(floor, math.ceil(math.log2(max(n, 1) / target_bucket_size)))


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH self-join (same bucket)
    then exact cosine filter. The dedup-by-meaning shape for a training
    corpus.

    ``n_planes`` is the occupancy/recall dial: per-bucket candidate
    pairs ~ (n / 2^planes)^2 * 2^planes, so hold ``n / 2^planes`` near
    constant as the corpus grows (:func:`auto_n_planes`; measured
    395 s -> 33 s -> 10 s at 6 -> 10 -> 12 planes on a 500k-vector
    corpus). Narrower buckets trade recall, recovered by multi-probe
    (:func:`lsh_topk`) or a second seeded table union.

    ``n_planes=None`` (the default) computes the dial from the corpus
    size (:func:`auto_n_planes`) so the default call holds bucket
    occupancy ~constant as the corpus grows — the self-join is the one
    place a fixed plane count turns quadratic (measured 6.5x super-linear
    at 10x corpus, BASELINE.md round-6). Deterministic/oracle pipelines
    pin it explicitly."""
    if n_planes is None:
        n_planes = auto_n_planes(corpus)
    planes = _hyperplanes(dim, n_planes, seed)
    # _spread: a small corpus arrives as 1-2 parquet splits; the self-join
    # broadcasts one side, so pair generation runs on the PROBE side's scan
    # partitions - parallelize them first (no-op at real scale)
    c = _spread(corpus).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("cosine", F.round(cosine(F.col("a.v"), F.col("b.v")), 4))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine"
        )
    )


def quantized_gemm_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """SIM06 — exact top-k by blocked integer GEMM: the vectorized
    rerank path. ``brute_force_topk`` evaluates one JVM dot-product
    expression per (query, row); this ships the small query block to
    every partition and lets numpy compute the whole (batch x queries)
    score matrix in ONE BLAS-shaped call inside mapInPandas — the way
    a reranker actually burns its FLOPs.

    Determinism is by QUANTIZATION, not luck: both sides round the
    vectors to integer milli-units first (exactly what production
    int8/int16 vector stores do), so every dot product is an exact
    int64 — addition order stops mattering, the GEMM result is
    bit-identical to a sequential SQL ``list_sum``, and the cosine
    (one correctly-rounded division by the sqrt-norm product) needs NO
    rounding to hash-match the oracle. Dots stay far under 2^53
    (64 dims x 1e6 per term), so the int->double casts are exact too.

    Scale shape: each partition emits only its LOCAL top-k per query
    (argpartition), so the shuffle is k x partitions x |queries| rows,
    never the corpus; the global window takes the final k. Queries are
    a rerank batch by contract — small enough to collect and close
    over (the sim01 broadcast-query contract, same bound).
    """
    import numpy as np

    qrows = queries.select(query_id, query_vec).collect()
    out_schema = "query_id long, vec_id long, cosine double, rank int"
    if not qrows:
        # np.array([]) is 1-D; the axis=1 norm below would raise.
        return emb.sparkSession.createDataFrame([], out_schema)
    qids = [int(r[0]) for r in qrows]
    qmat = np.array(
        [np.floor(np.asarray(r[1], dtype="float64") * scale + 0.5) for r in qrows],
        dtype="int64",
    )
    qnorm = np.sqrt((qmat * qmat).sum(axis=1).astype("float64"))

    def _score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.array(
                [
                    np.floor(np.asarray(v, dtype="float64") * scale + 0.5)
                    for v in pdf[vec_col]
                ],
                dtype="int64",
            )
            cids = pdf[id_col].to_numpy(dtype="int64")
            dots = cmat @ qmat.T  # exact int64 GEMM
            cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype("float64"))
            cos = dots.astype("float64") / (cnorm[:, None] * qnorm[None, :])
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(qids):
                col = cos[:, j]
                mask = cids != qid  # self-match excluded
                idx = np.flatnonzero(mask)
                if not len(idx):
                    continue
                take = min(k, len(idx))
                # local top-k: order by (-cos, vec_id) like the oracle
                order = np.lexsort((cids[idx], -col[idx]))[:take]
                sel = idx[order]
                out_q.extend([qid] * len(sel))
                out_c.extend(cids[sel].tolist())
                out_s.extend(col[sel].tolist())
            if out_q:
                yield pd.DataFrame(
                    {"query_id": out_q, "vec_id": out_c, "cosine": out_s}
                )

    local = _spread(emb).mapInPandas(
        _score, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
