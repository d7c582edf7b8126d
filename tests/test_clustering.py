"""Clustering operators (M3-M6) vs straightforward NumPy restatements of
the reference semantics (log_analysis/cluster_code_coverage.py:64-177)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from db_loganalyzer_spark.operators.clustering import (
    cluster_representatives,
    cluster_summary_table,
    embed_texts,
    fake_encoder_batch,
    kmeans_clusters,
    seed_centroid_assign,
    valid_embeddings,
)


@pytest.fixture(scope="module")
def blobs(spark):
    """Three well-separated 4-d blobs, 20 points each, deterministic."""
    rng = np.random.RandomState(7)
    centers = np.array(
        [[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]], dtype=float
    )
    pts = []
    for c_idx, c in enumerate(centers):
        for i in range(20):
            pts.append((c_idx * 20 + i, (c + rng.randn(4) * 0.3).tolist(), c_idx))
    return spark.createDataFrame(pts, "vec_id long, embedding array<double>, true_label int")


def test_embed_texts_matches_pure_python(spark):
    rows = [(0, "the cat sat"), (1, "dogs bark loudly at the moon"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["embedding"] for r in embed_texts(df).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == fake_encoder_batch([text or ""])[0]


def test_valid_embeddings_drops_zero_and_nan(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [float("nan"), 1.0])],
        "vec_id long, embedding array<double>",
    )
    kept = [r["vec_id"] for r in valid_embeddings(df).collect()]
    assert kept == [0]


def test_kmeans_recovers_blobs(spark, blobs):
    out = kmeans_clusters(blobs, k=3, seed=42)
    # each true blob maps to exactly one predicted cluster
    m = out.groupBy("true_label").agg(F.count_distinct("cluster").alias("n")).collect()
    assert all(r["n"] == 1 for r in m)
    sizes = sorted(r["size"] for r in out.groupBy("cluster").count()
                   .withColumnRenamed("count", "size").collect())
    assert sizes == [20, 20, 20]


def test_seed_assign_and_representatives_match_numpy(spark, blobs):
    seeds = blobs.filter(F.col("vec_id").isin(0, 20, 40)).select(
        F.col("vec_id").alias("cluster"), "embedding"
    )
    assigned = seed_centroid_assign(blobs, seeds)
    pdf = assigned.select("vec_id", "embedding", "cluster").toPandas()

    # NumPy restatement: nearest seed by squared euclidean
    X = np.array(pdf.sort_values("vec_id")["embedding"].tolist())
    S = X[[0, 20, 40]]
    d2 = ((X[:, None, :] - S[None, :, :]) ** 2).sum(axis=2)
    expect = np.array([0, 20, 40])[d2.argmin(axis=1)]
    got = pdf.sort_values("vec_id")["cluster"].to_numpy()
    assert (got == expect).all()

    # representative = cosine argmax to the cluster mean (reference :133-155)
    reps = {r["cluster"]: r["rep_id"] for r in cluster_representatives(assigned).collect()}
    for c in np.unique(expect):
        idx = np.where(expect == c)[0]
        sub = X[idx]
        centroid = sub.mean(axis=0)
        sims = sub @ centroid / (
            np.linalg.norm(sub, axis=1) * np.linalg.norm(centroid)
        )
        assert reps[c] == idx[int(np.argmax(sims))]


def test_cluster_summary_shape_and_truncation(spark, blobs):
    seeds = blobs.filter(F.col("vec_id").isin(0, 20, 40)).select(
        F.col("vec_id").alias("cluster"), "embedding"
    )
    assigned = seed_centroid_assign(blobs, seeds)
    texts = spark.createDataFrame(
        [(i, "x" * 500) for i in range(60)], "doc_id long, text string"
    )
    summ = cluster_summary_table(assigned, texts).collect()
    assert len(summ) == 3
    for r in summ:
        assert r["size"] == 20
        assert len(r["sample_comment"]) == 200


def test_simplified_silhouette_known_geometry(spark):
    """Two tight clusters far apart: silhouette ~1; a point midway
    scores ~0."""
    from pyspark.sql import functions as F

    from db_loganalyzer_spark.operators.clustering import (
        simplified_silhouette,
    )

    rows = [
        (0, [0.0, 0.0]), (1, [1.0, 0.0]),          # cluster 0 region
        (2, [100.0, 0.0]), (3, [101.0, 0.0]),      # cluster 1 region
        (4, [50.0, 0.0]),                          # midway: s ~ 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [100.0, 0.0])],
        "cluster long, embedding array<double>",
    )
    out = {r.cluster: r for r in simplified_silhouette(emb, seeds).collect()}
    # cluster 0: point 0 sits ON the centroid (s=1), point 1 is 1 vs 99
    # away (s ~ 0.9899); point 4 joins cluster 0 by tie-break (50 vs 50
    # -> lowest cid) with s = 0
    assert out[0].n == 3
    assert abs(out[0].mean_silhouette - (1.0 + (99 - 1) / 99 + 0.0) / 3) < 1e-5
    # cluster 1: point 2 on the centroid (s=1); point 3 is 1 away from
    # its own centroid and 101 from the other -> s = 100/101
    assert out[1].n == 2
    assert abs(out[1].mean_silhouette - (1.0 + (101 - 1) / 101) / 2) < 1e-5
