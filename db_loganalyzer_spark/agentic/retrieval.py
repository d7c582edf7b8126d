"""L5 — local RAG retrieval over a knowledge-corpus directory.

The reference retrieves problem-summary docs for the investigation loop
through a hosted embedding service (its ``rag-corpus/`` directory holds
the documents). This module provides the same capability fully locally,
built from this engine's own operators: documents are embedded with the
pluggable encoder (deterministic hashing-trick default, a real
SentenceTransformer drops in unchanged — ``clustering.embed_texts``) and
queries are matched by exact cosine against the indexed corpus
(``similarity.brute_force_topk``'s broadcast-query shape).

The returned retriever is a plain ``query_text -> str | None`` callable,
exactly what ``PhasedInvestigationAgent(rag=...)`` expects — the loop
stays offline-deterministic, and swapping in a hosted retriever later is
a one-argument change.

Scale shape: the corpus index is a DataFrame (id, name, text, embedding)
built once; each retrieval broadcasts ONE query vector and scores the
corpus distributedly, so a million-document knowledge base works the
same way as the reference's ten summaries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import (
    embed_texts,
    fake_encoder_batch,
    valid_embeddings,
)
from ..operators.similarity import cosine


def load_corpus_dir(
    spark: SparkSession, corpus_dir: str, suffixes: tuple = (".md", ".txt")
) -> DataFrame:
    """One row per document file under ``corpus_dir`` (recursive):
    (doc_id, name, text). Deterministic ids from sorted relative paths."""
    rows = []
    for root, _dirs, files in os.walk(corpus_dir):
        for fname in files:
            if fname.endswith(suffixes):
                path = os.path.join(root, fname)
                rel = os.path.relpath(path, corpus_dir)
                with open(path, encoding="utf-8", errors="replace") as f:
                    rows.append((rel, f.read()))
    rows.sort()
    if not rows:
        raise ValueError(f"no {suffixes} documents under {corpus_dir!r}")
    return spark.createDataFrame(
        [(i, name, text) for i, (name, text) in enumerate(rows)],
        "doc_id long, name string, text string",
    )


def build_corpus_index(
    corpus: DataFrame, encoder=None, dim: int = 256
) -> DataFrame:
    """Attach an embedding column to a (doc_id, name, text) corpus via
    the pluggable encoder. Cache-worthy: built once, probed per query."""
    emb = valid_embeddings(embed_texts(corpus, encoder=encoder, dim=dim))
    return corpus.join(emb, "doc_id").select(
        "doc_id", "name", "text", "embedding"
    )


def retrieve(
    index: DataFrame,
    query_text: str,
    top_k: int = 3,
    encoder=None,
    dim: int = 256,
    min_cosine: float = 0.0,
) -> list[dict]:
    """Top-k corpus documents for a query string by exact cosine. The
    single query vector is computed driver-side with the SAME encoder the
    index used and broadcast; scoring is distributed, the head is tiny."""
    enc = encoder or (lambda ts: fake_encoder_batch(ts, dim))
    qvec = enc([query_text])[0]
    if not any(qvec):  # degenerate/empty query: nothing to score
        return []
    spark = index.sparkSession
    q = F.broadcast(
        spark.createDataFrame([(qvec,)], "query_vec array<double>")
    )
    hits = (
        index.crossJoin(q)
        .withColumn("cosine", F.round(cosine(F.col("embedding"), F.col("query_vec")), 6))
        .filter(F.col("cosine") > min_cosine)
        # orderBy+limit compiles to TakeOrderedAndProject: per-partition
        # top-k + merge, no global sort, no single-partition window
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(top_k)
        .select("name", "cosine", "text")
        .collect()
    )
    return [
        {"rank": i + 1, **r.asDict()} for i, r in enumerate(hits)
    ]


def make_retriever(
    index: DataFrame,
    top_k: int = 3,
    encoder=None,
    dim: int = 256,
    max_chars_per_doc: int = 4000,
):
    """A ``query_text -> str | None`` callable for
    ``PhasedInvestigationAgent(rag=...)``: formats the top-k hits the way
    the reference splices retrieved summaries into the prompt."""

    def rag(query_text: str) -> str | None:
        hits = retrieve(index, query_text, top_k=top_k, encoder=encoder, dim=dim)
        if not hits:
            return None
        parts = []
        for h in hits:
            body = h["text"][:max_chars_per_doc]
            parts.append(
                f"[retrieved doc rank={h['rank']} cosine={h['cosine']:.3f}] "
                f"{h['name']}\n{body}"
            )
        return "\n\n".join(parts)

    return rag
