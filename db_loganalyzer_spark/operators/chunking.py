"""Text chunking (SURVEY §2.5 W8 + §2.9 M8, A15).

- marker_chunks lives in operators/windows.py (event-stream chunking).
- recursive_character_split reimplements the reference's splitter
  contract (tools/chunker.py:8-16: chunk_size 500, overlap 100,
  separators ["\\n\\n", "\\n", " ", ""]) as a deterministic pure-Python
  function applied per row via flatMap-shaped explode of a UDF result —
  1 row in, N chunk rows out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]


def split_text(
    text: str,
    chunk_size: int = 500,
    chunk_overlap: int = 100,
    separators: list[str] | None = None,
) -> list[str]:
    """Recursive character splitting: split on the coarsest separator
    that yields pieces; greedily merge pieces into chunks <= chunk_size
    with chunk_overlap carried between neighbors. Deterministic,
    dependency-free restatement of the splitter the reference uses."""
    seps = separators if separators is not None else DEFAULT_SEPARATORS
    if text is None:
        return []
    if len(text) <= chunk_size:
        return [text] if text else []

    sep = seps[-1]
    rest = seps
    for i, s in enumerate(seps):
        if s == "" or s in text:
            sep, rest = s, seps[i + 1 :]
            break

    pieces = list(text) if sep == "" else [p for p in text.split(sep) if p != ""]

    # recursively split any piece still too large
    expanded: list[str] = []
    for p in pieces:
        if len(p) > chunk_size and rest:
            expanded.extend(split_text(p, chunk_size, 0, rest))
        else:
            expanded.append(p)

    joiner = sep
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for p in expanded:
        add = len(p) + (len(joiner) if cur else 0)
        if cur and cur_len + add > chunk_size:
            chunks.append(joiner.join(cur))
            # carry overlap: keep trailing pieces up to chunk_overlap chars
            keep: list[str] = []
            keep_len = 0
            for q in reversed(cur):
                step = len(q) + (len(joiner) if keep else 0)
                if keep_len + step > chunk_overlap:
                    break
                keep.insert(0, q)
                keep_len += step
            cur, cur_len = keep, keep_len
            add = len(p) + (len(joiner) if cur else 0)
        cur.append(p)
        cur_len += add
    if cur:
        chunks.append(joiner.join(cur))
    return chunks


def recursive_character_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 500,
    chunk_overlap: int = 100,
) -> DataFrame:
    """1 document row -> N chunk rows with chunk_index. The splitter runs
    inside ``mapInPandas`` (one Arrow batch per call — no per-row Python
    round trip, unlike a scalar UDF) and the chunk array is exploded
    JVM-side (posexplode)."""
    id_type = dict(df.select(id_col, text_col).dtypes)[id_col]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "__chunks": [
                        split_text(t, chunk_size, chunk_overlap)
                        for t in pdf[text_col]
                    ],
                }
            )

    arrays = df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, __chunks array<string>"
    )
    return arrays.select(
        F.col(id_col),
        F.posexplode("__chunks").alias("chunk_index", "chunk_text"),
    ).withColumn("chunk_len", F.length("chunk_text"))


def chunk_summaries(
    chunks: DataFrame, id_col: str = "doc_id", tokenizer=None
) -> DataFrame:
    """A15-shaped chunk accounting: per document, chunk count + total/avg
    chunk length + token count. ``tokenizer`` is a column function (e.g.
    ``textstats.token_count_pudf(...)`` for real tiktoken counts); the
    default is the deterministic BPE-ish regex estimate the oracle
    checks (reference counts with tiktoken, cli_wrapper/main.py:417-424)."""
    from .textstats import bpe_ish_token_count

    count_fn = tokenizer if tokenizer is not None else bpe_ish_token_count
    return (
        chunks.withColumn("n_tokens", count_fn(F.col("chunk_text")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_len").alias("total_chars"),
            F.avg("chunk_len").alias("avg_chunk_len"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
