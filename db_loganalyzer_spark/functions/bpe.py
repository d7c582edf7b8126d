"""Pure-Python byte-pair encoding — the wheel-less backend for the
token-count slot (A15).

The engine's token accounting is a pluggable encoder slot
(``textstats.token_count_pudf``): deployments with tiktoken plug it in
(reference: cli_wrapper/main.py:417-424), but this sandbox has no
tokenizer wheel, which left the real-backend test lane permanently
skipped. This module is a genuine BPE implementation (the Sennrich et
al. 2016 merge-training algorithm, public), not a fake: it trains a
merge table from a corpus and greedily applies ranked merges at encode
time, exactly the structure of GPT-2/cl100k tokenizers minus their
(large, shipped-as-data) learned vocabularies. It is dependency-free,
deterministic, and picklable, so the same encoder object trains on the
driver and encodes inside Arrow-batched executors.

Scale note: training is driver-side over a word-frequency dict (use a
SAMPLED corpus — vocab learning does not need every document); encoding
is O(tokens · merges-applied) per document inside ``mapInPandas``
workers, embarrassingly parallel.
"""

from __future__ import annotations

import re
from collections import Counter

# GPT-2's public pre-tokenization idea, simplified to be unicode-safe
# without regex module extensions: contractions, letter runs, digit
# runs, non-space symbol runs, and space runs.
_PRETOKEN = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+"
)

_EOW = "</w>"  # end-of-word marker so merges can't cross word boundaries


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN.findall(text or "")


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for word, freq in vocab.items():
        for a, b in zip(word, word[1:]):
            pairs[(a, b)] += freq
    return pairs


def _merge_word(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and (word[i], word[i + 1]) == pair:
            out.append(word[i] + word[i + 1])
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


class BPETokenizer:
    """A trained BPE model: ranked merge table + symbol vocabulary.

    ``encode`` returns a list of integer token ids (unknown symbols each
    get the reserved id 0), so ``len(encode(t))`` is the token count —
    the same contract as ``tiktoken.Encoding.encode``.
    """

    def __init__(self, merges: list[tuple[str, str]], symbols: list[str]):
        self.merges = merges
        self.ranks = {p: i for i, p in enumerate(merges)}
        # id 0 is reserved for <unk>
        self.token2id = {s: i + 1 for i, s in enumerate(symbols)}

    # -- training ----------------------------------------------------------
    @classmethod
    def train(cls, corpus: list[str], num_merges: int = 200) -> "BPETokenizer":
        """Sennrich-style merge learning: start from characters (+ the
        end-of-word marker), repeatedly merge the most frequent adjacent
        pair. Deterministic: frequency ties break on the pair whose
        REVERSED tuple is lexicographically greatest (max by
        ``(count, (second, first))``) — an arbitrary but fixed total
        order, never dict order. Any re-implementation must use this
        exact rule or its merge table (and all token counts) diverge."""
        vocab: dict[tuple[str, ...], int] = Counter()
        for text in corpus:
            for tok in pretokenize(text):
                vocab[tuple(tok) + (_EOW,)] += 1
        merges: list[tuple[str, str]] = []
        for _ in range(num_merges):
            pairs = _pair_counts(vocab)
            if not pairs:
                break
            best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][::-1]))
            if best[1] < 2:  # merging hapax pairs just memorizes the corpus
                break
            pair = best[0]
            merges.append(pair)
            vocab = Counter(
                {_merge_word(w, pair): f for w, f in vocab.items()}
            )
        symbols = sorted({s for w in vocab for s in w})
        return cls(merges, symbols)

    # -- encoding ----------------------------------------------------------
    def _bpe(self, token: str) -> list[str]:
        word = tuple(token) + (_EOW,)
        while len(word) > 1:
            ranked = [
                (self.ranks[p], p)
                for p in zip(word, word[1:])
                if p in self.ranks
            ]
            if not ranked:
                break
            word = _merge_word(word, min(ranked)[1])
        return list(word)

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for tok in pretokenize(text):
            for sym in self._bpe(tok):
                ids.append(self.token2id.get(sym, 0))
        return ids

    def decode_symbols(self, text: str) -> list[str]:
        """The subword strings (for tests/debugging), EOW markers kept."""
        return [s for tok in pretokenize(text) for s in self._bpe(tok)]


# A small deterministic seed corpus: log-flavored English so the learned
# merges look like the deployment domain. Training on ~40 lines keeps
# import time trivial; real deployments pass their own sampled corpus.
_SEED_CORPUS = [
    "storage server version lag exceeds threshold",
    "master recovery state reading coordinated state",
    "master recovery state locking coordinated state",
    "commit latency metrics report slow commit path",
    "ratekeeper throttling transactions queue too deep",
    "the quick brown fox jumps over the lazy dog",
    "storage metrics bytes input bytes durable versions",
    "transaction log recruitment failed retrying recruitment",
    "cluster controller detects failed storage server",
    "version lag recovered after recovery completed",
] * 4


class RanksEncoder:
    """Wheel-less implementation of the tiktoken *mergeable-ranks*
    contract: a byte-level BPE encoder driven by a ``bytes -> rank``
    table, where each token's id IS its rank — the exact data format
    ``tiktoken.Encoding`` ships (public; the greedy lowest-rank merge
    loop below is the canonical algorithm tiktoken's educational
    implementation documents). Deployments with the wheel pass
    ``tiktoken.get_encoding(name)._mergeable_ranks`` straight in and
    get identical ids from either engine; the sandbox pins the contract
    against a recorded fixture table instead
    (tests/test_integrations.py).

    ``pattern`` is the pre-tokenization regex (tiktoken encodings each
    ship theirs); merges never cross pre-token boundaries.
    """

    def __init__(self, mergeable_ranks: dict[bytes, int], pattern: str = r"\S+|\s+"):
        self.ranks = dict(mergeable_ranks)
        self.pattern = re.compile(pattern)

    def _merge_piece(self, piece: bytes) -> list[bytes]:
        parts = [piece[i : i + 1] for i in range(len(piece))]
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get(parts[i] + parts[i + 1])
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return parts

    def encode(self, text: str) -> list[int]:
        """Token ids (= ranks). A part absent from the table (possible
        only with an incomplete fixture table, never with a real
        encoding's full 256-byte base) gets id -1 rather than raising,
        so token COUNTS stay usable."""
        ids: list[int] = []
        for m in self.pattern.finditer(text or ""):
            for part in self._merge_piece(m.group().encode("utf-8")):
                ids.append(self.ranks.get(part, -1))
        return ids


_default: BPETokenizer | None = None


def default_bpe() -> BPETokenizer:
    """A process-wide tokenizer trained once on the seed corpus — the
    drop-in ``encoder_factory`` for ``token_count_pudf`` when no
    tokenizer wheel is installed."""
    global _default
    if _default is None:
        _default = BPETokenizer.train(_SEED_CORPUS, num_merges=200)
    return _default
