"""Byte-pair-encoding subword tokenizer (Sennrich et al. 2016, public).

Three stages with the classic web-scale split:

- ``word_frequencies`` — the only corpus-sized stage: one explode +
  ``groupBy(word)`` shuffle (map-side combine collapses repeats before the
  exchange), truncated to the top-N words by (freq desc, word) — the
  frequency truncation every production BPE trainer applies.
- ``train_bpe`` — the merge loop runs DRIVER-SIDE over the bounded
  word-frequency table (same bounded-dim precedent as the k-means fits in
  similarity.py): greedy most-frequent adjacent pair, ties broken by the
  lexicographically smallest pair so training is deterministic.
- ``bpe_tokenize`` — the distributed hot path: Arrow-batched
  ``mapInPandas`` with the merge-rank dict captured in the closure
  (broadcast-sized) and per-worker word memoization, so the merge walk
  costs per UNIQUE word per worker, not per occurrence.

Upgrades text.py's chars/4 "BPE-ish" token ESTIMATE to real subword
counts; the reference has no tokenizer (spans, not corpora) — this is
driver-mandate territory (token counting / training-data pipeline).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab_words: int = 1_000_000,
) -> DataFrame:
    """(word, freq) for the top ``max_vocab_words`` words by
    (freq desc, word asc) — deterministic truncation order."""
    w = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
    return (
        w.where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_vocab_words)
    )


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame | None = None,
    n_merges: int = 200,
    text_col: str = "text",
    word_freqs: DataFrame | None = None,
    max_vocab_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Ordered merge list. Stops early when no pair occurs twice (merging
    a singleton pair cannot compress anything)."""
    if word_freqs is None:
        if docs is None:
            raise ValueError("pass docs or word_freqs")
        word_freqs = word_frequencies(docs, text_col, max_vocab_words)
    vocab: dict[tuple, int] = {
        tuple(r["word"]) + (EOW,): int(r["freq"]) for r in word_freqs.collect()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best, freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append(best)
        vocab = {_merge_word(sym, best): f for sym, f in vocab.items()}
    return merges


def encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Greedy lowest-rank merge walk — the standard BPE apply order (rank
    order reproduces training exactly; greedy-by-position would not)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Adds ``bpe_tokens array<string>`` + ``n_bpe_tokens int``. Map-only
    Arrow-batched stage; no shuffle."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = T.StructType(
        list(docs.schema.fields)
        + [
            T.StructField("bpe_tokens", T.ArrayType(T.StringType()), False),
            T.StructField("n_bpe_tokens", T.IntegerType(), False),
        ]
    )

    def tokenizer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for wd in str(text).split(" "):
                    if not wd:
                        continue
                    t = cache.get(wd)
                    if t is None:
                        t = encode_word(wd, ranks)
                        cache[wd] = t
                    toks.extend(t)
                toks_col.append(toks)
                n_col.append(len(toks))
            pdf = pdf.copy()
            pdf["bpe_tokens"] = toks_col
            pdf["n_bpe_tokens"] = pd.Series(n_col, dtype="int32")
            yield pdf

    return docs.mapInPandas(tokenizer, schema)
