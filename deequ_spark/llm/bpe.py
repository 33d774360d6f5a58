"""Byte-pair-encoding tokenizer training and encoding.

The Sennrich et al. (arXiv:1508.07909) formulation: BPE merges are
learned from the WORD-FREQUENCY table, not the raw corpus — so the
Spark side is ONE map-side-combined groupBy (corpus → (word, count)),
and the merge loop runs driver-side over that bounded table. This is
how production BPE trainers work: the corpus is touched once, the
iterative part never sees it.

Scale design:
- ``word_frequency_table``: explode words, one groupBy. The driver
  pull is capped at ``max_words`` (frequency-truncated vocabulary —
  standard practice; the tail of a 100 TB corpus is hapax noise that
  cannot win a merge anyway, and the cap bounds driver memory).
- ``train_bpe``: classic pair-count/argmax/merge loop over the word
  table. Deterministic: ties break on (count desc, pair lexicographic).
- ``bpe_token_count``: encodes per document with the merge list
  BROADCAST into an Arrow-batched pandas UDF; per-word encodings are
  memoized per batch (Zipf makes the hit rate high).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pandas  # noqa: F401 — pandas_udf type hints resolve at module scope
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequency_table", "train_bpe", "bpe_encode_word",
           "bpe_token_count"]

END = "</w>"


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over whitespace-split, lowercased words — the
    training input for BPE. One explode + one combinable groupBy."""
    return (df.select(F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                         lambda t: t != "")).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("count")))


def _pair_counts(vocab: Dict[Tuple[str, ...], int]) -> Dict[Tuple[str, str], int]:
    counts: Dict[Tuple[str, str], int] = {}
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_vocab(vocab: Dict[Tuple[str, ...], int],
                 pair: Tuple[str, str]) -> Dict[Tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: Dict[Tuple[str, ...], int] = {}
    for symbols, freq in vocab.items():
        res: List[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a \
                    and symbols[i + 1] == b:
                res.append(merged)
                i += 2
            else:
                res.append(symbols[i])
                i += 1
        out[tuple(res)] = out.get(tuple(res), 0) + freq
    return out


def train_bpe(df: DataFrame, text_col: str, n_merges: int = 200,
              min_pair_count: int = 2,
              max_words: int = 100_000,
              return_counts: bool = False):
    """Learn up to ``n_merges`` BPE merges from the corpus. Words carry
    the classic ``</w>`` end marker so merges distinguish word-final
    subwords. Stops early when no pair reaches ``min_pair_count``
    (merging hapax pairs memorizes noise). Ties break on
    (count desc, pair lex asc), so the merge list is deterministic for
    a given word-frequency table on any engine or cluster size.

    ``return_counts=True`` returns ``[(a, b, count), ...]`` — each
    merge with the pair count that won it, the auditable trace an
    external oracle can re-derive merge by merge."""
    rows = (word_frequency_table(df, text_col)
            .orderBy(F.col("count").desc(), F.col("word"))
            .limit(max_words).collect())
    vocab = {tuple(r["word"]) + (END,): int(r["count"]) for r in rows}
    merges: List[Tuple[str, str]] = []
    traced: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[pair] < min_pair_count:
            break
        merges.append(pair)
        traced.append((pair[0], pair[1], counts[pair]))
        vocab = _merge_vocab(vocab, pair)
    return traced if return_counts else merges


def bpe_encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Encode ONE word with trained merges (``ranks``: pair → merge
    index): repeatedly apply the lowest-ranked applicable merge — the
    standard greedy BPE encoder, identical to the trainer's segmentation
    for words it trained on."""
    symbols: List[str] = list(word) + [END]
    while len(symbols) > 1:
        best: Optional[Tuple[int, int]] = None   # (rank, position)
        for i, (a, b) in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get((a, b))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        _, i = best
        symbols[i:i + 2] = [symbols[i] + symbols[i + 1]]
    return symbols


def bpe_token_count(df: DataFrame, text_col: str,
                    merges: Sequence[Tuple[str, str]],
                    out_col: str = "bpe_tokens") -> DataFrame:
    """Per-document token count under the trained tokenizer — the real
    sequence-length signal for packing budgets and cost estimates (the
    whitespace count underestimates rare/long words a BPE splits).

    Arrow-batched pandas UDF; the merge table is tiny and ships inside
    the closure (broadcast), per-word encodings memoized per batch."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("long")
    def count_tokens(texts: pandas.Series) -> pandas.Series:
        import pandas as pd
        cache: Dict[str, int] = {}

        def doc_tokens(text) -> int:
            if text is None:
                return 0
            total = 0
            for w in text.lower().split():
                n = cache.get(w)
                if n is None:
                    n = len(bpe_encode_word(w, ranks))
                    cache[w] = n
                total += n
            return total

        return pd.Series([doc_tokens(t) for t in texts])

    return df.withColumn(out_col, count_tokens(F.col(text_col)))
