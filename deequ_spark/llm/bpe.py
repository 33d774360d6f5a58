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
           "bpe_token_count", "bpe_vocab", "bpe_encode_ids",
           "bpe_decode_ids"]

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


#: default single-character alphabet for :func:`bpe_vocab` — printable
#: ASCII minus whitespace (words are whitespace-split, so whitespace
#: never reaches a symbol). Non-ASCII corpora pass their own
#: ``base_chars``; anything outside the alphabet encodes as ``<unk>``.
BPE_BASE_CHARS = tuple(
    chr(c) for c in range(33, 127))


def bpe_vocab(merges: Sequence[Tuple[str, str]],
              base_chars: Sequence[str] = BPE_BASE_CHARS
              ) -> Dict[str, int]:
    """Deterministic token → id table from a merge list: id 0 is
    ``<unk>``, then ``</w>``, then the base characters (sorted,
    augmented with every character appearing in a merge side), then one
    id per merge product IN MERGE ORDER — the same convention the
    original BPE releases use, so ids are stable across engines and
    runs for a given merge list."""
    chars = set(base_chars)
    for a, b in merges:
        for side in (a, b):
            # END is an atomic symbol, never split into characters —
            # strip it before harvesting base characters from the side
            for ch in side.replace(END, ""):
                chars.add(ch)
    vocab: Dict[str, int] = {"<unk>": 0, END: 1}
    for ch in sorted(c for c in chars if c):
        if ch not in vocab:
            vocab[ch] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok == "<unk>" or tok.count(END) > 1 or \
                (END in tok and not tok.endswith(END)):
            # a merge product colliding with a reserved token, or
            # carrying the END marker mid-string (possible only when the
            # corpus contains literal '</w>' text), would corrupt decode
            # SILENTLY — fail loudly instead
            raise ValueError(
                f"merge product {tok!r} collides with reserved token "
                "conventions; the corpus contains literal marker text — "
                "pre-escape it before training")
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def bpe_encode_ids(df: DataFrame, text_col: str,
                   merges: Sequence[Tuple[str, str]],
                   out_col: str = "token_ids",
                   base_chars: Sequence[str] = BPE_BASE_CHARS
                   ) -> DataFrame:
    """Encode each document to an ``array<int>`` of token ids under the
    trained tokenizer — the training-example payload a packer/sharder
    exports. Unknown symbols (characters never seen at training time)
    map to ``<unk>`` (id 0). Arrow-batched pandas UDF with per-batch
    word memoization (Zipf makes the hit rate high); the merge table
    and vocab ship in the closure (broadcast-sized)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges, base_chars)

    @pandas_udf("array<int>")
    def encode(texts: pandas.Series) -> pandas.Series:
        import pandas as pd
        cache: Dict[str, List[int]] = {}

        def word_ids(w: str) -> List[int]:
            ids = cache.get(w)
            if ids is None:
                ids = [vocab.get(sym, 0)
                       for sym in bpe_encode_word(w, ranks)]
                cache[w] = ids
            return ids

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            ids: List[int] = []
            for w in t.lower().split():
                ids.extend(word_ids(w))
            out.append(ids)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))


def bpe_decode_ids(ids_col, merges: Sequence[Tuple[str, str]],
                   base_chars: Sequence[str] = BPE_BASE_CHARS
                   ) -> Column:
    """Inverse of :func:`bpe_encode_ids` as a pure Column expression:
    ids → tokens (a broadcast-sized CASE lookup is avoided by shipping
    the id→token array as an array literal and indexing it), ``</w>``
    becomes a space, ``<unk>`` the replacement char. Round-trips to the
    lowercased whitespace-normalized text for in-vocabulary corpora."""
    vocab = bpe_vocab(merges, base_chars)
    id2tok = [None] * len(vocab)
    for tok, i in vocab.items():
        id2tok[i] = tok
    table = F.array(*[F.lit(t) for t in id2tok])
    ids = ids_col if isinstance(ids_col, Column) else F.col(ids_col)
    # F.get: 0-based, NULL (not an ANSI INVALID_ARRAY_INDEX error, not a
    # from-the-end index) for out-of-range/negative ids — mapped to the
    # replacement char below so a foreign/corrupt id stream degrades,
    # never crashes the job
    toks = F.transform(
        ids, lambda i: F.coalesce(F.get(table, i), F.lit("<unk>")))
    # END can ride INSIDE a merged token ('low</w>' is one symbol) —
    # replace the marker substring, not just the standalone token
    joined = F.array_join(
        F.transform(toks, lambda t: F.when(t == "<unk>", F.lit("\ufffd"))
                    .otherwise(F.replace(t, F.lit(END), F.lit(" ")))),
        "")
    return F.rtrim(joined)
