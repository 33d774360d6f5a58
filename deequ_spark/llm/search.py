"""Corpus search and token-statistics operators.

Ranked retrieval (BM25) and corpus-level token statistics (frequency
tables, Zipf fit) over a document table — the query side of a
training-data pipeline: find what's in the corpus, measure its token
distribution, spot degenerate sources.

Scale design (100 TB lens):
- BM25 is TWO MAP-ONLY PASSES over the corpus: pass 1 is a partial
  aggregate (N, avg doclen, per-term document frequency — one row out),
  pass 2 a projection computing the score per document. No shuffle at
  all; top-k uses ``orderBy().limit(k)`` which Spark plans as
  TakeOrderedAndProject (per-partition heap top-k + driver merge of k·p
  rows), never a global sort.
- The query's term list is tiny and rides as literal arrays inside a
  single ``F.aggregate`` fold, so the tokenizer regex is evaluated
  EXACTLY ONCE per row per pass (a naive per-term ``size(filter(...))``
  re-evaluates the tokenization q times after CollapseProject inlining).
- Token frequency tables shuffle once (hash groupBy on token) with
  map-side partial aggregation; the Zipf fit runs on the BOUNDED top-N
  slice (TakeOrdered), closed-form least squares on the driver.

Reference surface: the reference engine has no retrieval operator —
this extends the LLM-pipeline category (BASELINE.json north star) the
same way dedup/similarity do.
"""

from __future__ import annotations

import math
import re
from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WORD_PATTERN = r"[a-z0-9]+"


def word_tokens(text: Column, pattern: str = WORD_PATTERN) -> Column:
    """Lowercased word tokens as ``array<string>`` — the shared
    tokenizer for search/statistics ops. The default pattern is
    deliberately ASCII-simple so an external SQL engine (the driver's
    DuckDB oracle) reproduces it byte-for-byte with its own
    ``regexp_extract_all``."""
    return F.regexp_extract_all(F.lower(text), F.lit(pattern), 0)


def _tf_dl_fold(tokens: Column, terms: Sequence[str]):
    """One-pass fold over ``tokens`` producing ``struct(tf array, dl)``:
    per-query-term occurrence counts plus document length. Keeping both
    in ONE ``F.aggregate`` guarantees the (expensive) tokenizer
    expression appears exactly once in the plan."""
    terms_arr = F.array(*[F.lit(t) for t in terms])
    zero = F.struct(
        F.array_repeat(F.lit(0), len(terms)).alias("tf"),
        F.lit(0).alias("dl"))

    def merge(acc, tok):
        return F.struct(
            F.zip_with(acc["tf"], terms_arr,
                       lambda c, t: c + F.when(tok == t, 1).otherwise(0))
            .alias("tf"),
            (acc["dl"] + 1).alias("dl"))

    return zero, merge


def bm25_corpus_stats(df: DataFrame, text_col: str, terms: Sequence[str],
                      pattern: str = WORD_PATTERN) -> Dict[str, float]:
    """Pass 1 of BM25: corpus size N, average document length, and the
    per-term document frequency — ONE partial-aggregate job, one row
    collected. ``avgdl`` is exact (integer token counts summed as
    longs) so an external oracle reproduces the identical double."""
    zero, merge = _tf_dl_fold(word_tokens(F.col(text_col), pattern), terms)
    st = df.select(F.aggregate(word_tokens(F.col(text_col), pattern),
                               zero, merge).alias("st"))
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(F.col("st.dl").cast("long")).alias("dl_sum")]
    for i in range(len(terms)):
        aggs.append(F.sum((F.element_at(F.col("st.tf"), i + 1) > 0)
                          .cast("long")).alias(f"df_{i}"))
    row = st.agg(*aggs).collect()[0]
    n = row["n"]
    return {"n_docs": float(n),
            "avgdl": (row["dl_sum"] or 0) / n if n else 0.0,
            "df": [float(row[f"df_{i}"]) for i in range(len(terms))]}


def bm25_topk(df: DataFrame, id_col: str, text_col: str, query: str,
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              pattern: str = WORD_PATTERN) -> DataFrame:
    """Top-k documents for ``query`` under BM25 (Robertson/Lucene form):

        idf_t  = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))
        s(d)   = Σ_t idf_t · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl/avgdl))

    Returns ``(rank, <id_col>, score)`` with deterministic tie-break
    (score desc, id asc). Two map-only corpus passes, zero shuffles;
    the ranking is TakeOrderedAndProject, not a global sort — the same
    plan shape survives a 1000-executor 100 TB scan."""
    terms = sorted(set(re.findall(pattern, query.lower())))
    if not terms:
        raise ValueError("query produced no terms under the token pattern")
    stats = bm25_corpus_stats(df, text_col, terms, pattern)
    n, avgdl = stats["n_docs"], stats["avgdl"]
    if n == 0 or avgdl == 0:
        raise ValueError("empty corpus")
    idf = [math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
           for dft in stats["df"]]

    zero, merge = _tf_dl_fold(word_tokens(F.col(text_col), pattern), terms)

    def finish(st):
        dl = st["dl"].cast("double")
        norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
        score = F.lit(0.0)
        # fixed left-to-right term order: the per-doc float sum is
        # bit-identical to the oracle's identically-ordered SQL sum
        for i in range(len(terms)):
            tf = F.element_at(st["tf"], i + 1).cast("double")
            score = score + F.lit(idf[i]) * (tf * F.lit(k1 + 1.0)) \
                / (tf + norm)
        return score

    scored = df.select(
        F.col(id_col),
        F.aggregate(word_tokens(F.col(text_col), pattern),
                    zero, merge, finish).alias("score"))
    top = (scored.where(F.col("score") > 0)
           .orderBy(F.col("score").desc(), F.col(id_col))
           .limit(k))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.select(
        F.row_number().over(w).alias("rank"), id_col, "score")


def token_frequencies(df: DataFrame, text_col: str, top_n: int = 1000,
                      pattern: str = WORD_PATTERN) -> DataFrame:
    """Top-``top_n`` token frequency table ``(rank, token, freq)``.
    One hash-groupBy shuffle (map-side combined); the rank slice is
    TakeOrdered — bounded driver/output size regardless of vocabulary
    size. Tie-break (freq desc, token asc) is total, so ranks are
    engine-portable."""
    freq = (df.select(F.explode(word_tokens(F.col(text_col), pattern))
                      .alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("token"))
            .limit(top_n))
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return freq.select(F.row_number().over(w).alias("rank"),
                       "token", "freq")


def corpus_drift(df_a: DataFrame, df_b: DataFrame, text_col: str,
                 top_n: int = 1000,
                 pattern: str = WORD_PATTERN) -> Dict[str, object]:
    """Token-distribution drift between two corpus snapshots — the
    standard check before swapping in a new crawl: a shifted PSI/L∞
    means the new data speaks differently (new boilerplate, a language
    mix change, a scraper regression).

    The comparison vocabulary is the UNION of each side's top-``top_n``
    tokens (the head carries the distribution mass); everything else is
    folded into one ``__OTHER__`` bucket so both sides are complete
    distributions over the same bounded key set. Driver
    materialization is ≤ 2·top_n + 1 keys regardless of corpus size.

    Per side: one map-side-combined groupBy for the top-N slice, then
    one counting pass restricted to the union vocabulary via a
    BROADCAST semi-join (the union set is tiny by construction), plus
    a total-token count that rides the same scan. Metrics reuse the
    reference-parity ``distance`` module: L∞ and PSI over the bucketed
    distributions, plus the top drifted tokens by absolute
    probability gap.

    Returns ``{psi, l_infinity, n_tokens_a, n_tokens_b, union_size,
    other_a, other_b, top_drifted: [(token, p_a, p_b)]}``."""
    from ..distance import l_infinity_distance, psi

    def top_and_total(df):
        rows = token_frequencies(df, text_col, top_n, pattern).collect()
        total = (df.select(F.explode(word_tokens(F.col(text_col), pattern))
                           .alias("t"))
                 .agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"])
        return {r["token"]: r["freq"] for r in rows}, total

    head_a, n_a = top_and_total(df_a)
    head_b, n_b = top_and_total(df_b)
    union = sorted(set(head_a) | set(head_b))

    def counts_over(df, missing):
        """Exact counts for union keys a side's own top-N did not
        cover — one broadcast-semi-joined groupBy."""
        if not missing:
            return {}
        spark = df.sparkSession
        keys = spark.createDataFrame([(k,) for k in missing], "t string")
        got = (df.select(F.explode(word_tokens(F.col(text_col), pattern))
                         .alias("t"))
               .join(F.broadcast(keys), "t")
               .groupBy("t").agg(F.count(F.lit(1)).alias("c")).collect())
        return {r["t"]: r["c"] for r in got}

    full_a = dict(head_a)
    full_a.update(counts_over(df_a, [k for k in union if k not in head_a]))
    full_b = dict(head_b)
    full_b.update(counts_over(df_b, [k for k in union if k not in head_b]))

    # sorted key order → deterministic float summation in the metrics
    dist_a = {k: float(full_a.get(k, 0)) for k in union}
    dist_b = {k: float(full_b.get(k, 0)) for k in union}
    other_a = float(n_a - sum(full_a.get(k, 0) for k in union))
    other_b = float(n_b - sum(full_b.get(k, 0) for k in union))
    dist_a["__OTHER__"] = other_a
    dist_b["__OTHER__"] = other_b

    gaps = sorted(
        ((k, dist_a[k] / n_a if n_a else 0.0,
          dist_b[k] / n_b if n_b else 0.0) for k in union),
        key=lambda kv: (-abs(kv[1] - kv[2]), kv[0]))
    return {"psi": psi(dist_a, dist_b),
            "l_infinity": l_infinity_distance(dist_a, dist_b),
            "n_tokens_a": float(n_a), "n_tokens_b": float(n_b),
            "union_size": float(len(union)),
            "other_a": other_a, "other_b": other_b,
            "top_drifted": gaps[:10]}


def corpus_token_stats(df: DataFrame, text_col: str, top_n: int = 1000,
                       pattern: str = WORD_PATTERN) -> Dict[str, float]:
    """Corpus-level token statistics:

    - ``n_tokens`` / ``vocab`` — total token count and distinct-token
      count (one groupBy shuffle shared with the frequency table).
    - ``top1_freq`` / ``top{top_n}_share`` — mass concentration.
    - ``zipf_slope`` — least-squares slope of ln(freq) on ln(rank) over
      the top-``top_n`` tokens. A natural-language corpus sits near −1;
      a template-spam corpus flattens toward 0 at the head. The fit
      runs on the driver over the BOUNDED top-N rows (closed form,
      fixed rank-order summation → deterministic)."""
    rows = token_frequencies(df, text_col, top_n, pattern).collect()
    totals = (df.select(F.explode(word_tokens(F.col(text_col), pattern))
                        .alias("token"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.countDistinct("token").alias("v")).collect()[0])
    n_tokens, vocab = totals["n"], totals["v"]
    xs = [math.log(r["rank"]) for r in rows]
    ys = [math.log(r["freq"]) for r in rows]
    m = len(rows)
    slope = float("nan")
    if m >= 2:
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        denom = m * sxx - sx * sx
        if denom != 0:
            slope = (m * sxy - sx * sy) / denom
    top_mass = sum(r["freq"] for r in rows)
    return {"n_tokens": float(n_tokens), "vocab": float(vocab),
            "top1_freq": float(rows[0]["freq"]) if rows else 0.0,
            "top_n_mass": float(top_mass),
            "zipf_slope": slope}
