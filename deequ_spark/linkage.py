"""Similarity joins — record linkage without the cross product.

Fuzzy matching is the join the reference cannot express: "find pairs of
records whose names differ by at most k edits" or "documents whose token
sets overlap by Jaccard >= t".  The naive plan is an O(n^2) cross join —
at 100 TB that is not a plan at all.  Both operators here use *sound*
signature schemes (no false negatives, pruned candidates verified
exactly), so the result is EXACT — identical to the brute-force answer —
while the executed plan is a bounded hash join:

- :func:`edit_distance_join` — two sound signature schemes.
  Default (k <= 2, short strings): FastSS deletion neighborhoods
  (Bocek et al. 2007) — signatures are all <=k-deletion variants, which
  stay DIVERSE on shared-prefix data (ID schemes, catalog numbers),
  where fixed-position segments collapse into one quadratic bucket
  (measured: 358s -> 5.8s on 15k common-prefix names, see
  tools/AB_B25_NOTE.md).  Fallback (longer strings, k >= 3): PassJoin
  pigeonhole segments (Li, Deng & Feng, PVLDB 5(3), 2011) — if
  ``ed(s, t) <= k`` at least one of the k+1 contiguous segments of
  ``s`` survives all edits and appears in ``t`` verbatim shifted by at
  most k, so the index side emits k+1 segment keys and the probe side
  at most ``(k+1)(2k+1)^2`` substring keys per row.  Either way: one
  hash join + a thresholded ``levenshtein`` verify (early-exit codegen,
  Spark's 3-arg form) gives the exact pair set.
- :func:`token_jaccard_join` — prefix filtering (SSJoin/PPJoin;
  Chaudhuri, Ganti & Kaushik ICDE'06, Xiao et al. WWW'08).  Order each
  record's distinct tokens rarest-first by global document frequency;
  two sets with Jaccard >= t must share a token within each other's
  first ``n - ceil(t*n) + 1`` tokens.  Joining only on those prefix
  tokens (instead of a full inverted index over ALL tokens, as
  ``jaccard_similarity_pairs`` does) shrinks candidates by ~t/(1+t) and
  — because prefixes are *rare* tokens — sidesteps the hot-token skew
  that dominates a full inverted-index join.  Candidates are verified
  with an exact ``array_intersect`` Jaccard.

100 TB design notes
-------------------
Signature generation is map-only expression code (whole-stage codegen:
``substr``/``sequence``/``transform``/``slice`` — no Python).  Each
operator shuffles once to join signatures and once to distinct the
candidate pairs; pair verification is codegen.  Skew: PassJoin keys
carry ``(segment_index, source_length)`` alongside the text so common
substrings spread across (k+1)(2k+1) key groups; prefix-filter keys are
by construction the RAREST tokens of each record.  Residual skew is AQE
skew-join territory — both joins are plain equi-joins, so
``spark.sql.adaptive.optimizeSkewedJoin`` applies untouched.

Reference parity: the reference repo has no similarity-join operator
(closest is grouping-based uniqueness); this module is part of the
beyond-reference training-data surface (record linkage, near-duplicate
mining, entity resolution at crawl scale).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_join", "token_jaccard_join",
           "token_containment_join", "tokenize_set"]

_EMPTY_INT_SEQ = "CAST(array() AS array<int>)"


def _seg_geometry(l: Column, i: Column, k: int) -> Tuple[Column, Column]:
    """(0-based start, length) of segment ``i`` of an ``l``-char string
    split into k+1 contiguous parts: the first ``k+1 - (l mod (k+1))``
    parts get ``floor(l/(k+1))`` chars, the remainder one char more.
    Deterministic, so probe and index sides agree byte-for-byte."""
    parts = F.lit(k + 1)
    base = F.floor(l / parts).cast("int")
    rem = (l % parts).cast("int")
    cut = (parts - rem).cast("int")  # count of short segments
    length = F.when(i < cut, base).otherwise(base + 1)
    start = (F.when(i < cut, i * base)
             .otherwise(i * base + (i - cut))).cast("int")
    return start, length


def _key_struct(seg: Column, i: Column, l: Column) -> Column:
    return F.struct(seg.cast("string").alias("seg"),
                    i.cast("int").alias("i"),
                    l.cast("int").alias("l"))


def _index_keys(s: Column, k: int) -> Column:
    """k+1 segment keys for the indexed side; strings shorter than k+1
    chars get the single short-string key ('', -1, len) instead (they
    cannot be split into k+1 non-empty parts)."""
    l = F.length(s)
    idxs = F.sequence(F.lit(0), F.lit(k))

    def make(i: Column) -> Column:
        start, ln = _seg_geometry(l, i, k)
        return _key_struct(s.substr(start + 1, ln), i, l)

    long_keys = F.transform(idxs, make)
    short_keys = F.array(_key_struct(F.lit(""), F.lit(-1), l))
    return F.when(l >= k + 1, long_keys).otherwise(short_keys)


def _probe_keys(t: Column, k: int) -> Column:
    """Every key an indexed string s with ``|len(s) - len(t)| <= k`` and
    ``ed(s, t) <= k`` could have produced: for each candidate source
    length l and segment index i, the substrings of t of the segment's
    length within +-k of the segment's home position (an untouched
    segment shifts by at most the k net insertions/deletions)."""
    m = F.length(t)

    lo = F.greatest(F.lit(k + 1), m - k)
    hi = m + k
    lengths = F.when(hi >= lo, F.sequence(lo, hi)) \
               .otherwise(F.expr(_EMPTY_INT_SEQ))

    def per_l(l: Column) -> Column:
        idxs = F.sequence(F.lit(0), F.lit(k))

        def per_i(i: Column) -> Column:
            start, ln = _seg_geometry(l, i, k)
            p_lo = F.greatest(F.lit(0), start - k)
            p_hi = F.least(m - ln, start + k)
            positions = F.when(p_hi >= p_lo, F.sequence(p_lo, p_hi)) \
                         .otherwise(F.expr(_EMPTY_INT_SEQ))
            return F.transform(
                positions, lambda p: _key_struct(t.substr(p + 1, ln), i, l))

        return F.flatten(F.transform(idxs, per_i))

    long_keys = F.flatten(F.transform(lengths, per_l))

    # short-string partners: indexed strings with len < k+1
    s_lo = F.greatest(F.lit(0), m - k)
    s_hi = F.least(F.lit(k), m + k)
    short_ls = F.when(s_hi >= s_lo, F.sequence(s_lo, s_hi)) \
                .otherwise(F.expr(_EMPTY_INT_SEQ))
    short_keys = F.transform(
        short_ls, lambda l: _key_struct(F.lit(""), F.lit(-1), l))

    return F.array_distinct(F.concat(long_keys, short_keys))


def _empty_str_array() -> Column:
    return F.expr("CAST(array() AS array<string>)")


def _deletion_variants(s: Column, k: int) -> Column:
    """FastSS signature set (Bocek et al. 2007, "Fast similarity
    search in large dictionaries"): every string reachable from ``s``
    by deleting at most ``k`` characters.  If ``ed(s, t) <= k`` the two
    strings share a variant (delete each side's edited positions along
    an optimal alignment), so joining on variants is a SOUND blocking —
    and, unlike fixed segments, the variants of common-prefix data stay
    diverse (deleting different positions yields different strings), so
    no single join bucket degenerates.  |variants| = O(n^k): only used
    for k <= 2 over short strings."""
    if k > 2:
        raise ValueError("deletion variants implemented for k <= 2")
    n = F.length(s)
    parts = [F.array(s)]
    if k >= 1:
        d1 = F.when(n >= 1, F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat(s.substr(F.lit(1), i),
                               s.substr(i + 2, n)))) \
             .otherwise(_empty_str_array())
        parts.append(d1)
    if k >= 2:
        d2 = F.when(n >= 2, F.flatten(F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.transform(
                F.sequence(i + 1, n - 1),
                lambda j: F.concat(s.substr(F.lit(1), i),
                                   s.substr(i + 2, j - i - 1),
                                   s.substr(j + 2, n)))))) \
             .otherwise(_empty_str_array())
        parts.append(d2)
    return F.array_distinct(F.concat(*parts))


#: auto method: deletion variants only when every string is at most this
#: long — past it the O(n^k) signature count outweighs the skew immunity
_DELETION_MAX_LEN = 64


def edit_distance_join(left: DataFrame, string_col: str, threshold: int,
                       id_col: str,
                       right: Optional[DataFrame] = None,
                       right_string_col: Optional[str] = None,
                       right_id_col: Optional[str] = None,
                       method: str = "auto") -> DataFrame:
    """Exact similarity join on Levenshtein distance <= ``threshold``.

    Self-join when ``right`` is None: returns each unordered pair once
    with ``id_a < id_b`` (self-pairs excluded).  Two-table mode returns
    ``(id_a from left, id_b from right)``.  NULL strings never match.

    Output columns: ``id_a, id_b, dist`` (dist = exact edit distance).

    Two sound blocking schemes, both verified with Spark's thresholded
    ``levenshtein(a, b, k)`` (returns -1 past the threshold, so the DP
    early-exits once the band is exceeded); ``method``:

    - ``'deletions'`` — FastSS deletion neighborhoods: signatures =
      all <=k-deletion variants (O(n^k) per row, k <= 2 only).  Join
      buckets stay small even when every string shares a long prefix —
      fixed-position segments degenerate there (one bucket holding ALL
      rows => quadratic candidates; measured 225M candidate pairs on
      15k 'Customer#...' names with segments vs seconds with
      deletions).
    - ``'segments'`` — PassJoin pigeonhole segments (bounded
      (k+1)(2k+1)^2 keys/row regardless of length): the right scheme
      for longer strings or k >= 3, but skew-prone on shared prefixes.
    - ``'auto'`` (default) — deletions when k <= 2 and the longest
      string is <= 64 chars (one cheap max(length) job), else segments.

    Either way: map-only signature explode, ONE equi-join, one distinct
    on the candidate pair, codegen verify.  No cross join at any size.
    """
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if method not in ("auto", "deletions", "segments"):
        raise ValueError(f"unknown method {method!r}")
    from deequ_spark.llm.dedup import ensure_parallelism
    k = int(threshold)
    self_join = right is None
    # signature explode is heavy per-row work — an under-partitioned
    # input (single parquet file) would serialize it on one task
    left = ensure_parallelism(left)
    r_df = left if self_join else ensure_parallelism(right)
    r_str = string_col if self_join else (right_string_col or string_col)
    r_id = id_col if self_join else (right_id_col or id_col)

    if method == "auto":
        if k <= 2:
            mx = left.agg(F.max(F.length(string_col))).collect()[0][0]
            if not self_join:
                mx_r = r_df.agg(F.max(F.length(r_str))).collect()[0][0]
                mx = max(mx or 0, mx_r or 0)
            method = "deletions" if (mx or 0) <= _DELETION_MAX_LEN \
                else "segments"
        else:
            method = "segments"
    if method == "deletions" and k > 2:
        raise ValueError("method='deletions' supports threshold <= 2")

    if method == "deletions":
        a = (left.where(F.col(string_col).isNotNull())
             .select(F.col(id_col).alias("id_a"),
                     F.col(string_col).alias("s_a"))
             .withColumn("sig", F.explode(
                 _deletion_variants(F.col("s_a"), k))))
        b = (r_df.where(F.col(r_str).isNotNull())
             .select(F.col(r_id).alias("id_b"),
                     F.col(r_str).alias("s_b"))
             .withColumn("sig", F.explode(
                 _deletion_variants(F.col("s_b"), k))))
        cand = a.join(b, "sig").select("id_a", "s_a", "id_b", "s_b")
    else:
        a = (left.where(F.col(string_col).isNotNull())
             .select(F.col(id_col).alias("id_a"),
                     F.col(string_col).alias("s_a"),
                     F.explode(_index_keys(F.col(string_col), k))
                     .alias("key"))
             .select("id_a", "s_a", "key.seg", "key.i", "key.l"))
        b = (r_df.where(F.col(r_str).isNotNull())
             .select(F.col(r_id).alias("id_b"),
                     F.col(r_str).alias("s_b"),
                     F.explode(_probe_keys(F.col(r_str), k)).alias("key"))
             .select("id_b", "s_b", "key.seg", "key.i", "key.l"))
        cand = a.join(b, ["seg", "i", "l"]) \
                .select("id_a", "s_a", "id_b", "s_b")
    if self_join:
        # either direction of a true pair may be the one the pigeonhole
        # found — canonicalize before the distinct so each survives once
        cand = (cand.where(F.col("id_a") != F.col("id_b"))
                .select(F.when(F.col("id_a") < F.col("id_b"),
                               F.struct("id_a", "s_a", "id_b", "s_b"))
                        .otherwise(F.struct(F.col("id_b").alias("id_a"),
                                            F.col("s_b").alias("s_a"),
                                            F.col("id_a").alias("id_b"),
                                            F.col("s_a").alias("s_b")))
                        .alias("p"))
                .select("p.id_a", "p.s_a", "p.id_b", "p.s_b"))
    cand = cand.distinct()

    dist = F.levenshtein(F.col("s_a"), F.col("s_b"), k)
    return (cand.withColumn("dist", dist)
            .where(F.col("dist") >= 0)
            .select("id_a", "id_b", "dist"))


def tokenize_set(text: Column) -> Column:
    """Distinct lowercase alphanumeric tokens of ``text`` — the token-set
    domain for :func:`token_jaccard_join`.  Engine-portable: identical to
    ``regexp_split_to_array(lower(x), '[^a-z0-9]+')`` + empty filter in
    ANSI engines (the class is ASCII-only in both Java and RE2 regexes,
    so non-Latin scripts tokenize to the empty set in both)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda x: x != ""))


def token_jaccard_join(df: DataFrame, id_col: str, text_col: str,
                       threshold: float,
                       right: Optional[DataFrame] = None,
                       right_id_col: Optional[str] = None,
                       right_text_col: Optional[str] = None) -> DataFrame:
    """Exact join on token-set Jaccard similarity >= ``threshold``.

    Self-join when ``right`` is None — output ``id_a, id_b, jaccard``
    with ``id_a < id_b``, each pair once.  Two-table mode (the
    cross-corpus shape: new crawl vs existing corpus, corpus vs
    benchmark) emits ``id_a`` from ``df`` and ``id_b`` from ``right``;
    token document frequencies — and with them the prefix order — are
    computed over BOTH sides so the prefix-filter guarantee holds across
    the join.  jaccard is exact — ``|A∩B| / |A∪B|`` over
    :func:`tokenize_set` sets.

    Output-size caveat: this enumerates the FULL exact pair set, which
    is quadratic in duplicate-cluster size by definition (a cluster of m
    copies IS m(m-1)/2 pairs).  On corpora dominated by near-duplicate
    clusters, use the dedup stack instead (``llm.dedup``:
    minhash_lsh_pairs + star caps + components emit O(m) per cluster);
    this join is for moderate-similarity search where the pair list
    itself is the deliverable.

    Prefix filter: tokens of each record are ordered rarest-first by
    global document frequency (ties by token text, so the order is
    deterministic and engine-portable); two sets with Jaccard >= t MUST
    share a token inside each's first ``n - ceil(t*n) + 1`` tokens, so
    only those prefix tokens enter the join.  Because prefixes hold the
    RAREST tokens, the join keys are anti-skewed by construction — the
    "the"/"and" hot buckets that cripple a full inverted index never
    appear.  Plan: one groupBy for document frequencies, one join to
    attach them (token-keyed, vocabulary-sized), one prefix equi-join,
    distinct on the pair, two id-keyed joins to re-attach token arrays,
    codegen ``array_intersect`` verify.  Records with empty token sets
    are dropped (Jaccard undefined).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from deequ_spark.llm.dedup import ensure_parallelism
    self_join = right is None
    df = ensure_parallelism(df)
    if not self_join:
        right = ensure_parallelism(right)

    def _recs(frame, idc, txtc):
        return (frame.select(F.col(idc).alias("id"),
                             tokenize_set(F.col(txtc)).alias("toks"))
                .where(F.size("toks") > 0))

    recs_a = _recs(df, id_col, text_col)
    recs_b = recs_a if self_join else _recs(
        right, right_id_col or id_col, right_text_col or text_col)

    toks_a = recs_a.select("id", F.explode("toks").alias("tok"))
    toks_b = toks_a if self_join \
        else recs_b.select("id", F.explode("toks").alias("tok"))
    # document frequencies over EVERY record entering the join — the
    # prefix order must be one global order or the filter loses pairs
    tok_src = toks_a if self_join else toks_a.unionByName(toks_b)
    tok_df = tok_src.groupBy("tok").agg(F.count("*").alias("df"))

    def _ranked(toks):
        # rarest-first order carried as a sortable (df, tok) struct —
        # no global row_number window, so no single-partition shuffle
        r = (toks.join(tok_df, "tok")
             .groupBy("id")
             .agg(F.array_sort(F.collect_list(F.struct("df", "tok")))
                  .alias("ordered")))
        return r.select(
            "id",
            F.transform("ordered", lambda s: s["tok"]).alias("toks"),
            F.size("ordered").alias("n"))

    def _prefix(ranked):
        prefix_len = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n"))
                      + F.lit(1)).cast("int")
        return ranked.select(
            "id", "n", F.explode(F.slice("toks", 1, prefix_len))
            .alias("tok"))

    ranked_a = _ranked(toks_a)
    ranked_b = ranked_a if self_join else _ranked(toks_b)
    pa = _prefix(ranked_a).select(F.col("id").alias("id_a"),
                                  F.col("n").alias("n_a"), "tok")
    pb = _prefix(ranked_b).select(F.col("id").alias("id_b"),
                                  F.col("n").alias("n_b"), "tok")
    # |A| and |B| within a factor of t of each other — necessary for
    # Jaccard >= t
    size_ok = ((F.col("n_b") * F.lit(threshold) <= F.col("n_a"))
               & (F.col("n_a") * F.lit(threshold) <= F.col("n_b")))
    pair_ok = (F.col("id_a") < F.col("id_b")) if self_join else F.lit(True)
    cand = (pa.join(pb, "tok").where(pair_ok & size_ok)
            .select("id_a", "id_b")
            .distinct())

    ta = ranked_a.select(F.col("id").alias("id_a"),
                         F.col("toks").alias("t_a"),
                         F.col("n").alias("n_a"))
    tb = ranked_b.select(F.col("id").alias("id_b"),
                         F.col("toks").alias("t_b"),
                         F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("t_a", "t_b"))
    jacc = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (cand.join(ta, "id_a").join(tb, "id_b")
            .withColumn("jaccard", jacc.cast("double"))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def token_containment_join(df: DataFrame, id_col: str, text_col: str,
                           threshold: float) -> DataFrame:
    """Exact ASYMMETRIC containment join: ordered pairs where at least
    ``threshold`` of record A's token set appears in record B
    (``|A∩B| / |A| >= t``, ``id_a != id_b``; both directions evaluated
    independently).  This is the relation symmetric Jaccard misses: a
    tweet quoted inside a news article, a doc swallowed by an
    aggregator page — the small side is ~fully contained while the
    Jaccard of the pair is tiny.

    Prefix filter on the CONTAINED side only (the same pigeonhole as
    :func:`token_jaccard_join`: containment >= t means A misses at most
    ``nA - ceil(t*nA)`` tokens, so one of its first
    ``nA - ceil(t*nA) + 1`` rarest tokens must be shared).  The
    containing side cannot be prefix-filtered — its size is unbounded —
    so it contributes a full token index; because A's prefixes hold
    RARE tokens, the hot-token join buckets an inverted index suffers
    mostly never match.  Size filter: ``nB >= ceil(t * nA)`` (B must
    have room for the shared tokens).  Exact ``array_intersect``
    verify.  Output: ``id_a, id_b, containment`` (A contained in B).

    Output-size caveat (the token_jaccard_join caveat, amplified by
    asymmetry): the prefix filter's leverage comes from DISCRIMINATIVE
    tokens (a Zipf tail — real corpora).  On a low-diversity corpus
    (tiny vocabulary, form letters) "rarest" tokens are still hot AND
    the TRUE ordered pair set is itself near-quadratic — the pair list
    is the deliverable and it is big by definition, not by plan defect
    (tools/scale_check.py gates candidate growth on the realistic
    shape).  For dedup-style use on such corpora, the dedup stack's
    capped-bucket operators are the right tool, not an exact join.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from deequ_spark.llm.dedup import ensure_parallelism
    df = ensure_parallelism(df)

    recs = (df.select(F.col(id_col).alias("id"),
                      tokenize_set(F.col(text_col)).alias("toks"))
            .where(F.size("toks") > 0))
    toks = recs.select("id", F.explode("toks").alias("tok"))
    tok_df = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = (toks.join(tok_df, "tok")
              .groupBy("id")
              .agg(F.array_sort(F.collect_list(F.struct("df", "tok")))
                   .alias("ordered")))
    ranked = ranked.select(
        "id", F.transform("ordered", lambda s: s["tok"]).alias("toks"),
        F.size("ordered").alias("n"))

    prefix_len = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n"))
                  + F.lit(1)).cast("int")
    pa = (ranked.select("id", "n",
                        F.explode(F.slice("toks", 1, prefix_len))
                        .alias("tok"))
          .select(F.col("id").alias("id_a"), F.col("n").alias("n_a"),
                  "tok"))
    pb = toks.select(F.col("id").alias("id_b"), "tok")
    cand = (pa.join(pb, "tok")
            .where(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b", "n_a")
            .distinct())

    ta = ranked.select(F.col("id").alias("id_a"),
                       F.col("toks").alias("t_a"))
    tb = ranked.select(F.col("id").alias("id_b"),
                       F.col("toks").alias("t_b"),
                       F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("t_a", "t_b"))
    cont = inter / F.col("n_a")
    return (cand.join(ta, "id_a").join(tb, "id_b")
            .where(F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
            .withColumn("containment", cont.cast("double"))
            .where(F.col("containment") >= threshold)
            .select("id_a", "id_b", "containment"))
