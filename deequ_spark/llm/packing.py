"""Sequence packing, deterministic corpus sampling and domain-mixture
composition — the training-data-pipeline steps that sit between
"cleaned corpus" and "training batches" (beyond the reference's surface,
like the rest of deequ_spark.llm; the reference — awslabs/deequ — stops
at data quality).

Design for 100 TB:

* ``pack_sequences`` never globally sorts the corpus.  Documents are
  salted into ``n_groups`` independent streams (``id % n_groups`` —
  portable, deterministic), and the prefix-sum window that assigns token
  offsets is PARTITIONED BY the group, so the only shuffle is a G-way
  hash exchange and each window task scans one group.  G is the
  parallelism knob: at 100 TB you set it to a few × cluster cores and
  every group packs independently.
* ``hash_sample`` is a map-only filter (md5 threshold) — no shuffle, no
  RNG state, reproducible across engines and re-runs, and trivially
  pushable under column pruning (only the key column is hashed).
* ``stratified_sample`` is one window per stratum (row_number over an
  md5 ordering) — a single hash exchange on the stratum column; quotas
  are exact, selection is deterministic, and skewed strata parallelize
  across... the stratum is the unit, so a mega-stratum is one task's
  sort: for quota ≪ stratum size, the pre-filter
  ``hash_sample(quota / |stratum| · slack)`` keeps that sort bounded
  (see ``prefilter_fraction``).

Everything below is built-in Column expressions (whole-stage codegen,
no Python in the hot path).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pack_sequences", "assemble_packs", "pack_statistics",
           "hash_sample",
           "stratified_sample", "portable_hash_hex",
           "apportion_quotas", "mixture_sample"]


def portable_hash_hex(key: Column, chars: int = 8) -> Column:
    """Lowercase hex prefix of md5(key-as-string): identical in Spark and
    ANSI SQL engines (DuckDB, Trino, ...), uniform enough for sampling.
    Used instead of ``rand()``/``hash()`` so sampling decisions are
    reproducible across engines, re-runs, and cluster sizes."""
    return F.substring(F.md5(key.cast("string")), 1, chars)


def _fraction_threshold(fraction: float, chars: int = 8) -> str:
    """Hex string t such that P[md5_prefix < t] == fraction (up to
    16^-chars).  Comparing hex strings lexicographically == comparing
    the underlying integers, so this stays portable."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    scaled = int(round(fraction * (16 ** chars)))
    scaled = min(scaled, 16 ** chars)
    if scaled >= 16 ** chars:          # fraction == 1.0 keeps everything
        return "g"                     # > every hex digit
    return format(scaled, "0" + str(chars) + "x")


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                chars: int = 8) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    ``md5(key) prefix < threshold(fraction)``.

    Map-only (no shuffle, no driver state); the SAME rows are kept on
    any cluster size and in any engine that implements md5 — the
    property that makes held-out/train splits reproducible at 100 TB.
    """
    thr = _fraction_threshold(fraction, chars)
    return df.where(portable_hash_hex(F.col(key_col), chars) < F.lit(thr))


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      quota: int,
                      prefilter_fraction: Optional[float] = None
                      ) -> DataFrame:
    """Exact per-stratum quota sample: within each stratum keep the
    ``quota`` rows with the smallest ``(md5(key), key)`` — deterministic,
    engine-portable, and exact (a stratum with fewer rows than the quota
    keeps them all).

    One hash exchange on ``strata_col``; the per-stratum sort is the
    window.  For mega-strata (quota ≪ stratum size) pass
    ``prefilter_fraction`` to cheaply map-filter first — the window then
    sorts only ~``prefilter_fraction·|stratum|`` rows.  The caller picks
    a slack so that P[kept < quota] is negligible (e.g. 4·quota/|s|).
    """
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    src = df
    if prefilter_fraction is not None:
        src = hash_sample(df, key_col, prefilter_fraction)
    w = (Window.partitionBy(strata_col)
         .orderBy(portable_hash_hex(F.col(key_col)), F.col(key_col)))
    rn = "__dq_strat_rn"                 # avoid colliding with user columns
    return (src.withColumn(rn, F.row_number().over(w))
            .where(F.col(rn) <= quota).drop(rn))


def apportion_quotas(counts: "dict", weights: "dict", total: int) -> "dict":
    """Largest-remainder (Hamilton) apportionment of ``total`` sample
    slots across domains, in EXACT rational arithmetic (no float
    remainder ties — the same quotas fall out of any engine or runtime,
    which is what makes ``mixture_sample`` oracle-able bit-for-bit).

    Domains are the intersection of ``weights`` and ``counts`` (a
    weighted domain absent from the data gets nothing; a data domain
    without a weight is excluded); weights are normalized over that
    intersection. Each quota is capped at the domain's available count —
    deliberately WITHOUT redistributing the shortfall (redistribution
    would make quota_i depend on every other domain's availability,
    breaking the "my domain's sample is stable when other domains grow"
    property that incremental corpus builds rely on); callers who want
    the full ``total`` re-run with upweighted survivors.

    Ties in the fractional remainder break by domain name ascending —
    deterministic, engine-independent.
    """
    from fractions import Fraction
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    domains = sorted(set(weights) & set(counts))
    if not domains:
        return {}
    wsum = sum(Fraction(str(weights[d])) for d in domains)
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    ideal = {d: Fraction(str(weights[d])) * total / wsum for d in domains}
    base = {d: int(ideal[d]) for d in domains}
    leftover = total - sum(base.values())
    by_rem = sorted(domains, key=lambda d: (-(ideal[d] - base[d]), d))
    for d in by_rem[:leftover]:
        base[d] += 1
    return {d: min(base[d], counts[d]) for d in domains}


def mixture_sample(df: DataFrame, domain_col: str, key_col: str,
                   weights: "dict", total: int,
                   max_domains: int = 100_000) -> DataFrame:
    """Sample ``df`` down to a target DOMAIN MIXTURE — the Pile/LLaMA-
    style corpus-composition step: given per-domain weights (e.g.
    ``{"web": 0.6, "code": 0.25, "books": 0.15}``) and a total budget,
    keep exactly the apportioned number of rows per domain, selected by
    the deterministic md5 order (engine-portable, reproducible across
    re-runs and cluster sizes).

    Quotas come from :func:`apportion_quotas` (exact largest-remainder,
    capped at availability). Plan: one small count agg per domain
    (driver-bounded: more than ``max_domains`` distinct domains raises
    rather than building an unbounded collect), then ONE hash exchange
    on ``domain_col`` for the per-domain row_number window and a
    broadcast join against the tiny quota table. Skewed domains are one
    window task each — for quota ≪ domain size pre-filter with
    ``hash_sample`` like ``stratified_sample`` does.
    """
    cnt_rows = (df.groupBy(domain_col)
                .agg(F.count(F.lit(1)).alias("__dq_cnt"))
                .limit(max_domains + 1).collect())
    if len(cnt_rows) > max_domains:
        raise ValueError(
            f"more than {max_domains} distinct {domain_col} values — "
            "mixture quotas are a driver-side table; raise max_domains "
            "only if the domain cardinality is genuinely bounded")
    counts = {r[domain_col]: r["__dq_cnt"] for r in cnt_rows}
    quotas = apportion_quotas(counts, weights, total)
    if not quotas:
        return df.where(F.lit(False))
    spark = df.sparkSession
    domain_type = df.schema[domain_col].dataType
    qdf = spark.createDataFrame(
        [(d, q) for d, q in quotas.items()],
        T.StructType([T.StructField(domain_col, domain_type),
                      T.StructField("__dq_quota", T.LongType())]))
    w = (Window.partitionBy(domain_col)
         .orderBy(portable_hash_hex(F.col(key_col)), F.col(key_col)))
    rn = "__dq_mix_rn"
    return (df.join(F.broadcast(qdf), domain_col)
            .withColumn(rn, F.row_number().over(w))
            .where(F.col(rn) <= F.col("__dq_quota"))
            .drop(rn, "__dq_quota"))


def token_mixture_sample(df: DataFrame, domain_col: str, key_col: str,
                         tokens_col: Column, weights: "dict",
                         total_tokens: int,
                         max_domains: int = 100_000) -> DataFrame:
    """Sample down to a target domain mixture measured in TOKENS —
    :func:`mixture_sample`'s unit is rows, but training mixtures are
    specified in tokens (the Pile/LLaMA composition tables) and
    document lengths vary by orders of magnitude, so row quotas
    mis-deliver token mass. Per-domain token budgets come from
    :func:`apportion_quotas` over the domains' token TOTALS (same
    exact rational arithmetic, capped at availability, no shortfall
    redistribution); within a domain, documents are taken in the
    deterministic md5 order and a document is kept iff the PRECEDING
    cumulative token count is below the budget — the crossing document
    is included, so each domain delivers at least its budget whenever
    it has the mass (overshoot bounded by one document).

    Plan: one combinable per-domain token-sum agg (driver-bounded by
    ``max_domains``), then ONE hash exchange on ``domain_col`` for the
    cumulative window + a broadcast quota join — identical shuffle
    budget to ``mixture_sample``."""
    cnt_rows = (df.groupBy(domain_col)
                .agg(F.sum(tokens_col).alias("__dq_tok"))
                .limit(max_domains + 1).collect())
    if len(cnt_rows) > max_domains:
        raise ValueError(
            f"more than {max_domains} distinct {domain_col} values — "
            "mixture quotas are a driver-side table; raise max_domains "
            "only if the domain cardinality is genuinely bounded")
    counts = {r[domain_col]: int(r["__dq_tok"] or 0) for r in cnt_rows}
    quotas = apportion_quotas(counts, weights, total_tokens)
    if not quotas:
        return df.where(F.lit(False))
    spark = df.sparkSession
    domain_type = df.schema[domain_col].dataType
    qdf = spark.createDataFrame(
        [(d, q) for d, q in quotas.items()],
        T.StructType([T.StructField(domain_col, domain_type),
                      T.StructField("__dq_quota", T.LongType())]))
    w = (Window.partitionBy(domain_col)
         .orderBy(portable_hash_hex(F.col(key_col)), F.col(key_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    prev = "__dq_mix_prev"
    return (df.join(F.broadcast(qdf), domain_col)
            .withColumn(prev, F.coalesce(F.sum(tokens_col).over(w),
                                         F.lit(0)))
            .where(F.col(prev) < F.col("__dq_quota"))
            .drop(prev, "__dq_quota"))


def pack_sequences(df: DataFrame, id_col: str, tokens_col: Column,
                   budget: int,
                   n_groups: Optional[int] = None) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: conceptually
    concatenate every document's tokens in ``id`` order and cut the
    stream into fixed ``budget``-token packs; a document that straddles
    a boundary is SPLIT across consecutive packs (no padding waste,
    deterministic layout).

    Distribution: the corpus is salted into ``n_groups`` independent
    streams (``pmod(id, n_groups)``) and each stream packs
    independently, so the offset prefix-sum window is partitioned — no
    global sort, no single-task bottleneck.  Output grain is one row per
    (document × pack it lands in):

    ``group, pack_id, id, tokens, start_off, slice_tokens, n_slices``

    where ``slice_tokens`` is how many of the document's tokens fall in
    that pack and ``n_slices`` how many packs the document spans.
    ``sum(slice_tokens) == sum(tokens)`` (token conservation) and every
    pack except each group's last holds exactly ``budget`` tokens.

    ``n_groups`` defaults to 4× the session's default parallelism so
    each group's window sort stays a small fraction of the corpus on
    any cluster size — on a 1000-executor cluster the default becomes
    thousands of independent streams, not a fixed 32.  Pin it
    explicitly when the pack layout must be reproducible across
    clusters of different sizes.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_groups is None:
        n_groups = 4 * df.sparkSession.sparkContext.defaultParallelism
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")
    idc = F.col(id_col)
    grouped = df.select(
        idc.alias("id"),
        F.pmod(idc, F.lit(n_groups)).cast("long").alias("group"),
        tokens_col.cast("long").alias("tokens"),
    ).where(F.col("tokens") > 0)
    w = (Window.partitionBy("group").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, -1))
    offs = grouped.select(
        "group", "id", "tokens",
        F.coalesce(F.sum("tokens").over(w), F.lit(0)).alias("start_off"))
    b = F.lit(int(budget))
    first_pack = F.expr(f"start_off div {int(budget)}")
    last_pack = F.expr(f"(start_off + tokens - 1) div {int(budget)}")
    exploded = offs.select(
        "group", "id", "tokens", "start_off",
        F.explode(F.sequence(first_pack, last_pack)).alias("pack_id"))
    end_off = F.col("start_off") + F.col("tokens")
    pack_lo = F.col("pack_id") * b
    pack_hi = (F.col("pack_id") + 1) * b
    return exploded.select(
        "group", "pack_id", "id", "tokens", "start_off",
        (F.least(end_off, pack_hi) -
         F.greatest(F.col("start_off"), pack_lo)).alias("slice_tokens"),
        F.count(F.lit(1)).over(
            Window.partitionBy("group", "id")).alias("n_slices"))


def pack_statistics(packed: DataFrame, budget: int) -> DataFrame:
    """Corpus-level packing report over ``pack_sequences`` output:
    pack counts, fill, split-document accounting.  One groupBy on the
    (group, pack_id) grain then a global single-row agg."""
    per_pack = packed.groupBy("group", "pack_id").agg(
        F.sum("slice_tokens").alias("fill"),
        F.count(F.lit(1)).alias("docs_in_pack"))
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("fill").alias("total_tokens"),
        F.sum((F.col("fill") == budget).cast("long")).alias("full_packs"),
        F.max("docs_in_pack").alias("max_docs_per_pack"),
    )


def dsir_weights(df: DataFrame, id_col: str, text_col: str,
                 target_model: DataFrame,
                 raw_model: DataFrame) -> DataFrame:
    """Per-document log importance weight for DSIR (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): ``w(d) = ln p_target(d) − ln p_raw(d)`` under two
    bag-of-char-trigram models (:func:`..text.char_trigram_model` —
    charset-bounded, so both BROADCAST). Documents resembling the
    target distribution more than the raw one score positive.

    ONE corpus pass: explode trigrams once, two broadcast joins, one
    map-side-combinable per-doc sum. Returns the input plus
    ``dsir_weight`` (NULL for docs too short to hold a trigram) and
    ``n_trigrams``."""
    from pyspark.sql.functions import broadcast

    from .text import char_trigrams

    t_unseen = target_model.select("unseen_log_prob") \
        .first()["unseen_log_prob"]
    r_unseen = raw_model.select("unseen_log_prob") \
        .first()["unseen_log_prob"]
    tris = df.select(F.col(id_col).alias("__id"),
                     F.explode(char_trigrams(F.col(text_col)))
                     .alias("trigram"))
    joined = (tris
              .join(broadcast(target_model.select(
                  "trigram", F.col("log_prob").alias("__lt"))),
                  "trigram", "left")
              .join(broadcast(raw_model.select(
                  "trigram", F.col("log_prob").alias("__lr"))),
                  "trigram", "left"))
    per_doc = joined.groupBy("__id").agg(
        F.sum(F.coalesce("__lt", F.lit(t_unseen))
              - F.coalesce("__lr", F.lit(r_unseen))).alias("dsir_weight"),
        F.count(F.lit(1)).alias("n_trigrams"))
    return (df.join(per_doc, df[id_col] == per_doc["__id"], "left")
            .drop("__id"))


def importance_sample(df: DataFrame, id_col: str, text_col: str,
                      target: DataFrame, k: int,
                      temperature: float = 1.0,
                      hex_chars: int = 13) -> DataFrame:
    """DSIR selection: score every document's importance weight against
    ``target`` (the trusted corpus the output should resemble), then
    draw ``k`` documents WITHOUT replacement proportional to
    ``exp(w/temperature)`` via the Gumbel top-k trick — the classic
    weighted-sampling-as-ranking identity, so the whole draw is ONE
    ``orderBy().limit(k)`` (TakeOrderedAndProject, never a global
    sort).

    The Gumbel noise is ENGINE-PORTABLE, not rand(): ``u`` comes from
    the first ``hex_chars`` hex digits of md5(id) (an exact integer
    < 2^53 in both Spark and ANSI SQL), ``g = −ln(−ln u)`` — the same
    documents are drawn on any cluster size, any engine, any re-run.
    ``temperature → 0`` approaches deterministic top-k by weight;
    large temperature approaches a uniform sample. Docs too short to
    score (no trigrams) are never drawn."""
    from .text import char_trigram_model

    if k <= 0:
        raise ValueError("k must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    target_model = char_trigram_model(target, text_col)
    raw_model = char_trigram_model(df, text_col)
    weighted = dsir_weights(df, id_col, text_col, target_model, raw_model)
    span = 16 ** hex_chars
    v = F.conv(portable_hash_hex(F.col(id_col), hex_chars), 16, 10) \
         .cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(span))
    gumbel = -F.log(-F.log(u))
    key = F.col("dsir_weight") / F.lit(temperature) + gumbel
    return (weighted.where(F.col("dsir_weight").isNotNull())
            .withColumn("gumbel_key", key)
            .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
            .limit(k))


def length_bucketize(df: DataFrame, length_col, n_buckets: int = 8,
                     relative_error: float = 0.001,
                     output_col: str = "length_bucket") -> DataFrame:
    """Quantile length bucketing for batch shaping: assign each row to
    one of ``n_buckets`` roughly-equal-population buckets by a length
    (or any numeric) expression, so downstream batching groups
    similar-length sequences and padding waste collapses.

    The obvious encoding — ``ntile(n) OVER (ORDER BY len)`` — is a
    GLOBAL sort into a single window partition: one task owns the whole
    corpus. Instead: one ``approxQuantile`` pass learns the n−1 cut
    points (Greenwald-Khanna sketch, driver gets n−1 doubles), then
    assignment is a map-only ``width_bucket``-style expression — no
    shuffle at any size, bucket populations equal to within the sketch's
    ``relative_error``.

    Returns ``df`` + integer ``output_col`` in ``[0, n_buckets)``;
    NULL lengths get NULL buckets.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    col = F.col(length_col) if isinstance(length_col, str) else length_col
    probe = df.select(col.cast("double").alias("__len"))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = probe.approxQuantile("__len", qs, relative_error)
    # duplicate cuts (heavily repeated lengths) are fine: earlier bucket
    # wins, later ones are simply empty
    expr = F.lit(0)
    for i, c in enumerate(cuts):
        expr = F.when(col.cast("double") > F.lit(float(c)),
                      F.lit(i + 1)).otherwise(expr)
    return df.withColumn(
        output_col, F.when(col.isNotNull(), expr).cast("int"))


def assemble_packs(packed: DataFrame, ids_df: DataFrame,
                   budget: int,
                   id_col: str = "id",
                   ids_col: str = "token_ids") -> DataFrame:
    """Materialize the training EXAMPLES a :func:`pack_sequences` layout
    describes: join each document's token-id array, slice out the piece
    each (doc × pack) row covers, and assemble one row per pack —

    ``group, pack_id, token_ids (array), doc_spans (array<struct<id,
    n_tokens>> in pack order)``

    ``doc_spans`` is the document-boundary record an attention mask /
    loss mask needs (tokens of different documents must not attend to
    each other inside a packed example).

    ``budget`` must be the value the layout was packed with (slices of
    a document are contiguous in the token stream, so the tokens it
    already spent in earlier packs are ``max(0, pack_id·budget −
    start_off)`` — pure per-row arithmetic, the same closed form the
    oracle uses, instead of a corpus-wide window shuffle).

    Scale: map-only up to the per-pack assembly groupBy, whose
    collected payload is bounded by the BUDGET (a pack holds ≤ budget
    tokens by construction) — task memory is O(budget), never
    corpus-shaped."""
    sl = packed.withColumn(
        "__doc_off",
        F.greatest(F.col("pack_id") * F.lit(int(budget))
                   - F.col("start_off"), F.lit(0)))
    ids = ids_df.select(F.col(id_col).alias("id"),
                        F.col(ids_col).alias("__ids"))
    joined = sl.join(ids, "id").select(
        "group", "pack_id", "id", "start_off", "slice_tokens",
        F.slice(F.col("__ids"),
                (F.col("__doc_off") + 1).cast("int"),
                F.col("slice_tokens").cast("int")).alias("__piece"))
    return (joined.groupBy("group", "pack_id")
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col("start_off"), F.col("id"),
                F.col("slice_tokens"), F.col("__piece"))))
                .alias("__parts"))
            .select(
                "group", "pack_id",
                F.flatten(F.transform(F.col("__parts"),
                                      lambda p: p["__piece"]))
                .alias("token_ids"),
                F.transform(F.col("__parts"),
                            lambda p: F.struct(
                                p["id"].alias("id"),
                                p["slice_tokens"].alias("n_tokens")))
                .alias("doc_spans")))


def assign_split(df: DataFrame, group_col: str,
                 weights: dict, split_col: str = "split",
                 salt: str = "") -> DataFrame:
    """Leakage-safe train/validation/test assignment: every row of the
    same ``group_col`` value (domain, URL host, author, dedup cluster)
    lands in the SAME split, so near-duplicate documents sharing a group
    can never straddle the train/eval boundary — the standard guard
    against benchmark leakage when splitting a deduplicated-but-
    clustered corpus.

    ``weights`` maps split name -> fraction (must sum to ~1).  The
    assignment is the md5 portable hash of the group key against the
    cumulative weight thresholds (same mechanism as
    :func:`hash_sample`): deterministic across engines, re-runs, and
    cluster sizes, and purely map-only — no shuffle, no state, just a
    string hash and a chain of threshold comparisons, so it costs
    nothing at 100 TB.  ``salt`` re-rolls the assignment without
    touching the weights (e.g. per-epoch re-splits).
    """
    names = list(weights)
    if not names:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1, got {total}")
    # NULL groups hash as one sentinel group (md5 of NULL would be NULL,
    # silently dumping every NULL row into the residual split)
    key = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null"))
    h = portable_hash_hex(F.concat(key, F.lit(salt)))
    expr = F.lit(names[-1])  # last split takes the residual mass
    cum = 0.0
    branches = []
    for name in names[:-1]:
        cum += float(weights[name])
        branches.append((name, _fraction_threshold(cum)))
    for name, threshold in reversed(branches):
        expr = F.when(h < F.lit(threshold), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)
