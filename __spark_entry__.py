"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises the deequ_spark ENGINE (fused analyzer
runs / VerificationSuite) on the driver's parquet tables and returns the
resulting metrics as a small DataFrame; ``oracle_sql()`` recomputes the
same metrics independently in DuckDB SQL.

Determinism strategy for the value-hash compare:
  * count/ratio/min/max metrics are integer-derived or selections → both
    engines produce bit-identical doubles; emitted raw.
  * sums/means run on DECIMAL-cast columns → exact in both engines.
  * genuinely float-fuzzy metrics (stddev family, entropy, MI, quantile
    interpolation) are quantized on BOTH sides with floor(value * 1e6),
    which gives a ~1e-9 boundary-collision probability per metric.
  * approximate sketches (HLL, approx quantiles) are checked against their
    accuracy contract (|est/exact − 1| within bound) → boolean metric.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _metrics_df(spark: SparkSession, pairs) -> DataFrame:
    rows = [(k, float(v)) for k, v in pairs]
    return spark.createDataFrame(rows, "metric string, value double")


def _fuzz(v: float) -> float:
    """floor(v·1e6) — deterministic quantization mirrored in the oracles."""
    return float(math.floor(v * 1e6))


def _run(spark, sf_dir, table, analyzers):
    from deequ_spark import do_analysis_run
    df = _load(spark, sf_dir, table)
    ctx = do_analysis_run(df, analyzers)
    out = {}
    for a, m in ctx.metric_map.items():
        if not m.is_success:
            raise RuntimeError(f"{a}: {m.error}")
        out[a] = m.value
    return ctx, out


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: a full VerificationSuite over sf0.001 lineitem — fused
    single-scan metric computation + constraint evaluation."""
    from deequ_spark import Check, CheckLevel, VerificationSuite

    df = _load(spark, "/root/testdata/sf0.001", "lineitem")
    check = (Check(CheckLevel.WARNING, "lineitem quality")
             .has_size(lambda n: n > 0)
             .is_complete("l_orderkey")
             .is_complete("l_extendedprice")
             .are_unique(["l_orderkey", "l_linenumber"])
             .is_non_negative("l_quantity")
             .has_min("l_discount", lambda v: v >= 0.0)
             .has_max("l_tax", lambda v: v <= 1.0)
             .is_contained_in("l_returnflag", ["A", "N", "R"])
             .has_completeness("l_shipdate", lambda v: v > 0.95))
    result = VerificationSuite().on_data(df).add_check(check).run()
    return result.check_results_as_dataframe(spark)


# ---------------------------------------------------------------------------
# queries — one entry per operator family (SURVEY §2)
# ---------------------------------------------------------------------------

def q_size(spark, sf_dir):
    from deequ_spark import Size
    _, vals = _run(spark, sf_dir, "lineitem",
                   [Size(), Size(where="l_quantity < 25")])
    a_all, a_filtered = Size(), Size(where="l_quantity < 25")
    return _metrics_df(spark, [("size_all", vals[a_all]),
                               ("size_filtered", vals[a_filtered])])


def q_completeness(spark, sf_dir):
    from deequ_spark import Completeness
    analyzers = [Completeness("o_orderkey"), Completeness("o_orderpriority"),
                 Completeness("o_totalprice", where="o_totalprice > 100000")]
    _, vals = _run(spark, sf_dir, "orders", analyzers)
    return _metrics_df(spark, [
        ("completeness_key", vals[analyzers[0]]),
        ("completeness_priority", vals[analyzers[1]]),
        ("completeness_filtered", vals[analyzers[2]])])


def q_compliance(spark, sf_dir):
    from deequ_spark import Compliance
    analyzers = [
        Compliance("qty_pos", "l_quantity > 0"),
        Compliance("disc_range", "l_discount BETWEEN 0.0 AND 0.1"),
        Compliance("price_gt_tax", "l_extendedprice > l_tax"),
        Compliance("qty_small_filtered", "l_quantity < 10", where="l_discount > 0.05"),
    ]
    _, vals = _run(spark, sf_dir, "lineitem", analyzers)
    return _metrics_df(spark, [
        ("compliance_qty_pos", vals[analyzers[0]]),
        ("compliance_disc_range", vals[analyzers[1]]),
        ("compliance_price_gt_tax", vals[analyzers[2]]),
        ("compliance_filtered", vals[analyzers[3]])])


def q_pattern_match(spark, sf_dir):
    from deequ_spark import PatternMatch
    analyzers = [PatternMatch("o_orderpriority", r"^[0-9]-[A-Z ]+$"),
                 PatternMatch("o_orderstatus", r"^[OF]$")]
    _, vals = _run(spark, sf_dir, "orders", analyzers)
    return _metrics_df(spark, [
        ("pattern_priority", vals[analyzers[0]]),
        ("pattern_status", vals[analyzers[1]])])


def q_min_max(spark, sf_dir):
    from deequ_spark import ColumnRange, Maximum, Minimum
    analyzers = [Minimum("l_extendedprice"), Maximum("l_extendedprice"),
                 Minimum("l_quantity", where="l_discount > 0.05"),
                 Maximum("l_tax"), ColumnRange("l_quantity")]
    _, vals = _run(spark, sf_dir, "lineitem", analyzers)
    return _metrics_df(spark, [
        ("min_price", vals[analyzers[0]]),
        ("max_price", vals[analyzers[1]]),
        ("min_qty_filtered", vals[analyzers[2]]),
        ("max_tax", vals[analyzers[3]]),
        ("range_qty", vals[analyzers[4]])])


def q_sum_mean(spark, sf_dir):
    """Sum/Mean on decimal-cast columns — exact in both engines."""
    from deequ_spark import Mean, Sum, do_analysis_run
    df = _load(spark, sf_dir, "lineitem").withColumn(
        "price_dec", F.col("l_extendedprice").cast("decimal(18,2)")).withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(18,2)"))
    analyzers = [Sum("price_dec"), Mean("price_dec"), Sum("qty_dec"),
                 Mean("qty_dec"), Sum("qty_dec", where="l_returnflag = 'A'")]
    ctx = do_analysis_run(df, analyzers)
    vals = {a: m.value for a, m in ctx.metric_map.items()}
    return _metrics_df(spark, [
        ("sum_price", vals[analyzers[0]]),
        ("mean_price", vals[analyzers[1]]),
        ("sum_qty", vals[analyzers[2]]),
        ("mean_qty", vals[analyzers[3]]),
        ("sum_qty_flag_a", vals[analyzers[4]])])


def q_moments(spark, sf_dir):
    """StdDev/Variance/Skewness/Kurtosis/Correlation — fuzz-quantized."""
    from deequ_spark import (Correlation, Kurtosis, Skewness,
                             StandardDeviation, Variance)
    analyzers = [StandardDeviation("l_quantity"), Variance("l_quantity"),
                 Skewness("l_quantity"), Kurtosis("l_quantity"),
                 Correlation("l_quantity", "l_extendedprice")]
    _, vals = _run(spark, sf_dir, "lineitem", analyzers)
    return _metrics_df(spark, [
        ("stddev_qty", _fuzz(vals[analyzers[0]])),
        ("variance_qty", _fuzz(vals[analyzers[1]])),
        ("skewness_qty", _fuzz(vals[analyzers[2]])),
        ("kurtosis_qty", _fuzz(vals[analyzers[3]])),
        ("corr_qty_price", _fuzz(vals[analyzers[4]]))])


def q_quantiles(spark, sf_dir):
    from deequ_spark import ExactQuantile, InterquartileRange
    analyzers = [ExactQuantile("l_quantity", 0.5),
                 ExactQuantile("l_quantity", 0.9),
                 ExactQuantile("l_extendedprice", 0.25),
                 InterquartileRange("l_extendedprice")]
    _, vals = _run(spark, sf_dir, "lineitem", analyzers)
    return _metrics_df(spark, [
        ("median_qty", _fuzz(vals[analyzers[0]])),
        ("p90_qty", _fuzz(vals[analyzers[1]])),
        ("p25_price", _fuzz(vals[analyzers[2]])),
        ("iqr_price", _fuzz(vals[analyzers[3]]))])


def q_uniqueness(spark, sf_dir):
    from deequ_spark import (CountDistinct, Distinctness, Uniqueness,
                             UniqueValueRatio)
    analyzers = [Uniqueness(("o_custkey",)), UniqueValueRatio(("o_custkey",)),
                 Distinctness(("o_custkey",)), CountDistinct(("o_custkey",)),
                 Uniqueness(("o_orderkey",))]
    _, vals = _run(spark, sf_dir, "orders", analyzers)
    return _metrics_df(spark, [
        ("uniqueness_custkey", vals[analyzers[0]]),
        ("uvr_custkey", vals[analyzers[1]]),
        ("distinctness_custkey", vals[analyzers[2]]),
        ("count_distinct_custkey", vals[analyzers[3]]),
        ("uniqueness_orderkey", vals[analyzers[4]])])


def q_entropy(spark, sf_dir):
    from deequ_spark import Entropy
    analyzers = [Entropy("o_orderstatus"), Entropy("o_orderpriority")]
    _, vals = _run(spark, sf_dir, "orders", analyzers)
    return _metrics_df(spark, [
        ("entropy_status", _fuzz(vals[analyzers[0]])),
        ("entropy_priority", _fuzz(vals[analyzers[1]]))])


def q_duplicate_rows(spark, sf_dir):
    from deequ_spark import DuplicateRowCount
    analyzers = [DuplicateRowCount(("l_returnflag", "l_linestatus")),
                 DuplicateRowCount(("l_orderkey", "l_linenumber"))]
    _, vals = _run(spark, sf_dir, "lineitem", analyzers)
    return _metrics_df(spark, [
        ("dup_flag_status", vals[analyzers[0]]),
        ("dup_pk", vals[analyzers[1]])])


def q_datatype(spark, sf_dir):
    from deequ_spark import DataType, do_analysis_run
    df = _load(spark, sf_dir, "orders").withColumn(
        "key_str", F.col("o_orderkey").cast("string"))
    analyzers = [DataType("o_orderpriority"), DataType("key_str")]
    ctx = do_analysis_run(df, analyzers)
    rows = []
    for a, label in [(analyzers[0], "priority"), (analyzers[1], "key_str")]:
        dist = ctx.metric_map[a].value
        for t in ["Integral", "Fractional", "Boolean", "String", "Unknown"]:
            rows.append((f"dt_{label}_{t}", dist.values[t].ratio))
    return _metrics_df(spark, rows)


def q_histogram(spark, sf_dir):
    from deequ_spark import Histogram
    analyzer = Histogram("l_returnflag")
    _, vals = _run(spark, sf_dir, "lineitem", [analyzer])
    dist = vals[analyzer]
    rows = [(f"hist_{k}_abs", dv.absolute) for k, dv in dist.values.items()]
    rows += [(f"hist_{k}_ratio", dv.ratio) for k, dv in dist.values.items()]
    rows.append(("hist_bins", float(dist.number_of_bins)))
    return _metrics_df(spark, rows)


def q_mutual_information(spark, sf_dir):
    from deequ_spark import MutualInformation
    analyzer = MutualInformation(("l_returnflag", "l_linestatus"))
    _, vals = _run(spark, sf_dir, "lineitem", [analyzer])
    return _metrics_df(spark, [("mi_flag_status", _fuzz(vals[analyzer]))])


def q_approx_count_distinct(spark, sf_dir):
    """Sketch accuracy contract: |estimate/exact − 1| ≤ 0.05."""
    from deequ_spark import ApproxCountDistinct, CountDistinct
    analyzers = [ApproxCountDistinct("o_custkey"), CountDistinct(("o_custkey",)),
                 ApproxCountDistinct("o_orderkey"), CountDistinct(("o_orderkey",))]
    _, vals = _run(spark, sf_dir, "orders", analyzers)
    ok1 = abs(vals[analyzers[0]] / vals[analyzers[1]] - 1.0) <= 0.05
    ok2 = abs(vals[analyzers[2]] / vals[analyzers[3]] - 1.0) <= 0.05
    return _metrics_df(spark, [("acd_custkey_ok", 1.0 if ok1 else 0.0),
                               ("acd_orderkey_ok", 1.0 if ok2 else 0.0)])


def q_approx_quantile(spark, sf_dir):
    """Rank-error contract: approx p50 within exact [p48, p52]."""
    from deequ_spark import ApproxQuantile, ExactQuantile
    analyzers = [ApproxQuantile("l_extendedprice", 0.5, 0.01),
                 ExactQuantile("l_extendedprice", 0.48),
                 ExactQuantile("l_extendedprice", 0.52)]
    _, vals = _run(spark, sf_dir, "lineitem", analyzers)
    ok = vals[analyzers[1]] <= vals[analyzers[0]] <= vals[analyzers[2]]
    return _metrics_df(spark, [("aq_median_ok", 1.0 if ok else 0.0)])


def q_verification(spark, sf_dir):
    """End-to-end check evaluation — statuses recomputed in SQL by oracle."""
    from deequ_spark import Check, CheckLevel, VerificationSuite
    df = _load(spark, sf_dir, "lineitem")
    check = (Check(CheckLevel.ERROR, "e2e")
             .has_size(lambda n: n >= 50000)
             .has_completeness("l_orderkey", lambda v: v == 1.0)
             .has_min("l_quantity", lambda v: v >= 1.0)
             .has_max("l_discount", lambda v: v <= 0.5)
             .satisfies("l_quantity <= 10", "small_qty", lambda v: v > 0.5)
             .has_uniqueness(("l_orderkey", "l_linenumber"), lambda v: v == 1.0))
    result = VerificationSuite().on_data(df).add_check(check).run()
    crs = list(result.check_results.values())[0].constraint_results
    labels = ["size", "completeness", "min", "max", "satisfies", "uniqueness"]
    rows = [(f"check_{label}", 1.0 if cr.status.value == "Success" else 0.0)
            for label, cr in zip(labels, crs)]
    return _metrics_df(spark, rows)


# ---------------------------------------------------------------------------
# LLM-pipeline operators (dedup / similarity / text analysis / multimodal)
# ---------------------------------------------------------------------------

def q_exact_dedup(spark, sf_dir):
    from deequ_spark.llm import deduplicate_exact, exact_duplicates, fingerprint
    docs = _load(spark, sf_dir, "documents")
    n = docs.count()
    n_distinct_text = deduplicate_exact(docs, ["text"]).count()
    dup_groups = exact_duplicates(docs, ["lang", "source"]).count()
    n_fp = docs.select(fingerprint(F.col("text")).alias("fp")) \
        .agg(F.countDistinct("fp")).collect()[0][0]
    return _metrics_df(spark, [
        ("docs_total", n),
        ("docs_distinct_text", n_distinct_text),
        ("dup_lang_source_groups", dup_groups),
        ("distinct_fingerprints", n_fp)])


def q_jaccard_dedup(spark, sf_dir):
    """Exact all-pairs n-gram Jaccard via inverted-index join."""
    from deequ_spark.llm import jaccard_similarity_pairs
    docs = _load(spark, sf_dir, "documents")
    n_05 = jaccard_similarity_pairs(docs, "doc_id", "text", 0.5, 3).count()
    n_08 = jaccard_similarity_pairs(docs, "doc_id", "text", 0.8, 3).count()
    return _metrics_df(spark, [
        ("jaccard_pairs_05", n_05),
        ("jaccard_pairs_08", n_08)])


def q_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs, exact-verified (recall ≈ 1 − 7e-15 per
    pair at j=0.8 with 32 bands × 2 rows) — oracled against the exact
    Jaccard pair count."""
    from deequ_spark.llm import minhash_lsh_pairs
    docs = _load(spark, sf_dir, "documents")
    n = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8,
                          num_hashes=64, bands=32, shingle_n=3).count()
    return _metrics_df(spark, [("lsh_pairs_08", n)])


def q_hot_bucket_cap(spark, sf_dir):
    """Hot-bucket cap contract (deequ_spark/llm/dedup.py capped_pair_expr,
    VERDICT r6 #1): a duplicate cluster ABOVE the cap star-expands to
    exactly m−1 candidate pairs; clusters below the cap keep the full
    C(m,2) expansion; connected-components dedup keeps one
    representative per cluster either way. The corpus is constructed
    arithmetically (1 mega-cluster of 400 identical docs + 19 clusters
    of 30, disjoint vocabularies), so the oracle is the closed form."""
    from deequ_spark.llm import deduplicate_near, minhash_lsh_pairs
    n_mega, n_sub, sub_sz = 400, 19, 30
    total = n_mega + n_sub * sub_sz
    docs = (spark.range(total).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_mega, F.lit(0))
        .otherwise(F.floor((F.col("id") - n_mega) / sub_sz) + 1)
        .cast("long").alias("cluster")))
    token = F.concat(F.lit("t"), F.col("cluster").cast("string"))
    docs = docs.withColumn("text",
                           F.array_join(F.array_repeat(token, 6), " "))
    cands = minhash_lsh_pairs(docs, "doc_id", "text", 0.8,
                              verify_exact=False)
    n_cand = cands.count()
    n_star = cands.where((F.col("id_a") < n_mega)
                         & (F.col("id_b") < n_mega)).count()
    verified = minhash_lsh_pairs(docs, "doc_id", "text", 0.8)
    kept = deduplicate_near(docs, "doc_id", verified).count()
    return _metrics_df(spark, [
        ("candidates_total", n_cand),
        ("mega_star_pairs", n_star),
        ("kept_after_dedup", kept)])


# simhash oracle parameters — shared by q_simhash and _simhash_oracle_sql
_SIMHASH_N, _SIMHASH_BITS, _SIMHASH_MAXH = 3, 32, 3


def q_near_dedup(spark, sf_dir):
    """End-to-end near-dedup: exact Jaccard pairs → connected components
    (iterative min-label propagation) → one representative per component.
    Oracle recomputes the same pairs and components with a recursive-CTE
    transitive closure, then compares the component labeling AND the
    deduplicated corpus size."""
    from deequ_spark.llm import (deduplicate_near, jaccard_similarity_pairs,
                                 near_duplicate_components)
    docs = _load(spark, sf_dir, "documents")
    pairs = jaccard_similarity_pairs(docs, "doc_id", "text",
                                     threshold=0.5, shingle_n=3)
    comp = near_duplicate_components(pairs)
    kept = deduplicate_near(docs, "doc_id", pairs).count()
    rows = [(int(r["id"]), int(r["component"]))
            for r in comp.orderBy("id").collect()]
    rows.append((-1, kept))  # sentinel row: deduplicated corpus size
    return spark.createDataFrame(rows, "id long, component long")


_NEAR_DEDUP_ORACLE = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
    THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
    ELSE [array_to_string(t, ' ')] END) AS shingles
  FROM toks
), w AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
  FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT i, j FROM inter
  JOIN sizes sa ON sa.doc_id = inter.i
  JOIN sizes sb ON sb.doc_id = inter.j
  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
), edges AS (
  SELECT i AS src, j AS dst FROM pairs
  UNION SELECT j, i FROM pairs
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
), comp AS (
  SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a
)
SELECT id, component FROM comp
UNION ALL
SELECT -1 AS id,
       (SELECT COUNT(*) FROM documents) -
       (SELECT COUNT(*) FROM comp WHERE id <> component) AS component
ORDER BY id
"""


def q_simhash(spark, sf_dir):
    """SimHash near-dup PAIR SET, fully oracled: fingerprints use the
    31-bit portable polynomial shingle hash (identical in DuckDB), the
    engine finds pairs via the k+1-block pigeonhole join, and the oracle
    brute-forces bit_count(xor(a,b)) <= k over all pairs — verifying both
    the fingerprint computation and the block-join's exact recall."""
    from deequ_spark.llm import portable_shingle_hash, simhash_near_duplicates
    docs = _load(spark, sf_dir, "documents")
    return (simhash_near_duplicates(docs, "doc_id", "text",
                                    max_hamming=_SIMHASH_MAXH,
                                    shingle_n=_SIMHASH_N, bits=_SIMHASH_BITS,
                                    hash_fn=portable_shingle_hash)
            .select("id_a", "id_b",
                    F.col("hamming").cast("int").alias("hamming"))
            .orderBy("id_a", "id_b"))


def _simhash_oracle_sql() -> str:
    """DuckDB brute-force oracle for q_simhash: recompute the portable
    simhash fingerprints (same shingling, same 31-bit polynomial hash,
    same per-bit majority), then all-pairs bit_count(xor) filter."""
    n, bits, maxh, p31 = (_SIMHASH_N, _SIMHASH_BITS, _SIMHASH_MAXH,
                          (1 << 31) - 1)
    bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(t) >= {n}
    THEN [array_to_string(t[i:i+{n - 1}], ' ')
          for i in range(1, len(t) - {n} + 2)]
    ELSE [array_to_string(t, ' ')] END) AS shingles
  FROM toks
), hashed AS (
  SELECT doc_id, unnest(list_transform(shingles, s ->
    list_reduce(list_prepend(CAST(0 AS BIGINT),
                             [CAST(ascii(c) AS BIGINT)
                              for c in string_split(s, '')]),
                (acc, x) -> (acc * 131 + x) % {p31}))) AS h
  FROM sh
), fp AS (
  SELECT doc_id, {bit_terms} AS f
  FROM hashed GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= {maxh}
ORDER BY id_a, id_b
"""


def q_text_quality(spark, sf_dir):
    from deequ_spark.llm import text_quality, token_count_regex
    docs = _load(spark, sf_dir, "documents")
    quality = text_quality(docs, "text")
    agg = quality.agg(
        F.sum("q_n_tokens").alias("tok"),
        F.sum("q_n_chars").alias("chars"),
        F.sum(F.regexp_count(F.col("text"), F.lit(r"[^\w\s]"))).alias("punct"),
        F.sum(token_count_regex(F.col("text"))).alias("retok"),
        F.sum(F.size(F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                     lambda t: t != "")))).alias("dtok"),
    ).collect()[0]
    # ratios of integer sums → single deterministic division
    return _metrics_df(spark, [
        ("sum_ws_tokens", agg["tok"]),
        ("sum_chars", agg["chars"]),
        ("sum_regex_tokens", agg["retok"]),
        ("punct_per_char", agg["punct"] / agg["chars"]),
        ("distinct_token_ratio", agg["dtok"] / agg["tok"])])


def q_pii(spark, sf_dir):
    """PII scrubbing (training-data cleaning): deterministic synthetic PII
    (emails, IPs, SSNs, phones, cards) is salted onto the documents table
    IDENTICALLY in both engines, then per-kind counts + redaction totals
    are compared. Verifies that every PII pattern matches and redacts the
    same spans under Java regex (Spark) and RE2 (DuckDB)."""
    from deequ_spark.llm import PII_PATTERNS, pii_counts, redact_pii
    docs = _load(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(" contact u"),
                        F.col("doc_id").cast("string"), F.lit("@ex.com ip 10."),
                        (F.col("doc_id") % 256).cast("string"), F.lit(".0.1")))
         .when(F.col("doc_id") % 3 == 1,
               F.concat(F.col("text"),
                        F.lit(" ssn 123-45-6789 call 555-123-4567"
                              " card 4111-1111-1111-1111")))
         .otherwise(F.col("text")).alias("text"))
    counted = pii_counts(salted, "text")
    red = redact_pii(F.col("text"))
    row = counted.agg(
        *[F.sum(f"pii_{k}").alias(k) for k in PII_PATTERNS],
        F.sum(F.length(red)).alias("redacted_len"),
        F.sum(F.length("text")).alias("original_len"),
        F.sum((red != F.col("text")).cast("long")).alias("docs_changed"),
    ).collect()[0]
    return _metrics_df(spark, [(k, row[k]) for k in PII_PATTERNS] + [
        ("redacted_len", row["redacted_len"]),
        ("original_len", row["original_len"]),
        ("docs_changed", row["docs_changed"])])


def _pii_oracle_sql() -> str:
    """DuckDB oracle for q_pii — same salt expression, same patterns
    (RE2-compatible by construction), chained global regexp_replace in
    PII_PATTERNS order."""
    from deequ_spark.llm import PII_PATTERNS
    red = "text"
    for pat in PII_PATTERNS.values():
        red = f"regexp_replace({red}, '{pat}', '[PII]', 'g')"
    count_rows = "\n            UNION ALL ".join(
        f"SELECT '{k}' AS metric, CAST(SUM(len(regexp_extract_all(text, "
        f"'{pat}'))) AS DOUBLE) AS value FROM salted"
        for k, pat in PII_PATTERNS.items())
    return f"""
            WITH salted AS (
              SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN text || ' contact u' ||
                          CAST(doc_id AS VARCHAR) || '@ex.com ip 10.' ||
                          CAST(doc_id % 256 AS VARCHAR) || '.0.1'
                     WHEN doc_id % 3 = 1 THEN text ||
                          ' ssn 123-45-6789 call 555-123-4567 card 4111-1111-1111-1111'
                     ELSE text END AS text
              FROM documents)
            {count_rows}
            UNION ALL SELECT 'redacted_len',
                CAST(SUM(length({red})) AS DOUBLE) FROM salted
            UNION ALL SELECT 'original_len',
                CAST(SUM(length(text)) AS DOUBLE) FROM salted
            UNION ALL SELECT 'docs_changed',
                CAST(SUM(CASE WHEN {red} <> text THEN 1 ELSE 0 END) AS DOUBLE)
                FROM salted
    """


def q_language_id(spark, sf_dir):
    from deequ_spark.llm import language_id
    docs = _load(spark, sf_dir, "documents")
    pred = language_id(docs, "text")
    rows = (pred.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n"))
            .collect())
    counts = {r["lang_pred"]: r["n"] for r in rows}
    agreement = (pred.where(F.col("lang_pred") == F.col("lang")).count())
    out = [(f"pred_{lang}", counts.get(lang, 0))
           for lang in ["de", "en", "es", "fr", "zh", "unknown"]]
    out.append(("label_agreement", agreement))
    return _metrics_df(spark, out)


# one fixed sample sentence per language (no apostrophes — both engines
# see these as plain string literals); the trigram classifier must label
# every one correctly, and the oracle replays the FULL argmax in SQL
_LANG_SAMPLES = {
    "en": "the king and the queen were standing in the garden of the palace",
    "de": "der alte mann und die junge frau gehen durch einen schönen wald",
    "es": "la casa de mis padres que está en la ciudad es muy grande",
    "fr": "le chien de la voisine est dans le jardin avec les enfants",
    "it": "il libro che ho letto di questo autore non era molto lungo",
    "pt": "a casa de meus pais não é longe da estação de comboios",
    "nl": "de kinderen van de buren spelen in het park met een bal",
    "sv": "jag tycker om att läsa böcker och att skriva långa brev",
    "da": "det er en god dag at gå en tur og se på byen til aften",
    "fi": "minä olen ollut tässä kaupungissa monta vuotta ja pidän siitä",
    "pl": "nie wiem czy on przyjdzie na spotkanie w przyszłym tygodniu",
    "cs": "to je velmi dobrý nápad a myslím že se nám to podaří",
    "hu": "az egyetemen sok érdekes előadást hallgattam meg tavaly",
    "tr": "bu şehirde yaşayan insanlar için daha iyi bir gelecek istiyoruz",
    "ro": "în orașul nostru copiii învață multe lucruri despre știință și artă",
    "ru": "мы пошли на прогулку по набережной после длинного рабочего дня",
    "ar": "ذهبنا في الصباح الى السوق لشراء الخضار من المزارعين",
    "zh": "我们在一个很大的城市里生活了很多年是很好的",
    "ja": "わたしは毎日の朝に公園を散歩するのが好きだった",
    "ko": "우리는 주말에 가족과 함께 공원에 가는 것을 좋아한다",
}


def q_language_id_trigram(spark, sf_dir):
    """20-language char-n-gram ID (llm/text.py TRIGRAM_PROFILES): classify
    one fixed sample per language and report per-sample correctness plus
    the true-language profile score; the oracle recomputes BOTH — the
    scores via the same length/replace arithmetic and the argmax via a
    rank window — entirely in SQL."""
    from deequ_spark.llm import language_id_trigrams, trigram_score

    samples = spark.createDataFrame(sorted(_LANG_SAMPLES.items()),
                                    "lang string, text string")
    pred = language_id_trigrams(samples, "text")
    rows = []
    for r in pred.select(
            "lang", "lang_pred",
            *[trigram_score(F.col("text"), lang).alias(f"s_{lang}")
              for lang in _LANG_SAMPLES]).collect():
        rows.append((f"pred_{r['lang']}",
                     1.0 if r["lang_pred"] == r["lang"] else 0.0))
        rows.append((f"score_{r['lang']}", float(r[f"s_{r['lang']}"])))
    return _metrics_df(spark, sorted(rows))


def _language_id_trigram_oracle_sql() -> str:
    from deequ_spark.llm import TRIGRAM_PROFILES
    values = ",\n        ".join(
        f"('{lang}', '{text}')" for lang, text in sorted(_LANG_SAMPLES.items()))

    def score_expr(lang):
        terms = [
            f"(length(p) - length(replace(p, '{t}', ''))) / {len(t)}"
            for t in TRIGRAM_PROFILES[lang]]
        return " + ".join(terms)

    score_selects = "\n        UNION ALL ".join(
        f"SELECT lang, '{cand}' AS cand, {score_expr(cand)} AS score FROM padded"
        for cand in sorted(TRIGRAM_PROFILES))
    return f"""
        WITH samples(lang, text) AS (VALUES
        {values}),
        padded AS (SELECT lang, ' ' || lower(text) || ' ' AS p FROM samples),
        scores AS (
        {score_selects}),
        best AS (SELECT lang, cand, score,
                        ROW_NUMBER() OVER (PARTITION BY lang
                                           ORDER BY score DESC, cand ASC) AS rn
                 FROM scores)
        SELECT 'pred_' || lang AS metric,
               CASE WHEN score > 0 AND cand = lang THEN 1.0 ELSE 0.0 END AS value
        FROM best WHERE rn = 1
        UNION ALL
        SELECT 'score_' || lang, CAST(score AS DOUBLE)
        FROM scores WHERE cand = lang
    """


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 of vec_id=0 (exactness baseline for ANN)."""
    from deequ_spark.llm import brute_force_topk
    emb = _load(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    top = (brute_force_topk(emb.where(F.col("vec_id") != 0), "vec_id",
                            "embedding", [float(v) for v in qvec], k=10)
           .collect())
    return _metrics_df(spark, [(str(r["id"]), _fuzz(r["cosine"])) for r in top])


def q_multimodal(spark, sf_dir):
    """Binary-column plumbing + REAL stdlib decoders (llm/multimodal.py):
    (a) encode text → mapInPandas feature extraction (Arrow batches) →
    aggregate, byte math oracled against DuckDB; (b) per-doc synthetic
    BMP/WAV payloads (dimensions derived from doc_id arithmetic) pushed
    through encode_bmp → decode_image → real_resize (nearest-neighbor)
    and encode_wav_pcm16 → decode_audio — decoded width/height/frame/
    duration sums recomputed by the oracle from the same doc_id
    arithmetic, which pins the full encode→decode round-trip; (c) NEW r7:
    per-doc synthetic PNGs (zlib + scanline filters, channels cycling
    1..4) through encode_png → decode_image (pixel-exact asserted
    in-task) and real_resize (format-preserving PNG→PNG); (d) NEW r7:
    per-doc BASELINE JPEGs (llm/jpeg.py T.81 codec, alternating 4:4:4 /
    4:2:0) through encode_jpeg → decode_image (lossy round-trip error
    bound asserted in-task) and real_resize (JPEG→JPEG); (e) NEW r7:
    per-doc GIFs (llm/gif.py LZW codec, alternating interlaced) through
    encode_gif → decode_image (pixel-exact asserted in-task) and
    real_resize (GIF→GIF — nearest-neighbor preserves the ≤256-color
    palette bound); (f) NEW r8: per-doc PROGRESSIVE JPEGs (SOF2, DC
    first/refine + AC first/refine scans) — decode must equal the
    baseline decode PIXEL-EXACTLY (same quantizer), counted per doc and
    oracled as prog_jpeg_exact_count == COUNT(*)."""
    from deequ_spark.llm import attach_binary_payload, extract_binary_features
    docs = _load(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "text", "doc_id")
    feats = extract_binary_features(media)
    agg = feats.agg(F.sum("n_bytes").alias("b"),
                    F.countDistinct("sha256_prefix").alias("d"),
                    F.count(F.lit(1)).alias("n")).collect()[0]

    import numpy as np
    import pandas as pd
    from deequ_spark.llm.multimodal import (decode_audio, decode_image,
                                            encode_bmp, encode_png,
                                            encode_wav_pcm16, real_resize)

    dec_schema = ("img_w int, img_h int, rs_w int, rs_h int, "
                  "png_w int, png_h int, png_c int, png_rs_w int, "
                  "jpg_w int, jpg_h int, jpg_rs_w int, "
                  "pjpg_w int, pjpg_exact int, "
                  "gif_w int, gif_h int, gif_rs_w int, "
                  "wav_frames int, wav_rate int")

    def synth_and_decode(batches):
        from deequ_spark.llm.gif import encode_gif
        from deequ_spark.llm.jpeg import encode_jpeg
        for pdf in batches:
            out = {k: [] for k in ("img_w", "img_h", "rs_w", "rs_h",
                                   "png_w", "png_h", "png_c", "png_rs_w",
                                   "jpg_w", "jpg_h", "jpg_rs_w",
                                   "pjpg_w", "pjpg_exact",
                                   "gif_w", "gif_h", "gif_rs_w",
                                   "wav_frames", "wav_rate")}
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                img = np.full((1 + i % 5, 1 + i % 7, 3), i % 251,
                              dtype=np.uint8)
                dh, dw, _, _ = decode_image(encode_bmp(img))
                rh, rw, _, _ = decode_image(
                    real_resize(encode_bmp(img), 4, 3))
                png_img = np.full((1 + i % 6, 1 + i % 8, 1 + i % 4),
                                  (i * 37) % 251, dtype=np.uint8)
                ph, pw, pc, ppx = decode_image(encode_png(png_img))
                assert np.array_equal(ppx, png_img)    # pixel-exact
                prh, prw, prc, _ = decode_image(
                    real_resize(encode_png(png_img), 5, 2))
                assert (prh, prw, prc) == (2, 5, png_img.shape[2])
                jh, jw = 8 + i % 9, 8 + i % 11
                yy, xx = np.mgrid[0:jh, 0:jw]
                # smooth gradients, no mod-256 wrap (a wrap is a 255-step
                # edge whose DCT ringing would blow the error bound)
                jimg = np.stack([xx * 3 + i % 200, yy * 5,
                                 (xx + yy) * 2],
                                axis=2).astype(np.uint8)
                jdata = encode_jpeg(jimg, quality=90,
                                    subsample=bool(i % 2))
                djh, djw, djc, jpix = decode_image(jdata)
                assert (djh, djw, djc) == (jh, jw, 3)
                # lossy codec: bounded round-trip error, asserted in-task
                assert np.abs(jpix.astype(int)
                              - jimg.astype(int)).max() <= 32
                jrs = real_resize(jdata, 6, 4)
                assert jrs[:2] == b"\xff\xd8"          # format-preserving
                jrh, jrw, _, _ = decode_image(jrs)
                assert (jrh, jrw) == (4, 6)
                # NEW r8: PROGRESSIVE (SOF2) decode — same quantizer as
                # baseline, so pixels must match the baseline decode of
                # the 4:4:4 encoding EXACTLY (any successive-
                # approximation bit slip breaks equality). Scan scripts
                # CYCLE per doc: approximation depth 1-3 and EOBn-run
                # vs per-block-EOB0 coding, so the decoder's multi-level
                # and run branches are cross-engine-pinned, not just
                # pytest-pinned
                from deequ_spark.llm import encode_progressive_jpeg
                pdata = encode_progressive_jpeg(
                    jimg, quality=90, first_al=1 + i % 3,
                    eob_runs=bool(i % 2))
                pph, ppw, ppc, pppix = decode_image(pdata)
                bpix = decode_image(encode_jpeg(jimg, quality=90))[3]
                assert (pph, ppw, ppc) == (jh, jw, 3)
                p_exact = int(np.array_equal(pppix, bpix))
                gh, gw = 2 + i % 7, 2 + i % 9
                gyy, gxx = np.mgrid[0:gh, 0:gw]
                gimg = np.stack([(gxx * 31 + i) % 256, (gyy * 17) % 256,
                                 ((gxx + gyy) * 7) % 256],
                                axis=2).astype(np.uint8)
                gdata = encode_gif(gimg, interlace=bool(i % 2))
                dgh, dgw, _, gpix = decode_image(gdata)
                assert np.array_equal(gpix, gimg)      # LZW lossless
                grs = real_resize(gdata, 5, 3)
                assert grs[:6] == b"GIF89a"            # format-preserving
                grh, grw, _, _ = decode_image(grs)
                assert (grh, grw) == (3, 5)
                n = 8 + (i % 9) * 4
                rate, samples = decode_audio(
                    encode_wav_pcm16(np.arange(n, dtype=np.int16), 8000))
                assert samples.shape == (n, 1)
                out["img_w"].append(dw)
                out["img_h"].append(dh)
                out["rs_w"].append(rw)
                out["rs_h"].append(rh)
                out["png_w"].append(pw)
                out["png_h"].append(ph)
                out["png_c"].append(pc)
                out["png_rs_w"].append(prw)
                out["jpg_w"].append(djw)
                out["pjpg_w"].append(ppw)
                out["pjpg_exact"].append(p_exact)
                out["jpg_h"].append(djh)
                out["jpg_rs_w"].append(jrw)
                out["gif_w"].append(dgw)
                out["gif_h"].append(dgh)
                out["gif_rs_w"].append(grw)
                out["wav_frames"].append(len(samples))
                out["wav_rate"].append(rate)
            yield pd.DataFrame(out)

    dec = (docs.select("doc_id")
           .mapInPandas(synth_and_decode, dec_schema)
           .agg(F.sum("img_w").alias("w"), F.sum("img_h").alias("h"),
                F.sum("rs_w").alias("rw"), F.sum("rs_h").alias("rh"),
                F.sum("png_w").alias("pw"), F.sum("png_h").alias("ph"),
                F.sum("png_c").alias("pc"),
                F.sum("png_rs_w").alias("prw"),
                F.sum("jpg_w").alias("jw"), F.sum("jpg_h").alias("jh"),
                F.sum("jpg_rs_w").alias("jrw"),
                F.sum("pjpg_w").alias("pjw"),
                F.sum("pjpg_exact").alias("pje"),
                F.sum("gif_w").alias("gw"), F.sum("gif_h").alias("gh"),
                F.sum("gif_rs_w").alias("grw"),
                F.sum("wav_frames").alias("fr"),
                F.countDistinct("wav_rate").alias("rates"))
           .collect()[0])
    return _metrics_df(spark, [
        ("total_bytes", agg["b"]),
        ("distinct_payloads", agg["d"]),
        ("media_rows", agg["n"]),
        ("decoded_width_sum", dec["w"]),
        ("decoded_height_sum", dec["h"]),
        ("resized_width_sum", dec["rw"]),
        ("resized_height_sum", dec["rh"]),
        ("png_width_sum", dec["pw"]),
        ("png_height_sum", dec["ph"]),
        ("png_channels_sum", dec["pc"]),
        ("png_resized_width_sum", dec["prw"]),
        ("jpeg_width_sum", dec["jw"]),
        ("jpeg_height_sum", dec["jh"]),
        ("jpeg_resized_width_sum", dec["jrw"]),
        ("prog_jpeg_width_sum", dec["pjw"]),
        ("prog_jpeg_exact_count", dec["pje"]),
        ("gif_width_sum", dec["gw"]),
        ("gif_height_sum", dec["gh"]),
        ("gif_resized_width_sum", dec["grw"]),
        ("wav_frames_sum", dec["fr"]),
        ("wav_duration_ms_sum", dec["fr"] / 8.0),
        ("wav_rates_distinct", dec["rates"])])


def q_length_zeros_ratio(spark, sf_dir):
    """MinLength/MaxLength/ZerosCount/RatioOfSums in one fused scan."""
    from deequ_spark import (MaxLength, MinLength, RatioOfSums, ZerosCount,
                             do_analysis_run)
    df = _load(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)")).withColumn(
        "key_dec", F.col("o_orderkey").cast("decimal(18,2)"))
    analyzers = [MinLength("o_orderpriority"), MaxLength("o_orderpriority"),
                 MinLength("o_orderstatus", where="o_totalprice > 100000"),
                 RatioOfSums("price_dec", "key_dec")]
    ctx = do_analysis_run(df, analyzers)
    vals = {a: m.value for a, m in ctx.metric_map.items()}
    li = _load(spark, sf_dir, "lineitem")
    zctx = do_analysis_run(li, [ZerosCount("l_discount")])
    zeros = list(zctx.metric_map.values())[0].value
    return _metrics_df(spark, [
        ("min_len_priority", vals[analyzers[0]]),
        ("max_len_priority", vals[analyzers[1]]),
        ("min_len_status_filtered", vals[analyzers[2]]),
        ("ratio_price_key", _fuzz(vals[analyzers[3]])),
        ("zeros_discount", zeros)])


def q_histogram_binned(spark, sf_dir):
    """Custom-edge numeric histogram; .5 edges so no value sits on a
    boundary in either engine. Second analyzer: NARROW custom edges with
    include_overflow_bins=True (HistogramBinned.scala:62-120) — out-of-range
    values land in the ±Inf under/overflow bins instead of being dropped,
    and the last interior bin keeps its upper edge inclusive."""
    from deequ_spark import HistogramBinned, do_analysis_run
    df = _load(spark, sf_dir, "lineitem")
    analyzer = HistogramBinned("l_quantity",
                               custom_edges=[0.5, 10.5, 20.5, 30.5, 40.5, 50.5])
    overflow = HistogramBinned("l_quantity",
                               custom_edges=[10.5, 20.5, 30.5],
                               include_overflow_bins=True)
    ctx = do_analysis_run(df, [analyzer, overflow])
    dist = ctx.metric_map[analyzer].value
    rows = [(f"bin_{i}", dv.absolute)
            for i, dv in enumerate(dist.values.values())]
    rows.append(("bins", float(dist.number_of_bins)))
    odist = ctx.metric_map[overflow].value
    rows += [(f"ovf_bin_{i}", dv.absolute)
             for i, dv in enumerate(odist.values.values())]
    rows.append(("ovf_bins", float(odist.number_of_bins)))
    # Histogram.Sum aggregate (r7): per-bin tallies SUM l_extendedprice
    # (cast to long) instead of counting rows
    summed = HistogramBinned("l_quantity",
                             custom_edges=[0.5, 25.5, 50.5],
                             sum_column="l_extendedprice")
    sctx = do_analysis_run(
        df.withColumn("l_extendedprice",
                      F.col("l_extendedprice").cast("long")), [summed])
    sdist = sctx.metric_map[summed].value
    rows += [(f"sum_bin_{i}", dv.absolute)
             for i, dv in enumerate(sdist.values.values())]
    return _metrics_df(spark, rows)


def q_referential_integrity(spark, sf_dir):
    from deequ_spark import ReferentialIntegrity
    orders = _load(spark, sf_dir, "orders")
    customer = _load(spark, sf_dir, "customer")
    fwd = ReferentialIntegrity.subset_check(
        orders, ["o_custkey"], customer, ["c_custkey"], lambda v: True)
    rev = ReferentialIntegrity.subset_check(
        customer, ["c_custkey"], orders, ["o_custkey"], lambda v: True)
    return _metrics_df(spark, [
        ("ri_orders_in_customer", fwd.ratio),
        ("ri_customer_in_orders", rev.ratio)])


def q_dataset_match(spark, sf_dir):
    """DatasetMatch against a derived copy with every 3rd key perturbed —
    ratio = fraction of keys with o_orderkey % 3 != 0."""
    from deequ_spark.comparison import DatasetMatchAnalyzer
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    perturbed = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0,
               F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")))
    m = DatasetMatchAnalyzer(perturbed, {"o_orderkey": "o_orderkey"},
                             {"o_totalprice": "o_totalprice"}).calculate(orders)
    if not m.is_success:
        raise RuntimeError(str(m.error))
    return _metrics_df(spark, [("match_ratio", m.value)])


def q_row_count_match(spark, sf_dir):
    from deequ_spark import RowCountMatch, SchemaMatch
    orders = _load(spark, sf_dir, "orders")
    lineitem = _load(spark, sf_dir, "lineitem")
    rc = RowCountMatch.match_row_counts(orders, lineitem, lambda v: True)
    sm_same = SchemaMatch.match_schema(orders, orders)
    sm_diff = SchemaMatch.match_schema(orders, _load(spark, sf_dir, "customer"))
    return _metrics_df(spark, [
        ("rowcount_orders_lineitem", rc.ratio),
        ("schema_orders_orders", sm_same.ratio),
        ("schema_orders_customer", sm_diff.ratio)])


def q_kll(spark, sf_dir):
    """KLL sketch contract: quantile estimates inside exact rank bands
    (±5 percentile points), bucket counts conserve mass."""
    from deequ_spark import ExactQuantile, KLLParameters, KLLSketch, do_analysis_run
    df = _load(spark, sf_dir, "lineitem")
    kll = KLLSketch("l_extendedprice", KLLParameters(2048, 0.64, 100))
    exacts = [ExactQuantile("l_extendedprice", q)
              for q in (0.20, 0.30, 0.45, 0.55, 0.70, 0.80)]
    ctx = do_analysis_run(df, [kll] + exacts)
    dist = ctx.metric_map[kll].value
    ex = {q: ctx.metric_map[a].value for q, a in
          zip((0.20, 0.30, 0.45, 0.55, 0.70, 0.80), exacts)}
    ok25 = ex[0.20] <= dist.quantile(0.25) <= ex[0.30]
    ok50 = ex[0.45] <= dist.quantile(0.5) <= ex[0.55]
    ok75 = ex[0.70] <= dist.quantile(0.75) <= ex[0.80]
    n = int(sum(b.count for b in dist.buckets))
    return _metrics_df(spark, [
        ("kll_p25_ok", 1.0 if ok25 else 0.0),
        ("kll_p50_ok", 1.0 if ok50 else 0.0),
        ("kll_p75_ok", 1.0 if ok75 else 0.0),
        ("kll_mass", float(n)),
        ("kll_buckets", float(len(dist.buckets)))])


def q_embedding_near_dup(spark, sf_dir):
    """Banded hyperplane-LSH near-dup pairs, exact-cosine verified —
    oracled against the exact all-pairs SQL. The shape is pinned for
    the exact-pair-list contract at BOTH oracle scales: 0.45 cosine is
    below the ~0.6 floor where hyperplane LSH can prune (operator
    docstring), so the defaults' shallow bands make every (band, sig)
    bucket exceed hot_bucket_cap at sf0.1 (n=5000 -> ~1250/bucket) and
    star-capping would truncate the pair list (caught by the r11 sf0.1
    oracle run: 1 of 144 pairs survived). bands=24 puts the per-pair
    miss at (1-p^2)^24 ~ 2e-6 (p = 1-acos(0.45)/pi); the cap is lifted
    because the contract here is the full verified pair list, not
    CC-preserving dedup."""
    from deequ_spark.llm import embedding_near_duplicates
    emb = _load(spark, sf_dir, "embeddings")
    pairs = embedding_near_duplicates(emb, "vec_id", "embedding",
                                      threshold=0.45, planes=2, bands=24,
                                      hot_bucket_cap=1_000_000).collect()
    rows = [(f"{r['id_a']}_{r['id_b']}", _fuzz(r["cosine"])) for r in pairs]
    rows.sort()
    rows.append(("near_dup_pairs", float(len(pairs))))
    return _metrics_df(spark, rows)


def q_ivf_ann(spark, sf_dir):
    """IVF top-k probing ALL lists (pruning disabled → must equal brute
    force, which the SQL oracle computes); the pruned path (nprobe < lists)
    is covered by unit tests."""
    from deequ_spark.llm import ivf_topk, kmeans_centroids
    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = kmeans_centroids(emb, "embedding", n_centroids=8)
    top = ivf_topk(emb.where(F.col("vec_id") != 0), "vec_id", "embedding",
                   qvec, k=10, centroids=cents, nprobe=8).collect()
    return _metrics_df(spark, [(str(r["id"]), _fuzz(r["cosine"])) for r in top])


def q_gopher_quality(spark, sf_dir):
    """Gopher document-quality rules (llm/text.py gopher_quality_flags,
    Rae et al. 2021 §A1.1 heuristics) over documents: per-rule pass
    counts + kept-document count, each recomputed independently by the
    SQL oracle from the same split/filter/regexp arithmetic."""
    from deequ_spark.llm import gopher_quality_flags

    docs = _load(spark, sf_dir, "documents")
    flagged = gopher_quality_flags(docs, "text", min_words=20)
    flag_cols = [c for c in flagged.columns if c.startswith("gq_")]
    row = flagged.agg(*[F.sum(F.col(c).cast("long")).alias(c)
                        for c in flag_cols]).collect()[0]
    return _metrics_df(spark, sorted((c, float(row[c])) for c in flag_cols))


_GOPHER_ORACLE_SQL = """
    WITH f AS (
      SELECT
        list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS words,
        string_split_regex(lower(text), '\\s+') AS lwords,
        string_split(text, chr(10)) AS lines,
        text
      FROM documents),
    m AS (
      SELECT
        len(words) AS n_words,
        greatest(len(words), 1) AS safe_n,
        CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
            / greatest(len(words), 1) AS mean_wl,
        CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
             AS DOUBLE) / greatest(len(words), 1) AS alpha_ratio,
        len(list_filter(['the','be','to','of','and','that','have','with'],
                        s -> list_contains(lwords, s))) AS stop_hits,
        CAST(len(regexp_extract_all(text, '#'))
             + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE)
            / greatest(len(words), 1) AS sym_ratio,
        CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]')))
             AS DOUBLE) / greatest(len(lines), 1) AS bullet_ratio,
        CAST(len(list_filter(lines,
                             l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
             AS DOUBLE) / greatest(len(lines), 1) AS ellipsis_ratio,
        1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
            / greatest(len(lines), 1) AS dup_ratio
      FROM f),
    flags AS (
      SELECT
        (n_words >= 20 AND n_words <= 100000) AS f_word_count,
        (mean_wl >= 3.0 AND mean_wl <= 10.0) AS f_mean_word_len,
        sym_ratio <= 0.1 AS f_symbol_ratio,
        bullet_ratio <= 0.9 AS f_bullet_lines,
        ellipsis_ratio <= 0.3 AS f_ellipsis_lines,
        alpha_ratio >= 0.8 AS f_alpha_words,
        stop_hits >= 2 AS f_stopwords,
        dup_ratio <= 0.3 AS f_dup_lines
      FROM m)
    SELECT 'gq_word_count' AS metric,
           CAST(SUM(CASE WHEN f_word_count THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM flags
    UNION ALL SELECT 'gq_mean_word_len', CAST(SUM(CASE WHEN f_mean_word_len THEN 1 ELSE 0 END) AS DOUBLE) FROM flags
    UNION ALL SELECT 'gq_symbol_ratio', CAST(SUM(CASE WHEN f_symbol_ratio THEN 1 ELSE 0 END) AS DOUBLE) FROM flags
    UNION ALL SELECT 'gq_bullet_lines', CAST(SUM(CASE WHEN f_bullet_lines THEN 1 ELSE 0 END) AS DOUBLE) FROM flags
    UNION ALL SELECT 'gq_ellipsis_lines', CAST(SUM(CASE WHEN f_ellipsis_lines THEN 1 ELSE 0 END) AS DOUBLE) FROM flags
    UNION ALL SELECT 'gq_alpha_words', CAST(SUM(CASE WHEN f_alpha_words THEN 1 ELSE 0 END) AS DOUBLE) FROM flags
    UNION ALL SELECT 'gq_stopwords', CAST(SUM(CASE WHEN f_stopwords THEN 1 ELSE 0 END) AS DOUBLE) FROM flags
    UNION ALL SELECT 'gq_dup_lines', CAST(SUM(CASE WHEN f_dup_lines THEN 1 ELSE 0 END) AS DOUBLE) FROM flags
    UNION ALL SELECT 'gq_keep',
        CAST(SUM(CASE WHEN f_word_count AND f_mean_word_len AND f_symbol_ratio
                      AND f_bullet_lines AND f_ellipsis_lines AND f_alpha_words
                      AND f_stopwords AND f_dup_lines THEN 1 ELSE 0 END) AS DOUBLE)
    FROM flags
"""


def q_repetition(spark, sf_dir):
    """Gopher repetition signal (llm/text.py top_ngram_char_fraction):
    per-doc fraction of characters covered by the most frequent word
    2-/3-gram, aggregated as order-independent integer sums of the
    floor(f*1e6) quantization. The Spark side computes it as ONE sorted
    array fold per doc (no shuffle); the oracle recomputes via
    unnest + GROUP BY + rank — completely different plan, same values."""
    from deequ_spark.llm import top_ngram_char_fraction

    docs = _load(spark, sf_dir, "documents")
    proj = docs.select(
        F.floor(top_ngram_char_fraction(F.col("text"), 2) * 1e6).alias("f2"),
        F.floor(top_ngram_char_fraction(F.col("text"), 3) * 1e6).alias("f3"))
    row = proj.agg(
        F.sum("f2").alias("s2"), F.max("f2").alias("m2"),
        F.count(F.when(F.col("f2") > 200_000, 1)).alias("a2"),
        F.sum("f3").alias("s3"), F.max("f3").alias("m3"),
        F.count(F.when(F.col("f3") > 200_000, 1)).alias("a3")).collect()[0]
    return _metrics_df(spark, sorted([
        ("sum_fuzz_top2", float(row["s2"])), ("max_fuzz_top2", float(row["m2"])),
        ("n_above20_top2", float(row["a2"])),
        ("sum_fuzz_top3", float(row["s3"])), ("max_fuzz_top3", float(row["m3"])),
        ("n_above20_top3", float(row["a3"]))]))


def _repetition_oracle_sql() -> str:
    def per_n(n):
        gram_expr = (
            "CASE WHEN len(t) >= {n} THEN "
            "list_transform(range(1, len(t) - {nm2}), i -> {concat}) "
            "ELSE [array_to_string(t, ' ')] END"
        ).format(n=n, nm2=n - 2,
                 concat=" || ' ' || ".join(f"t[i+{j}]" if j else "t[i]"
                                           for j in range(n)))
        return f"""
    toks{n} AS (SELECT doc_id, length(text) AS tl,
                list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '') AS t
                FROM documents),
    ex{n} AS (SELECT doc_id, tl, unnest({gram_expr}) AS gram FROM toks{n}),
    cnt{n} AS (SELECT doc_id, tl, gram, COUNT(*) AS c
               FROM ex{n} GROUP BY 1, 2, 3),
    best{n} AS (SELECT doc_id,
                       FLOOR(CAST(c * length(gram) AS DOUBLE)
                             / greatest(tl, 1) * 1e6) AS f,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY c DESC, gram ASC) AS rn
                FROM cnt{n})"""

    return f"""
    WITH {per_n(2)}, {per_n(3)}
    SELECT 'max_fuzz_top2' AS metric, CAST(MAX(f) AS DOUBLE) AS value
    FROM best2 WHERE rn = 1
    UNION ALL SELECT 'max_fuzz_top3', CAST(MAX(f) AS DOUBLE) FROM best3 WHERE rn = 1
    UNION ALL SELECT 'n_above20_top2',
        CAST(SUM(CASE WHEN f > 200000 THEN 1 ELSE 0 END) AS DOUBLE) FROM best2 WHERE rn = 1
    UNION ALL SELECT 'n_above20_top3',
        CAST(SUM(CASE WHEN f > 200000 THEN 1 ELSE 0 END) AS DOUBLE) FROM best3 WHERE rn = 1
    UNION ALL SELECT 'sum_fuzz_top2', CAST(SUM(f) AS DOUBLE) FROM best2 WHERE rn = 1
    UNION ALL SELECT 'sum_fuzz_top3', CAST(SUM(f) AS DOUBLE) FROM best3 WHERE rn = 1
    """


def q_boilerplate(spark, sf_dir):
    """Corpus-level boilerplate removal (llm/text.py
    remove_boilerplate_lines): lines shared by >= 2 documents are
    deleted everywhere; the oracle independently recomputes the
    boilerplate set, per-doc removal counts, and the exact cleaned-text
    character total (sum of kept-line lengths + separators)."""
    from deequ_spark.llm import remove_boilerplate_lines

    docs = _load(spark, sf_dir, "documents")
    out = remove_boilerplate_lines(docs, "doc_id", "text", min_docs=2)
    row = out.agg(
        F.count(F.when(F.col("n_removed_lines") > 0, 1)).alias("changed"),
        F.sum("n_removed_lines").alias("removed"),
        F.sum(F.length("cleaned")).alias("chars")).collect()[0]
    lines = docs.select(
        F.explode(F.split(F.col("text"), "\n")).alias("l"), "doc_id")
    n_boiler = (lines.where(F.length(F.trim("l")) >= 4)
                .groupBy("l").agg(F.countDistinct("doc_id").alias("d"))
                .where(F.col("d") >= 2).count())
    return _metrics_df(spark, sorted([
        ("n_boilerplate_lines", float(n_boiler)),
        ("n_docs_changed", float(row["changed"])),
        ("sum_removed_lines", float(row["removed"])),
        ("sum_cleaned_chars", float(row["chars"]))]))


_BOILERPLATE_ORACLE_SQL = """
    WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
               FROM documents),
    b AS (SELECT line FROM l WHERE length(trim(line)) >= 4
          GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2),
    kept AS (SELECT doc_id, line FROM l
             WHERE line NOT IN (SELECT line FROM b)),
    rem AS (SELECT doc_id, COUNT(*) AS c FROM l
            WHERE line IN (SELECT line FROM b) GROUP BY doc_id),
    klen AS (SELECT doc_id, SUM(length(line)) AS s, COUNT(*) AS n
             FROM kept GROUP BY doc_id),
    cl AS (SELECT d.doc_id,
                  COALESCE(k.s + GREATEST(k.n - 1, 0), 0) AS clen
           FROM documents d LEFT JOIN klen k USING (doc_id))
    SELECT 'n_boilerplate_lines' AS metric,
           CAST((SELECT COUNT(*) FROM b) AS DOUBLE) AS value
    UNION ALL SELECT 'n_docs_changed',
        CAST((SELECT COUNT(*) FROM rem WHERE c > 0) AS DOUBLE)
    UNION ALL SELECT 'sum_removed_lines',
        CAST(COALESCE((SELECT SUM(c) FROM rem), 0) AS DOUBLE)
    UNION ALL SELECT 'sum_cleaned_chars',
        CAST((SELECT SUM(clen) FROM cl) AS DOUBLE)
"""


def q_winnowing(spark, sf_dir):
    """Winnowing fingerprints (llm/dedup.py, Schleimer et al. SIGMOD'03)
    over documents with the portable 31-bit polynomial k-gram hash — the
    oracle recomputes every fingerprint (normalize → k-grams → hash →
    window minima → distinct) and the candidate-pair stats in DuckDB."""
    from deequ_spark.llm import winnowing_fingerprints

    docs = _load(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4)
    r1 = fps.agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("fingerprint").alias("d")).collect()[0]
    # per-doc max/min fingerprint counts pin the window-minima selection
    per_doc = (fps.groupBy("id").count()
               .agg(F.max("count").alias("mx"),
                    F.min("count").alias("mn")).collect()[0])
    # pair-level candidate stats are deliberately NOT oracled on this
    # corpus: the synthetic docs share so much vocabulary that char-8-gram
    # fingerprints pair nearly every doc with every other (a quadratic
    # result set on both engines); winnowing_candidates semantics are
    # pinned by pytest on crafted documents instead
    return _metrics_df(spark, sorted([
        ("sum_doc_fingerprints", float(r1["n"])),
        ("n_global_fingerprints", float(r1["d"])),
        ("max_doc_fingerprints", float(per_doc["mx"])),
        ("min_doc_fingerprints", float(per_doc["mn"]))]))


_WINNOWING_ORACLE_SQL = """
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             CASE WHEN length(t) >= 8
                  THEN [t[i:i+7] FOR i IN range(1, length(t) - 6)]
                  ELSE [t] END AS gs
      FROM norm),
    hashed AS (
      SELECT doc_id,
             list_transform(gs, s ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                                        [CAST(ascii(c) AS BIGINT)
                                         FOR c IN string_split(s, '')]),
                           (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
      FROM grams),
    wins AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(h) >= 4
                  THEN [list_min(h[j:j+3]) FOR j IN range(1, len(h) - 2)]
                  ELSE [list_min(h)] END) AS fps
      FROM hashed),
    fp AS (SELECT doc_id, unnest(fps) AS f FROM wins),
    per_doc AS (SELECT doc_id, COUNT(*) AS c FROM fp GROUP BY doc_id)
    SELECT 'sum_doc_fingerprints' AS metric,
           CAST((SELECT COUNT(*) FROM fp) AS DOUBLE) AS value
    UNION ALL SELECT 'n_global_fingerprints',
        CAST((SELECT COUNT(DISTINCT f) FROM fp) AS DOUBLE)
    UNION ALL SELECT 'max_doc_fingerprints',
        CAST((SELECT MAX(c) FROM per_doc) AS DOUBLE)
    UNION ALL SELECT 'min_doc_fingerprints',
        CAST((SELECT MIN(c) FROM per_doc) AS DOUBLE)
"""


def q_embedding_quality(spark, sf_dir):
    """EmbeddingQuality analyzer (analyzers/embedding.py): fused-scan
    quality metrics for the embeddings table — completeness, dimension
    contract, NaN/zero-norm counts, L2-norm distribution (accumulated as
    exact integer micro-units). Runs once through the analysis runner
    and once through the split-state semigroup merge; the oracle
    recomputes every value in DuckDB list arithmetic."""
    from deequ_spark import EmbeddingQuality, do_analysis_run

    emb = _load(spark, sf_dir, "embeddings")
    a = EmbeddingQuality("embedding", expected_dim=64)
    ctx = do_analysis_run(emb, [a])
    m = next(iter(ctx.metric_map.values()))
    if not m.is_success:
        raise RuntimeError(str(m.error))
    rows = [(k, v) for k, v in m.value.items()]
    s1 = a.compute_state_from(emb.where("vec_id % 2 = 0"))
    s2 = a.compute_state_from(emb.where("vec_id % 2 = 1"))
    merged = a.compute_metric_from_state(s1.merge(s2))
    rows += [(f"merged_{k}", v) for k, v in merged.value.items()]
    return _metrics_df(spark, sorted(rows))


_EMBEDDING_QUALITY_ORACLE_SQL = """
    WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
    m AS (
      SELECT
        COUNT(*) AS n,
        SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_null,
        SUM(CASE WHEN v IS NOT NULL AND len(v) <> 64 THEN 1 ELSE 0 END) AS n_dim,
        SUM(CASE WHEN v IS NOT NULL AND len(v) = 64
                  AND len(list_filter(v, x -> isnan(x))) > 0
                 THEN 1 ELSE 0 END) AS n_nan,
        SUM(CASE WHEN v IS NOT NULL AND len(v) = 64
                  AND len(list_filter(v, x -> isnan(x))) = 0
                  AND FLOOR(sqrt(list_dot_product(v, v)) * 1e6) = 0
                 THEN 1 ELSE 0 END) AS n_zero,
        SUM(CASE WHEN v IS NOT NULL AND len(v) = 64
                  AND len(list_filter(v, x -> isnan(x))) = 0
                 THEN 1 ELSE 0 END) AS n_valid,
        SUM(CASE WHEN v IS NOT NULL AND len(v) = 64
                  AND len(list_filter(v, x -> isnan(x))) = 0
                 THEN CAST(FLOOR(sqrt(list_dot_product(v, v)) * 1e6) AS BIGINT)
                 ELSE 0 END) AS sum_micro,
        MIN(CASE WHEN v IS NOT NULL AND len(v) = 64
                  AND len(list_filter(v, x -> isnan(x))) = 0
                 THEN CAST(FLOOR(sqrt(list_dot_product(v, v)) * 1e6) AS BIGINT)
                 END) AS min_micro,
        MAX(CASE WHEN v IS NOT NULL AND len(v) = 64
                  AND len(list_filter(v, x -> isnan(x))) = 0
                 THEN CAST(FLOOR(sqrt(list_dot_product(v, v)) * 1e6) AS BIGINT)
                 END) AS max_micro
      FROM e),
    vals AS (
      SELECT 'n_rows' AS k, CAST(n AS DOUBLE) AS val FROM m
      UNION ALL SELECT 'n_null', CAST(n_null AS DOUBLE) FROM m
      UNION ALL SELECT 'n_dim_mismatch', CAST(n_dim AS DOUBLE) FROM m
      UNION ALL SELECT 'n_nan', CAST(n_nan AS DOUBLE) FROM m
      UNION ALL SELECT 'n_zero_norm', CAST(n_zero AS DOUBLE) FROM m
      UNION ALL SELECT 'n_valid', CAST(n_valid AS DOUBLE) FROM m
      UNION ALL SELECT 'mean_norm',
          CASE WHEN n_valid > 0
               THEN (CAST(sum_micro AS DOUBLE) / n_valid) / 1e6
               ELSE 0.0 END FROM m
      UNION ALL SELECT 'min_norm',
          COALESCE(CAST(min_micro AS DOUBLE) / 1e6, 0.0) FROM m
      UNION ALL SELECT 'max_norm',
          COALESCE(CAST(max_micro AS DOUBLE) / 1e6, 0.0) FROM m)
    SELECT k AS metric, val AS value FROM vals
    UNION ALL SELECT 'merged_' || k, val FROM vals
"""


def q_chunking(spark, sf_dir):
    """Document chunking (llm/text.py chunk_text): 64-token windows with
    8-token overlap over documents; the oracle regenerates every window
    with DuckDB list slicing and must agree on chunk counts, token
    counts, and total chunk characters (which pins the join/slice
    arithmetic exactly)."""
    from deequ_spark.llm import chunk_text

    docs = _load(spark, sf_dir, "documents")
    chunks = chunk_text(docs, "doc_id", "text",
                        chunk_tokens=64, overlap=8)
    row = chunks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chunk_tokens").alias("ntok"),
        F.sum(F.length("chunk")).alias("nchars"),
        F.countDistinct("doc_id").alias("docs")).collect()[0]
    per_doc_max = (chunks.groupBy("doc_id").count()
                   .agg(F.max("count")).collect()[0][0])
    return _metrics_df(spark, sorted([
        ("n_chunks", float(row["n"])),
        ("sum_chunk_tokens", float(row["ntok"])),
        ("sum_chunk_chars", float(row["nchars"])),
        ("n_docs_chunked", float(row["docs"])),
        ("max_chunks_per_doc", float(per_doc_max))]))


_CHUNKING_ORACLE_SQL = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS t
      FROM documents),
    sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    wins AS (
      SELECT doc_id, t, n,
             unnest(range(0, greatest((n - 8 + 55) // 56, 1))) AS w
      FROM sized),
    chunks AS (
      SELECT doc_id,
             least(n - w * 56, 64) AS ntok,
             length(array_to_string(t[w * 56 + 1 : w * 56 + 64], ' ')) AS nchars
      FROM wins)
    SELECT 'max_chunks_per_doc' AS metric,
           CAST(MAX(c) AS DOUBLE) AS value
    FROM (SELECT COUNT(*) AS c FROM chunks GROUP BY doc_id) g
    UNION ALL SELECT 'n_chunks', CAST(COUNT(*) AS DOUBLE) FROM chunks
    UNION ALL SELECT 'n_docs_chunked',
        CAST(COUNT(DISTINCT doc_id) AS DOUBLE) FROM chunks
    UNION ALL SELECT 'sum_chunk_chars', CAST(SUM(nchars) AS DOUBLE) FROM chunks
    UNION ALL SELECT 'sum_chunk_tokens', CAST(SUM(ntok) AS DOUBLE) FROM chunks
"""


def q_ivf_index_disk(spark, sf_dir):
    """On-disk IVF index (llm/similarity.py ivf_write_index): build the
    partitioned index, read it back, probe ALL lists — must equal the SQL
    oracle's brute force exactly (same contract as ivf_ann, but through
    the disk round-trip + partition-pruned scan path)."""
    import tempfile

    from deequ_spark.llm import ivf_topk, ivf_write_index

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    corpus = emb.where(F.col("vec_id") != 0)
    path = tempfile.mkdtemp(prefix="deequ_ivf_idx_")
    cents = ivf_write_index(corpus, path, "embedding", n_centroids=8)
    index = spark.read.parquet(path)
    top = ivf_topk(index, "vec_id", "embedding", qvec, k=10,
                   centroids=cents, nprobe=8).collect()
    return _metrics_df(spark, [(str(r["id"]), _fuzz(r["cosine"]))
                               for r in top])


def q_lsh_ann_contract(spark, sf_dir):
    """Hyperplane-LSH top-k (llm/similarity.py hyperplane_lsh_topk): the
    operator's CONTRACT is 'exact top-k restricted to the query's bucket'
    — the signature predicate only PRUNES; scoring/ordering is the same
    JVM expression as brute force. Checks (booleans, oracle = truth
    table): result == brute-force top-k over the bucket's candidate set,
    every returned cosine bit-exact vs the full-corpus scores, and the
    bucket is a strict subset of the corpus (pruning actually happened).
    Recall itself is data-dependent (random vectors are LSH-hostile), so
    it is deliberately NOT a gate here."""
    from deequ_spark.llm import brute_force_topk, hyperplane_lsh_topk
    from deequ_spark.llm.similarity import (_hyperplane_matrix,
                                            _hyperplane_signature)

    emb = _load(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    corpus = emb.where(F.col("vec_id") != 0)
    planes = 3
    got = hyperplane_lsh_topk(corpus, "vec_id", "embedding", qvec,
                              k=10, planes=planes).collect()

    import numpy as np
    W = _hyperplane_matrix(len(qvec), planes, seed=42)
    qbits = (W @ np.array(qvec, dtype=np.float64)) >= 0
    qsig = int((qbits.astype("int64") << np.arange(planes)).sum())
    bucket = corpus.where(
        _hyperplane_signature(F.col("embedding"), W) == F.lit(qsig))
    n_bucket = bucket.count()
    expect = brute_force_topk(bucket, "vec_id", "embedding", qvec,
                              k=10).collect()
    same = ([(r["id"], r["cosine"]) for r in got]
            == [(r["id"], r["cosine"]) for r in expect])
    all_exact = {r["id"]: r["cosine"]
                 for r in brute_force_topk(corpus, "vec_id", "embedding",
                                           qvec, k=1_000_000).collect()}
    cosines_exact = all(r["cosine"] == all_exact[r["id"]] for r in got)
    rows = [("lsh_equals_bucket_bruteforce", 1.0 if same else 0.0),
            ("lsh_cosines_bit_exact", 1.0 if cosines_exact else 0.0),
            ("lsh_bucket_prunes",
             1.0 if 0 < n_bucket < corpus.count() else 0.0)]
    return _metrics_df(spark, sorted(rows))


def q_streaming(spark, sf_dir):
    """Structured Streaming cumulative verification: 4 micro-batches of
    orders; final merged-state metrics must equal the static values the
    SQL oracle computes over the whole table."""
    import os
    import shutil
    from deequ_spark import (Completeness, CountDistinct, Mean, Size, Sum,
                             Uniqueness)
    from deequ_spark.streaming import StreamingVerification

    src = f"/tmp/deequ_stream_src_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(src, ignore_errors=True)
    # integer CENTS: per-batch sums are exact integers < 2⁵³, so the
    # cross-batch state merge is float-exact in ANY order — a decimal→
    # float sum differed from the oracle in the last ulp at some SFs
    (_load(spark, sf_dir, "orders")
     .withColumn("price_cents",
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("long"))
     .repartition(4).write.parquet(src))

    static = spark.read.parquet(src)
    analyzers = [Size(), Completeness("o_custkey"), Sum("price_cents"),
                 Mean("price_cents"), Uniqueness(("o_orderkey",)),
                 CountDistinct(("o_orderstatus",))]
    sv = StreamingVerification(analyzers=analyzers)
    q = (spark.readStream.schema(static.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(sv.foreach_batch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    vals = {a: m.value for a, m in sv.results[-1].context.metric_map.items()}
    return _metrics_df(spark, [
        ("stream_batches", float(len(sv.results))),
        ("stream_size", vals[analyzers[0]]),
        ("stream_completeness", vals[analyzers[1]]),
        ("stream_sum_price", vals[analyzers[2]]),
        ("stream_mean_price", vals[analyzers[3]]),
        ("stream_uniqueness_key", vals[analyzers[4]]),
        ("stream_distinct_status", vals[analyzers[5]])])


def q_row_level(spark, sf_dir):
    """Row-level annotation: count of rows passing ALL constraints —
    one projection over the scan, no extra aggregation job."""
    from deequ_spark import Check, CheckLevel, VerificationSuite
    df = _load(spark, sf_dir, "lineitem")
    check = (Check(CheckLevel.ERROR, "rl")
             .is_complete("l_orderkey")
             .satisfies("l_quantity <= 10", "small", lambda v: True)
             .satisfies("l_discount >= 0.02", "disc", lambda v: True))
    result = VerificationSuite().on_data(df).add_check(check).run()
    annotated = result.row_level_results_as_dataframe(df)
    n_pass = annotated.where(F.col("rl")).count()
    n_all = annotated.count()
    return _metrics_df(spark, [("rows_pass", float(n_pass)),
                               ("rows_total", float(n_all))])


def q_row_level_filtered(spark, sf_dir):
    """Row-level outcomes across the where-filter × FilteredRowOutcome ×
    per-row-assertion truth tables (reference Analyzer.scala:277-292,
    Constraint.scala:1214-1288; parity suite tests/test_reference_parity.py).
    Each rule's three-valued outcome column is reduced to (n_true, n_null)
    counts; n_false falls out of the total. Still a pure projection over
    one scan (plus one window for the uniqueness rule) — no extra shuffle
    beyond the uniqueness partitionBy."""
    from deequ_spark import (AnalyzerOptions, Check, CheckLevel,
                             FilteredRowOutcome, VerificationSuite)
    df = _load(spark, sf_dir, "customer")
    null_opts = AnalyzerOptions(filtered_row=FilteredRowOutcome.NULL)
    checks = [
        # filtered rows default to TRUE
        Check(CheckLevel.ERROR, "c1_true")
        .satisfies("c_acctbal >= 0", "pos", lambda v: True)
        .where("c_mktsegment = 'BUILDING'"),
        # filtered rows become NULL
        Check(CheckLevel.ERROR, "c2_null")
        .satisfies("c_acctbal >= 0", "pos", lambda v: True,
                   analyzer_options=null_opts)
        .where("c_mktsegment = 'BUILDING'"),
        # per-row min assertion on the in-scope subset, filtered -> TRUE
        Check(CheckLevel.ERROR, "c3_min")
        .has_min("c_acctbal", lambda v: v >= 0)
        .where("c_nationkey < 10"),
        # per-row length assertion, filtered -> NULL
        Check(CheckLevel.ERROR, "c4_len")
        .has_max_length("c_name", lambda v: v <= 17,
                        analyzer_options=null_opts)
        .where("c_mktsegment = 'AUTOMOBILE'"),
        # windowed uniqueness over the in-scope subset, filtered -> TRUE
        Check(CheckLevel.ERROR, "c5_uniq")
        .is_unique("c_nationkey")
        .where("c_custkey <= 100"),
    ]
    suite = VerificationSuite().on_data(df)
    for c in checks:
        suite.add_check(c)
    annotated = suite.run().row_level_results_as_dataframe(df)
    aggs = []
    for c in checks:
        name = c.description
        aggs.append(F.sum(F.when(F.col(name), 1).otherwise(0))
                    .alias(f"{name}_t"))
        aggs.append(F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
                    .alias(f"{name}_n"))
    row = annotated.agg(*aggs).collect()[0]
    pairs = []
    for c in checks:
        pairs.append((f"{c.description}_true", float(row[f"{c.description}_t"])))
        pairs.append((f"{c.description}_null", float(row[f"{c.description}_n"])))
    return _metrics_df(spark, pairs)


def q_pipeline(spark, sf_dir):
    """End-to-end prepare_training_corpus oracle (llm/pipeline.py:32):
    quality gate -> corpus boilerplate removal -> exact dedup -> chunking,
    near-dedup disabled here because MinHash is not SQL-replayable (its
    own oracles `minhash_lsh`/`near_dedup` cover it). Pins the composed
    WIRING: per-stage survivor counts plus a final chunk-table contract
    (docs, tokens, chars) that breaks on column renames or stage-order
    regressions even when every stage passes alone."""
    from deequ_spark.llm import prepare_training_corpus
    df = _load(spark, sf_dir, "documents")
    out, stats = prepare_training_corpus(
        df, "doc_id", "text",
        min_words=20, boilerplate_min_docs=2,
        chunk_tokens=64, chunk_overlap=8,
        near_dedup=False,
        gopher_kwargs={"min_stopword_hits": 1})
    agg = out.agg(
        F.countDistinct("doc_id").alias("docs"),
        F.sum("n_chunk_tokens").alias("toks"),
        F.sum(F.length("chunk")).alias("chars")).collect()[0]
    out.unpersist()
    return _metrics_df(spark, [
        ("st_input", stats["input"]),
        ("st_quality", stats["quality"]),
        ("st_boilerplate", stats["boilerplate"]),
        ("st_exact", stats["exact_dedup"]),
        ("st_chunks", stats["chunks"]),
        ("n_docs_chunked", float(agg["docs"])),
        ("sum_chunk_tokens", float(agg["toks"])),
        ("sum_chunk_chars", float(agg["chars"]))])


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination (llm/text.py decontaminate): documents
    sharing any normalized 5-gram with a benchmark built from the first
    three documents are dropped. The oracle replays the n-gram overlap in
    DuckDB list arithmetic."""
    from deequ_spark.llm import decontaminate
    docs = _load(spark, sf_dir, "documents")
    benchmark = docs.where("doc_id < 3").select("text")
    clean, contaminated = decontaminate(docs, "doc_id", "text",
                                        benchmark, "text", n=5)
    n_cont = contaminated.count()
    id_sum = (contaminated.agg(F.sum("doc_id")).collect()[0][0] or 0)
    return _metrics_df(spark, [
        ("n_contaminated", float(n_cont)),
        ("n_clean", float(clean.count())),
        ("contaminated_id_sum", float(id_sum))])


def q_profile(spark, sf_dir):
    """Column profiler (3-pass): deterministic fields of a numeric and a
    string column profile."""
    from deequ_spark import profile_columns
    df = _load(spark, sf_dir, "customer")
    profiles = profile_columns(df, ["c_acctbal", "c_mktsegment"],
                               with_histograms=True)
    num = profiles["c_acctbal"]
    cat = profiles["c_mktsegment"]
    seg_hist = cat.histogram
    rows = [
        ("prof_completeness", num.completeness),
        ("prof_min", num.minimum),
        ("prof_max", num.maximum),
        ("prof_mean", _fuzz(num.mean)),
        ("prof_stddev", _fuzz(num.std_dev)),
        ("prof_seg_complete", cat.completeness),
        ("prof_seg_bins", float(len(seg_hist.values)) if seg_hist else -1.0),
    ]
    return _metrics_df(spark, rows)


def q_windowed(spark, sf_dir):
    """Per-day windowed quality metrics over the events stream table —
    one fused groupBy(window).agg job for all analyzers × windows."""
    from deequ_spark import Completeness, Compliance, Size, Sum
    from deequ_spark.sources import load_table
    from deequ_spark.windowed import windowed_metrics

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ev = (load_table(spark, sf_dir, "events")
              .withColumn("value_dec", F.col("value").cast("decimal(18,2)")))
        out = windowed_metrics(
            ev, "ts", "1 week",
            [Size(), Sum("value_dec"), Completeness("user_id"),
             Compliance("purchase_ratio", "event_type = 'purchase'")])
        rows = [(f"{r['name']}_{r['instance']}_"
                 f"{r['window_start'].strftime('%Y-%m-%d')}", r["value"])
                for r in out.collect()]
        return _metrics_df(spark, rows)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def q_distance(spark, sf_dir):
    """Distribution distances (L∞, PSI, chi²) between the l_returnflag
    distributions of the high-discount slice vs the rest — frequencies via
    one Spark aggregation, distance math on the driver, recomputed
    closed-form by the SQL oracle."""
    from deequ_spark import (chi_square_statistic, l_infinity_distance, psi)
    df = _load(spark, sf_dir, "lineitem")
    freqs = (df.groupBy(F.col("l_discount") > 0.05, "l_returnflag")
             .count().collect())
    hi = {r["l_returnflag"]: float(r["count"]) for r in freqs if r[0]}
    lo = {r["l_returnflag"]: float(r["count"]) for r in freqs if not r[0]}
    return _metrics_df(spark, [
        ("linf", _fuzz(l_infinity_distance(hi, lo))),
        ("psi", _fuzz(psi(lo, hi))),
        ("chi2", _fuzz(chi_square_statistic(lo, hi)))])


def q_suggestions(spark, sf_dir):
    """Constraint suggestion (profile → DEFAULT_RULES) as a canonical
    (column_name, rule_name, code) table — the oracle re-derives every
    rule trigger AND every constraint-code string from SQL over the same
    customer table. The only engine-specific profile input is the HLL
    approx-distinct estimate behind UniqueIfApproximatelyUniqueRule (and
    the ≤120-cardinality histogram gate); the oracle substitutes exact
    distinct counts, equivalent here because every column sits far from
    the 0.08 / 120 decision bands (ratios ≈ 0.99-1.01 fire, ≤ 0.17
    don't; cardinalities 5/25 vs ~1500)."""
    from deequ_spark import DEFAULT_RULES, ConstraintSuggestionRunner
    df = _load(spark, sf_dir, "customer")
    result = (ConstraintSuggestionRunner().on_data(df)
              .add_constraint_rules(list(DEFAULT_RULES)).run())
    rows = sorted((col, s.rule_name, s.code_for_constraint)
                  for col, ss in result["suggestions"].items() for s in ss)
    return spark.createDataFrame(
        rows, "column_name string, rule_name string, code string")


def _suggestions_oracle_sql() -> str:
    """DuckDB oracle for q_suggestions: replays the 7 DEFAULT_RULES
    triggers (ConstraintSuggestionRunner.scala:33-45 semantics) in SQL —
    completeness, Wald interval, regex-based type inference
    (DataType.scala classification), categorical histogram coverage,
    non-negative minimum, approximate uniqueness — and reconstructs the
    exact Python constraint-code strings the engine emits."""
    num_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    str_cols = ["c_name", "c_mktsegment"]
    z = 1.959963984540054        # Φ⁻¹(0.975), reference defaultConfidence
    integral_re = r"^(-|\+)? ?\d+$"
    fractional_re = r"^(-|\+)? ?\d+((\.\d+)|((?:\.\d+)?[Ee][-+]?\d+))$"
    boolean_re = r"^(true|false)$"

    def fmt2(expr: str) -> str:
        # Python str() of a 2-decimal double: '0.50'→'0.5', '0.46' stays
        return (f"CASE WHEN printf('%.2f', {expr}) LIKE '%0' "
                f"THEN substr(printf('%.2f', {expr}), 1, "
                f"len(printf('%.2f', {expr})) - 1) "
                f"ELSE printf('%.2f', {expr}) END")

    ctes, selects = [], []
    for c in num_cols + str_cols:
        if c in str_cols:
            type_counts = f"""
         SUM(CASE WHEN {c} IS NOT NULL
                   AND NOT regexp_matches({c}, '{boolean_re}')
                   AND NOT regexp_matches({c}, '{integral_re}')
                   AND NOT regexp_matches({c}, '{fractional_re}')
             THEN 1 ELSE 0 END) AS n_plain,
         SUM(CASE WHEN {c} IS NOT NULL AND regexp_matches({c}, '{boolean_re}') THEN 1 ELSE 0 END) AS n_bool,
         SUM(CASE WHEN {c} IS NOT NULL AND regexp_matches({c}, '{integral_re}') THEN 1 ELSE 0 END) AS n_int,
         SUM(CASE WHEN {c} IS NOT NULL AND regexp_matches({c}, '{fractional_re}') THEN 1 ELSE 0 END) AS n_frac,
         MIN(TRY_CAST({c} AS DOUBLE)) AS mn,
         FALSE AS native_num"""
        else:
            type_counts = f"""
         0 AS n_plain, 0 AS n_bool, 0 AS n_int, 0 AS n_frac,
         CAST(MIN({c}) AS DOUBLE) AS mn, TRUE AS native_num"""
        ctes.append(f"""st_{c} AS (
  SELECT COUNT(*) AS n, COUNT({c}) AS nn, COUNT(DISTINCT {c}) AS nd,{type_counts}
  FROM customer)""")
        ctes.append(f"""hist_{c} AS (
  SELECT COALESCE(CAST({c} AS VARCHAR), 'NullValue') AS v, COUNT(*) AS cnt
  FROM customer GROUP BY 1)""")
        ctes.append(f"""hstat_{c} AS (
  SELECT COUNT(*) AS ndv, SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS singletons,
         SUM(cnt) AS total FROM hist_{c})""")
        ctes.append(f"""cats_{c} AS (
  SELECT COALESCE(string_agg(chr(39) || v || chr(39), ', ' ORDER BY v), '') AS cat_list
  FROM hist_{c} WHERE v <> 'NullValue')""")
        # fractional-categorical greedy cut set (ratio-desc until ≥ 0.9);
        # engine tie order within equal ratios is histogram insertion order,
        # v ASC here — only reachable under exact ratio ties at the cut
        ctes.append(f"""fsel_{c} AS (
  SELECT v, r, SUM(r) OVER (ORDER BY r DESC, v) AS cum
  FROM (SELECT v, cnt * 1.0 / (SELECT total FROM hstat_{c}) AS r
        FROM hist_{c} WHERE v <> 'NullValue') t)""")
        ctes.append(f"""fr_{c} AS (
  SELECT COALESCE(MAX(cum), 0.0) AS covered,
         COALESCE(string_agg(chr(39) || v || chr(39), ', ' ORDER BY v), '') AS fcats
  FROM fsel_{c} WHERE cum - r < 0.9)""")

        wald_lower = (f"GREATEST(0.0, FLOOR((nn * 1.0 / n - {z} * "
                      f"sqrt((nn * 1.0 / n) * (1 - nn * 1.0 / n) / n)) "
                      f"* 100 + 1e-9) / 100)")
        # FractionalCategoricalRangeRule threshold: Wald lower bound on the
        # top-categories coverage p (reference :81-84), 2-decimal truncation
        frac_wald_lower = (f"GREATEST(0.0, FLOOR((LEAST(covered, 1.0) - {z} * "
                           f"sqrt(LEAST(covered, 1.0) * (1 - LEAST(covered, 1.0)) / n)) "
                           f"* 100 + 1e-9) / 100)")
        selects.append(f"""
SELECT '{c}' AS column_name, 'CompleteIfCompleteRule' AS rule_name,
       '.is_complete("{c}")' AS code
FROM st_{c} WHERE n > 0 AND nn = n
UNION ALL
SELECT '{c}', 'RetainCompletenessRule',
       '.has_completeness("{c}", lambda v: v >= ' || {fmt2(wald_lower)} || ')'
FROM st_{c} WHERE n > 0 AND nn * 1.0 / n >= 0.2 AND nn * 1.0 / n < 1.0
UNION ALL
SELECT '{c}', 'UniqueIfApproximatelyUniqueRule', '.is_unique("{c}")'
FROM st_{c} WHERE n > 0 AND ABS(nd * 1.0 / n - 1.0) <= 0.08
UNION ALL
SELECT '{c}', 'NonNegativeNumbersRule', '.is_non_negative("{c}")'
FROM st_{c} WHERE mn IS NOT NULL AND mn >= 0
  AND (native_num OR (nn > 0 AND n_plain = 0 AND n_bool = 0))
UNION ALL
SELECT '{c}', 'CategoricalRangeRule',
       '.is_contained_in("{c}", [' || (SELECT cat_list FROM cats_{c}) || '])'
FROM st_{c}, hstat_{c}
WHERE nd <= 120 AND singletons * 1.0 / GREATEST(ndv, 1) <= 0.1
UNION ALL
SELECT '{c}', 'FractionalCategoricalRangeRule',
       '.is_contained_in("{c}", [' || fcats || '], lambda v: v >= '
        || {fmt2(frac_wald_lower)} || ')'
FROM st_{c}, hstat_{c}, fr_{c}
WHERE nd <= 120 AND singletons * 1.0 / GREATEST(ndv, 1) <= 0.4
  AND covered < 1""")
        if c in str_cols:
            selects.append(f"""
SELECT '{c}', 'RetainTypeRule',
       '.has_data_type("{c}", DataTypeInstances.'
        || (CASE WHEN n_bool > 0 THEN 'BOOLEAN' ELSE 'FRACTIONAL' END)
        || ', lambda v: v == 1.0)'
FROM st_{c}
WHERE nn > 0 AND n_plain = 0
  AND NOT (n_bool > 0 AND (n_int > 0 OR n_frac > 0))""")
    return ("WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n"
            + "\nUNION ALL".join(selects)
            + "\n) ORDER BY column_name, rule_name")


def q_anomaly(spark, sf_dir):
    """Anomaly detection over a metric time-series: weekly event counts →
    AbsoluteChange (order-1 differencing) + SimpleThreshold flags; the
    oracle recomputes both with SQL window lag."""
    from deequ_spark import AbsoluteChangeStrategy, SimpleThresholdStrategy
    from deequ_spark.sources import load_table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    weekly = (ev.groupBy(F.floor(F.unix_timestamp("ts") / 604800)
                         .alias("wk"))
              .count().orderBy("wk").collect())
    series = [float(r["count"]) for r in weekly]
    thresh = SimpleThresholdStrategy(lower_bound=0.5 * max(series))
    chg = AbsoluteChangeStrategy(max_rate_decrease=-500.0,
                                 max_rate_increase=500.0)
    flags_t = {a.index for a in thresh.detect(series)}
    flags_c = {a.index for a in chg.detect(series)}
    rows = [(f"thresh_{i}", 1.0 if i in flags_t else 0.0)
            for i in range(len(series))]
    rows += [(f"change_{i}", 1.0 if i in flags_c else 0.0)
             for i in range(len(series))]
    rows.append(("n_points", float(len(series))))
    return _metrics_df(spark, rows)


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events table (window lag + running
    sum) — session counts recomputed by the SQL oracle."""
    from deequ_spark.sources import load_table
    from deequ_spark.streaming.sessionize import session_stats

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    stats = session_stats(ev, "user_id", "ts", gap_seconds=1800)
    agg = stats.agg(
        F.count(F.lit(1)).alias("sessions"),
        F.max("n_events").alias("max_ev"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("singletons"),
        F.countDistinct("user_id").alias("users")).collect()[0]
    return _metrics_df(spark, [
        ("n_sessions", agg["sessions"]),
        ("max_session_events", agg["max_ev"]),
        ("n_singleton_sessions", agg["singletons"]),
        ("n_users", agg["users"])])


def q_dqdl(spark, sf_dir):
    """Declarative DQDL ruleset → one fused verification run; outcomes
    recomputed by the SQL oracle."""
    from deequ_spark.dqdl import EvaluateDataQuality
    df = _load(spark, sf_dir, "orders")
    out = EvaluateDataQuality.process(df, """Rules = [
        RowCount > 1000,
        ColumnCount = 6,
        IsComplete "o_orderkey",
        IsUnique "o_orderkey",
        Completeness "o_custkey" >= 1.0,
        ColumnValues "o_orderstatus" in ["O", "F"],
        ColumnValues "o_totalprice" > 0,
        ColumnLength "o_orderpriority" between 4 and 16,
        DistinctValuesCount "o_orderstatus" = 2,
        (RowCount < 5) or (IsComplete "o_totalprice"),
        CustomSql "select count(*) from primary where o_totalprice <= 0" = 0 ]""")
    rows = [(r["Rule"], 1.0 if r["Outcome"] == "Passed" else 0.0)
            for r in out.collect()]
    return _metrics_df(spark, rows)


def q_dqdl_extended(spark, sf_dir):
    """The remainder of DQDL's converter map (numeric stats, ColumnDataType)
    plus the dataset-level rules (RowCountMatch, ReferentialIntegrity,
    DatasetMatch, AggregateMatch) resolved against additional_datasets;
    outcomes recomputed by the SQL oracle."""
    from deequ_spark.dqdl import EvaluateDataQuality
    orders = _load(spark, sf_dir, "orders")
    customer = _load(spark, sf_dir, "customer")
    out = EvaluateDataQuality.process(orders, """Rules = [
        ZerosCount "o_totalprice" = 0,
        UniqueValueRatio "o_orderkey" = 1.0,
        Range "o_totalprice" > 0,
        InterquartileRange "o_totalprice" > 0,
        Variance "o_totalprice" > 1,
        Skewness "o_totalprice" between -10 and 10,
        Kurtosis "o_totalprice" between -10 and 10,
        ColumnCorrelation "o_custkey" "o_totalprice" between -1 and 1,
        DuplicateRowCount = 0,
        ColumnDataType "o_orderstatus" != "INTEGER",
        RowCountMatch "customer" > 1.0,
        ReferentialIntegrity "o_custkey" "customer.{c_custkey}" = 1.0,
        DatasetMatch "ordersref" "o_orderkey->o_orderkey" = 1.0,
        AggregateMatch "avg(o_totalprice)" "avg(customer.c_acctbal)" > 1.0 ]""",
        additional_datasets={"customer": customer, "ordersref": orders})
    rows = [(r["Rule"], 1.0 if r["Outcome"] == "Passed" else 0.0)
            for r in out.collect()]
    return _metrics_df(spark, rows)


def q_custom_aggregator(spark, sf_dir):
    """CustomAggregator (scan.py CustomAggregator, parity
    CustomAggregator.scala:40-75): a fixed callable producing per-key
    metrics (row counts per l_returnflag), run once through the full
    analysis runner AND once through the split-state semigroup merge —
    both must reproduce the oracle's plain GROUP BY counts."""
    from deequ_spark import do_analysis_run
    from deequ_spark.analyzers.scan import CustomAggregator

    df = _load(spark, sf_dir, "lineitem")

    def flag_counts(d):
        return {r["l_returnflag"]: float(r["cnt"])
                for r in (d.groupBy("l_returnflag")
                          .agg(F.count(F.lit(1)).alias("cnt")).collect())}

    agg = CustomAggregator(flag_counts, instance_name="returnflag_counts")
    ctx = do_analysis_run(df, [agg])
    metric = next(iter(ctx.metric_map.values()))
    if not metric.is_success:
        raise RuntimeError(str(metric.error))
    rows = [(f"cnt_{k}", v) for k, v in metric.value.items()]
    # mergeable-state path: two disjoint partitions, merged keyed state
    s_even = agg.compute_state_from(df.where("l_orderkey % 2 = 0"))
    s_odd = agg.compute_state_from(df.where("l_orderkey % 2 = 1"))
    merged = agg.compute_metric_from_state(s_even.merge(s_odd))
    rows += [(f"merged_cnt_{k}", v) for k, v in merged.value.items()]
    return _metrics_df(spark, sorted(rows))


def q_schema_validation(spark, sf_dir):
    """Row-level schema validation (schema_validation.py, parity
    RowLevelSchemaValidator.scala:183-282): declared schema over orders
    splits valid/invalid rows in one scan; the oracle recomputes the
    predicate split and the casted-column aggregates with try_cast."""
    from deequ_spark.schema_validation import RowLevelSchema, validate_schema

    df = _load(spark, sf_dir, "orders")
    schema = (RowLevelSchema()
              .with_string_column("o_orderpriority", is_nullable=False,
                                  matches="^[1-3]-")
              .with_int_column("o_custkey", is_nullable=False, min_value=1)
              .with_decimal_column("o_totalprice", 12, 2, is_nullable=False)
              .with_string_column("o_orderstatus", max_length=1))
    res = validate_schema(df, schema)
    valid_aggs = (res.valid_rows
                  .agg(F.sum("o_custkey").alias("ck"),
                       F.sum("o_totalprice").alias("tp"))
                  .collect()[0])
    rows = [("num_valid", float(res.num_valid_rows)),
            ("num_invalid", float(res.num_invalid_rows)),
            ("valid_ncols", float(len(res.valid_rows.columns))),
            ("valid_custkey_sum", float(valid_aggs["ck"])),
            ("valid_totalprice_sum", float(valid_aggs["tp"]))]
    return _metrics_df(spark, sorted(rows))


def q_applicability(spark, sf_dir):
    """Applicability checker (applicability.py, parity
    Applicability.scala:47-244): per-analyzer and per-check verdicts on a
    fixed schema (seeded synthetic rows, no real data scanned). The
    verdicts are schema-determined, so the oracle is the literal truth
    table."""
    from pyspark.sql import types as T

    from deequ_spark import (Check, CheckLevel, Completeness, Compliance,
                             Maximum, Mean, Minimum)
    from deequ_spark.applicability import Applicability

    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("price", T.DoubleType()),
    ])
    app = Applicability(spark)
    probes = [
        ("Completeness_name", [Completeness("name")]),
        ("Mean_qty", [Mean("qty")]),
        ("Mean_name_string", [Mean("name")]),            # numeric on string
        ("Minimum_price", [Minimum("price")]),
        ("Maximum_missing_col", [Maximum("nope")]),      # absent column
        ("Compliance_qty", [Compliance("qty_pos", "qty >= 0")]),
    ]
    rows = [(label, 1.0 if app.is_applicable(analyzers, schema).is_applicable
             else 0.0)
            for label, analyzers in probes]
    strict = (Check(CheckLevel.ERROR, "strict")
              .has_size(lambda n: n > 1e12))             # failing assertion
    rows.append(("check_failed_assertion_still_applicable",
                 1.0 if app.is_applicable(strict, schema).is_applicable
                 else 0.0))
    bad = Check(CheckLevel.ERROR, "bad").has_mean("name", lambda v: True)
    rows.append(("check_mean_on_string_inapplicable",
                 0.0 if not app.is_applicable(bad, schema).is_applicable
                 else 1.0))
    return _metrics_df(spark, sorted(rows))


def q_repository(spark, sf_dir):
    """Spark-table metrics repository (repository.py, parity
    sparktable/SparkMetricsRepository.scala): save two keyed analysis
    contexts to a Spark table, read them back through load_by_key and the
    after()/with_tag_values() query DSL — metric values must survive the
    serde round-trip bit-for-bit (the oracle recomputes them from the
    source tables)."""
    import tempfile

    from deequ_spark import (Completeness, ResultKey, Size,
                             SparkTableMetricsRepository, do_analysis_run)

    table = "deequ_oracle_metrics"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    repo = SparkTableMetricsRepository(
        spark, table, path=tempfile.mkdtemp(prefix="deequ_repo_"))
    key1 = ResultKey.make(1000, {"env": "test"})
    key2 = ResultKey.make(2000, {"env": "prod"})
    repo.save(key1, do_analysis_run(_load(spark, sf_dir, "nation"),
                                    [Size(), Completeness("n_name")]))
    repo.save(key2, do_analysis_run(_load(spark, sf_dir, "region"), [Size()]))

    ctx1 = repo.load_by_key(key1)
    ctx2 = repo.load_by_key(key2)
    after = repo.load().after(1500).get()
    tagged = repo.load().with_tag_values({"env": "test"}).get()
    rows = [("k1_size", ctx1.metric_map[Size()].value),
            ("k1_completeness_n_name",
             ctx1.metric_map[Completeness("n_name")].value),
            ("k2_size", ctx2.metric_map[Size()].value),
            ("n_entries_after_1500", float(len(after))),
            ("after_entry_size",
             after[0][1].metric_map[Size()].value if after else -1.0),
            ("n_entries_tag_env_test", float(len(tagged))),
            ("tagged_entry_date",
             float(tagged[0][0].dataset_date) if tagged else -1.0)]
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return _metrics_df(spark, sorted(rows))


# ---------------------------------------------------------------------------
# composite driver-gate queries
#
# The driver's correctness gate records at most ~50 queries per round; the
# full registry is larger, so small related operators are folded into
# composite queries. Each composite UNIONs its components' (metric, value)
# frames — metric names are disjoint by construction, so a hash mismatch is
# still attributable to exactly one component operator.
# ---------------------------------------------------------------------------

def _union_metrics(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _prefix_metrics(df: DataFrame, prefix: str) -> DataFrame:
    return df.select(F.concat(F.lit(prefix), F.col("metric")).alias("metric"),
                     "value")


def q_text_pipeline_ops(spark, sf_dir):
    """Composite: the five text-corpus operators (gopher quality flags,
    top-n-gram repetition, chunking, boilerplate removal, winnowing
    fingerprints) in one metrics frame."""
    return _union_metrics([
        q_gopher_quality(spark, sf_dir),
        q_repetition(spark, sf_dir),
        q_chunking(spark, sf_dir),
        q_boilerplate(spark, sf_dir),
        q_winnowing(spark, sf_dir),
    ])


def q_satellite_ops(spark, sf_dir):
    """Composite: the four satellite subsystems (row-level schema
    validation, applicability checker, Spark-table metrics repository,
    CustomAggregator state merge) in one metrics frame."""
    return _union_metrics([
        q_schema_validation(spark, sf_dir),
        q_applicability(spark, sf_dir),
        q_repository(spark, sf_dir),
        q_custom_aggregator(spark, sf_dir),
    ])


def q_embedding_ops(spark, sf_dir):
    """Composite: EmbeddingQuality analyzer (+ semigroup state merge) and
    the hyperplane-LSH top-k contract checks."""
    return _union_metrics([
        q_embedding_quality(spark, sf_dir),
        q_lsh_ann_contract(spark, sf_dir),
    ])


def q_comparison_ops(spark, sf_dir):
    """Composite: the cross-dataset comparison family — referential
    integrity, DatasetMatch, RowCountMatch + SchemaMatch."""
    return _union_metrics([
        q_referential_integrity(spark, sf_dir),
        q_dataset_match(spark, sf_dir),
        q_row_count_match(spark, sf_dir),
    ])


def q_language_id_all(spark, sf_dir):
    """Composite: 5-language marker classifier over documents + the
    20-language trigram classifier on fixed samples (prefixed `tg_`)."""
    return _union_metrics([
        q_language_id(spark, sf_dir),
        _prefix_metrics(q_language_id_trigram(spark, sf_dir), "tg_"),
    ])


def q_ivf_ann_all(spark, sf_dir):
    """Composite: IVF top-k via in-memory centroids + the on-disk
    partitioned-index round-trip path (prefixed `disk_`)."""
    return _union_metrics([
        q_ivf_ann(spark, sf_dir),
        _prefix_metrics(q_ivf_index_disk(spark, sf_dir), "disk_"),
    ])


# --- r11 registry consolidation: fold driver-stale single-operator
# queries into family composites (judge ask #8).  Each part keeps its
# own metric names (verified disjoint within a composite by
# tests/test_entry_contract.py); oracle side composes the SAME parts
# via _union_oracles, so a hash mismatch still attributes to one
# operator's metric rows.  126 -> 97 registry names means full driver
# coverage fits TWO 50-slot windows.

def q_bpe_ops(spark, sf_dir):
    """Composite (r12 fold): the full BPE family — word-frequency table
    head + first merge (`bpe_stats`, unprefixed), 60-merge training +
    retokenization (`tr_`), 5-merge loop induction with winning pair
    counts (`mg_`), and the id encode/decode round trip (`id_`). Each
    part keeps its r10 value-oracle, composed via _union_oracles with
    the same prefixes."""
    return _union_metrics([
        q_bpe_stats(spark, sf_dir),
        _prefix_metrics(q_bpe_train(spark, sf_dir), "tr_"),
        _prefix_metrics(q_bpe_merges(spark, sf_dir), "mg_"),
        _prefix_metrics(q_bpe_ids(spark, sf_dir), "id_"),
    ])


def q_scan_basic_ops(spark, sf_dir):
    """Composite: Size, Completeness, Compliance, PatternMatch."""
    return _union_metrics([
        q_size(spark, sf_dir),
        q_completeness(spark, sf_dir),
        q_compliance(spark, sf_dir),
        q_pattern_match(spark, sf_dir),
    ])


def q_scan_stats_ops(spark, sf_dir):
    """Composite: Min/Max/Range, Sum/Mean, moments (stddev/variance/
    skew/kurtosis/corr), exact quantiles + IQR."""
    return _union_metrics([
        q_min_max(spark, sf_dir),
        q_sum_mean(spark, sf_dir),
        q_moments(spark, sf_dir),
        q_quantiles(spark, sf_dir),
    ])


def q_scan_sketch_ops(spark, sf_dir):
    """Composite: the sketch/inference analyzers — ApproxCountDistinct
    (HLL), ApproxQuantile (KLL-backed), full KLLSketch, DataType
    inference."""
    return _union_metrics([
        q_approx_count_distinct(spark, sf_dir),
        q_approx_quantile(spark, sf_dir),
        q_kll(spark, sf_dir),
        q_datatype(spark, sf_dir),
    ])


def q_grouping_core_ops(spark, sf_dir):
    """Composite: the grouping-analyzer family — Uniqueness/UVR/
    Distinctness/CountDistinct, Entropy, DuplicateRowCount,
    MutualInformation."""
    return _union_metrics([
        q_uniqueness(spark, sf_dir),
        q_entropy(spark, sf_dir),
        q_duplicate_rows(spark, sf_dir),
        q_mutual_information(spark, sf_dir),
    ])


def q_histogram_ops(spark, sf_dir):
    """Composite: Histogram (top-N), HistogramBinned (width_bucket),
    MinLength/MaxLength/ZerosCount/RatioOfSums."""
    return _union_metrics([
        q_histogram(spark, sf_dir),
        q_histogram_binned(spark, sf_dir),
        q_length_zeros_ratio(spark, sf_dir),
    ])


def q_dqdl_ops(spark, sf_dir):
    """Composite: core DQDL ruleset execution + the extended rule
    types (CustomSql, composites, ColumnDataType)."""
    return _union_metrics([
        q_dqdl(spark, sf_dir),
        q_dqdl_extended(spark, sf_dir),
    ])


def q_row_level_ops(spark, sf_dir):
    """Composite: row-level constraint annotation + the filtered-rows
    (NullBehavior / filtered_row) truth tables."""
    return _union_metrics([
        q_row_level(spark, sf_dir),
        q_row_level_filtered(spark, sf_dir),
    ])


def q_check_flow_ops(spark, sf_dir):
    """Composite: the end-to-end check flows — VerificationSuite run,
    windowed (time-sliced) verification, multi-stage pipeline."""
    return _union_metrics([
        q_verification(spark, sf_dir),
        q_windowed(spark, sf_dir),
        q_pipeline(spark, sf_dir),
    ])


def q_drift_anomaly_ops(spark, sf_dir):
    """Composite: distribution distances (KS/L-inf/chi-square/PSI) +
    anomaly-detection strategies over a metric series."""
    return _union_metrics([
        q_distance(spark, sf_dir),
        q_anomaly(spark, sf_dir),
    ])


def q_text_filter_ops(spark, sf_dir):
    """Composite: text-quality heuristics, PII detection, LM
    perplexity-proxy scoring."""
    return _union_metrics([
        q_text_quality(spark, sf_dir),
        q_pii(spark, sf_dir),
        q_lm_score(spark, sf_dir),
    ])


def q_lexical_dedup_ops(spark, sf_dir):
    """Composite: exact dedup, n-gram Jaccard, MinHash-LSH banding,
    hot-bucket capping."""
    return _union_metrics([
        q_exact_dedup(spark, sf_dir),
        q_jaccard_dedup(spark, sf_dir),
        q_minhash_lsh(spark, sf_dir),
        q_hot_bucket_cap(spark, sf_dir),
    ])


def q_media_feature_ops(spark, sf_dir):
    """Composite: multimodal decode/feature plumbing, media format
    probes, audio feature extraction."""
    return _union_metrics([
        q_multimodal(spark, sf_dir),
        q_media_probe(spark, sf_dir),
        # audio metrics prefixed: media_probe also emits duration_ms_sum
        _prefix_metrics(q_audio_ops(spark, sf_dir), "au_"),
    ])


def q_ann_ops(spark, sf_dir):
    """Composite: brute-force / kNN-join top-k, IVF (+ on-disk index),
    hyperplane-LSH embedding near-dup."""
    return _union_metrics([
        q_ann_topk(spark, sf_dir),
        # IVF must find the same neighbors brute-force does, so its
        # neighbor-id metric names collide by construction — prefix
        _prefix_metrics(q_ivf_ann_all(spark, sf_dir), "ivf_"),
        q_embedding_near_dup(spark, sf_dir),
    ])


def q_stream_ops(spark, sf_dir):
    """Composite: Structured-Streaming incremental verification +
    event sessionization."""
    return _union_metrics([
        q_streaming(spark, sf_dir),
        q_sessionize(spark, sf_dir),
    ])


def q_lm_score(spark, sf_dir):
    """CCNet-style LM quality scoring (llm/text.py char_trigram_model +
    lm_quality_score): train an add-one-smoothed char-trigram model on
    the TRUSTED subset (lang='en'), score every document's
    cross-entropy under it — the standard perplexity-proxy filter for
    training-corpus curation. The oracle retrains and rescores in
    DuckDB with the same closed-form math; en docs must average lower
    cross-entropy than non-en (asserted via the two fuzzed means).
    Scale: the model is charset-bounded so it BROADCASTS; scoring is
    explode + map-side join + partially-aggregated per-doc avg."""
    from deequ_spark.llm import char_trigram_model, lm_quality_score
    docs = _load(spark, sf_dir, "documents")
    model = char_trigram_model(docs.where(F.col("lang") == "en"), "text")
    scored = lm_quality_score(docs, "doc_id", "text", model)
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_trigrams").alias("tris"),
        F.avg(F.when(F.col("lang") == "en",
                     F.col("cross_entropy"))).alias("ce_en"),
        F.avg(F.when(F.col("lang") != "en",
                     F.col("cross_entropy"))).alias("ce_other"),
        F.sum(F.col("cross_entropy").isNull().cast("long"))
        .alias("unscored")).collect()[0]
    n_vocab = model.count()
    assert row["ce_en"] < row["ce_other"]      # fluent-text sanity
    return _metrics_df(spark, sorted([
        ("n_docs", row["n"]),
        ("trigrams_total", row["tris"]),
        ("model_vocab", n_vocab),
        ("unscored_docs", row["unscored"]),
        ("ce_en_fuzz", _fuzz(row["ce_en"])),
        ("ce_other_fuzz", _fuzz(row["ce_other"]))]))


_LM_SCORE_ORACLE_SQL = """
    WITH tris AS (
      SELECT doc_id, lang,
             unnest([substr(lower(text), i, 3)
                     for i in range(1, length(text) - 1)]) AS trigram
      FROM documents WHERE length(text) >= 3),
    model AS (
      SELECT trigram, COUNT(*) AS c FROM tris WHERE lang = 'en'
      GROUP BY trigram),
    tot AS (SELECT SUM(c) AS total, COUNT(*) AS vocab FROM model),
    probs AS (
      SELECT trigram, ln((c + 1.0) / (total + vocab)) AS lp
      FROM model, tot),
    scored AS (
      SELECT t.doc_id, t.lang,
             COALESCE(p.lp,
                      (SELECT ln(1.0 / (total + vocab)) FROM tot)) AS lp
      FROM tris t LEFT JOIN probs p USING (trigram)),
    per_doc AS (
      SELECT doc_id, lang, -AVG(lp) AS ce, COUNT(*) AS n_tri
      FROM scored GROUP BY doc_id, lang)
    SELECT 'ce_en_fuzz' AS metric,
           FLOOR(AVG(CASE WHEN lang = 'en' THEN ce END) * 1e6) AS value
    FROM per_doc
    UNION ALL SELECT 'ce_other_fuzz',
        FLOOR(AVG(CASE WHEN lang <> 'en' THEN ce END) * 1e6) FROM per_doc
    UNION ALL SELECT 'model_vocab', CAST(vocab AS DOUBLE) FROM tot
    UNION ALL SELECT 'n_docs', CAST(COUNT(*) AS DOUBLE) FROM documents
    UNION ALL SELECT 'trigrams_total', CAST(SUM(n_tri) AS DOUBLE) FROM per_doc
    UNION ALL SELECT 'unscored_docs',
        CAST((SELECT COUNT(*) FROM documents) - COUNT(*) AS DOUBLE)
        FROM per_doc
"""


def q_media_probe(spark, sf_dir):
    """Header-only media probing (llm/multimodal.py probe_media /
    probe_media_features): per doc one synthetic blob cycling BMP / PNG /
    JPEG / MP4 / MP3 / TIFF / WebP by doc_id % 7 (dims, duration, track
    count all doc_id arithmetic; every other JPEG is patched to
    PROGRESSIVE to prove dimension sniffing works where full decode
    refuses; every other MP3 carries a Xing VBR tag so both the tag path
    and the frame-chain walk are exercised; TIFF alternates endianness;
    WebP alternates lossy VP8 / lossless VP8L) — probed format counts
    and metadata sums are recomputed by the oracle. Probing is the first
    pass of a media pipeline: route/filter by what a blob IS before
    paying any decode cost."""
    import numpy as np
    import pandas as pd
    from deequ_spark.llm import (encode_jpeg, encode_mp3_frames,
                                 encode_mp4_skeleton)
    from deequ_spark.llm import probe_media_features
    from deequ_spark.llm.multimodal import (encode_bmp, encode_png,
                                            encode_tiff_skeleton,
                                            encode_webp_skeleton)

    docs = _load(spark, sf_dir, "documents")

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                m = i % 7
                if m == 0:
                    blob = encode_bmp(np.full((1 + i % 5, 1 + i % 7, 3),
                                              i % 251, dtype=np.uint8))
                elif m == 1:
                    blob = encode_png(np.full((1 + i % 6, 1 + i % 8, 3),
                                              (i * 37) % 251,
                                              dtype=np.uint8))
                elif m == 2:
                    jh, jw = 8 + i % 9, 8 + i % 11
                    yy, xx = np.mgrid[0:jh, 0:jw]
                    img = np.stack([xx * 3 + i % 200, yy * 5,
                                    (xx + yy) * 2],
                                   axis=2).astype(np.uint8)
                    blob = encode_jpeg(img, quality=85)
                    if (i // 4) % 2 == 1:     # progressive SOF2 variant
                        blob = blob.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
                elif m == 3:
                    blob = encode_mp4_skeleton(
                        100 * (1 + i % 20), 160 + (i % 10) * 16,
                        90 + (i % 10) * 9, n_tracks=1 + i % 3)
                elif m == 4:
                    # 64 kbps @ 48 kHz ⇒ exactly 24 ms/frame
                    blob = encode_mp3_frames(
                        1 + i % 8, mono=(i % 2 == 0),
                        xing=((i // 5) % 2 == 1))
                elif m == 5:
                    blob = encode_tiff_skeleton(
                        16 + i % 10, 8 + i % 6, 1 + i % 4,
                        big_endian=(i % 2 == 1))
                else:
                    blob = encode_webp_skeleton(
                        1 + i % 64, 1 + i % 32,
                        lossless=(i % 2 == 1))
                ids.append(i)
                payloads.append(blob)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary")
    probed = probe_media_features(media)
    row = probed.agg(
        F.sum((F.col("format") == "bmp").cast("long")).alias("bmp"),
        F.sum((F.col("format") == "png").cast("long")).alias("png"),
        F.sum((F.col("format") == "jpeg").cast("long")).alias("jpg"),
        F.sum((F.col("format") == "mp4").cast("long")).alias("mp4"),
        F.sum((F.col("format") == "mp3").cast("long")).alias("mp3"),
        F.sum((F.col("format") == "tiff").cast("long")).alias("tif"),
        F.sum((F.col("format") == "webp").cast("long")).alias("wbp"),
        F.sum((F.col("format") == "unknown").cast("long")).alias("unk"),
        F.sum("width").alias("w"), F.sum("height").alias("h"),
        F.sum("duration_ms").alias("dur"),
        F.sum("sample_rate").alias("sr"),
        F.sum("n_channels").alias("ch"),
        F.sum("n_tracks").alias("trk")).collect()[0]
    return _metrics_df(spark, sorted([
        ("cnt_bmp", row["bmp"]), ("cnt_png", row["png"]),
        ("cnt_jpeg", row["jpg"]), ("cnt_mp4", row["mp4"]),
        ("cnt_mp3", row["mp3"]), ("cnt_tiff", row["tif"]),
        ("cnt_webp", row["wbp"]), ("cnt_unknown", row["unk"]),
        ("width_sum", row["w"]), ("height_sum", row["h"]),
        ("duration_ms_sum", row["dur"]),
        ("samplerate_sum", row["sr"]), ("channels_sum", row["ch"]),
        ("tracks_sum", row["trk"])]))


_MEDIA_PROBE_ORACLE_SQL = """
    WITH m AS (SELECT doc_id AS i, doc_id % 7 AS f FROM documents)
    SELECT 'channels_sum' AS metric, CAST(SUM(CASE
        WHEN f IN (0, 1, 2) THEN 3
        WHEN f = 4 THEN 1 + (i % 2)
        WHEN f = 5 THEN 1 + i % 4
        WHEN f = 6 THEN 3 + (i % 2) END) AS DOUBLE) AS value FROM m
    UNION ALL SELECT 'cnt_bmp', CAST(SUM(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'cnt_jpeg', CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'cnt_mp3', CAST(SUM(CASE WHEN f = 4 THEN 1 ELSE 0 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'cnt_mp4', CAST(SUM(CASE WHEN f = 3 THEN 1 ELSE 0 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'cnt_png', CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'cnt_tiff', CAST(SUM(CASE WHEN f = 5 THEN 1 ELSE 0 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'cnt_webp', CAST(SUM(CASE WHEN f = 6 THEN 1 ELSE 0 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'cnt_unknown', 0.0
    UNION ALL SELECT 'duration_ms_sum', CAST(SUM(CASE
        WHEN f = 3 THEN 100 * (1 + i % 20)
        WHEN f = 4 THEN 24 * (1 + i % 8) END) AS DOUBLE) FROM m
    UNION ALL SELECT 'height_sum', CAST(SUM(CASE
        WHEN f = 0 THEN 1 + i % 5
        WHEN f = 1 THEN 1 + i % 6
        WHEN f = 2 THEN 8 + i % 9
        WHEN f = 3 THEN 90 + (i % 10) * 9
        WHEN f = 5 THEN 8 + i % 6
        WHEN f = 6 THEN 1 + i % 32 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'samplerate_sum',
        CAST(SUM(CASE WHEN f = 4 THEN 48000 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'tracks_sum',
        CAST(SUM(CASE WHEN f = 3 THEN 1 + i % 3 END) AS DOUBLE) FROM m
    UNION ALL SELECT 'width_sum', CAST(SUM(CASE
        WHEN f = 0 THEN 1 + i % 7
        WHEN f = 1 THEN 1 + i % 8
        WHEN f = 2 THEN 8 + i % 11
        WHEN f = 3 THEN 160 + (i % 10) * 16
        WHEN f = 5 THEN 16 + i % 10
        WHEN f = 6 THEN 1 + i % 64 END) AS DOUBLE) FROM m
"""


def q_audio_ops(spark, sf_dir):
    """Audio feature extraction (llm/multimodal.py audio_features): one
    PCM WAV per document — a pure tone at FFT bin k = 1 + doc_id % 60
    (256 samples @ 8 kHz, cosine with a 0.01-rad phase so no sample is
    exactly zero) — pushed through encode_wav_pcm16 → audio_features
    (mapInPandas: decode, RMS, zero crossings, rFFT dominant bin). For a
    bin-centered tone with k ≤ 60 the features have closed forms the
    oracle recomputes from doc_id arithmetic: dominant_bin = k,
    zero_crossings = 2k, frames = 256, duration = 32 ms; RMS ≈ A/√2 is
    asserted in-task (int16 quantization bound)."""
    import math

    import numpy as np
    import pandas as pd
    from deequ_spark.llm import audio_features
    from deequ_spark.llm.multimodal import encode_wav_pcm16

    docs = _load(spark, sf_dir, "documents")

    def synth(batches):
        n = np.arange(256)
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                k = 1 + i % 60
                s = np.round(12000 * np.cos(2 * np.pi * k * n / 256
                                            + 0.01)).astype(np.int16)
                ids.append(i)
                payloads.append(encode_wav_pcm16(s, 8000))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary")
    feats = audio_features(media)
    expected_rms = 12000.0 / math.sqrt(2)
    row = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_frames").alias("frames"),
        F.sum("duration_ms").alias("dur"),
        F.sum("dominant_bin").alias("bins"),
        F.sum("dominant_freq_hz").alias("freqs"),
        F.sum("zero_crossings").alias("zc"),
        F.sum((F.abs(F.col("rms") - expected_rms) < 60).cast("long"))
        .alias("rms_ok"),
        F.countDistinct("sample_rate").alias("rates")).collect()[0]
    return _metrics_df(spark, sorted([
        ("rows", row["n"]),
        ("frames_sum", row["frames"]),
        ("duration_ms_sum", row["dur"]),
        ("dominant_bin_sum", row["bins"]),
        ("dominant_freq_sum", row["freqs"]),
        ("zero_crossings_sum", row["zc"]),
        ("rms_ok_rows", row["rms_ok"]),
        ("rates_distinct", row["rates"])]))


_AUDIO_OPS_ORACLE_SQL = """
    SELECT 'dominant_bin_sum' AS metric,
           CAST(SUM(1 + doc_id % 60) AS DOUBLE) AS value FROM documents
    UNION ALL SELECT 'dominant_freq_sum',
        CAST(SUM(1 + doc_id % 60) AS DOUBLE) * 8000.0 / 256.0 FROM documents
    UNION ALL SELECT 'duration_ms_sum', 32.0 * COUNT(*) FROM documents
    UNION ALL SELECT 'frames_sum', 256.0 * COUNT(*) FROM documents
    UNION ALL SELECT 'rates_distinct', 1.0
    UNION ALL SELECT 'rms_ok_rows', CAST(COUNT(*) AS DOUBLE) FROM documents
    UNION ALL SELECT 'rows', CAST(COUNT(*) AS DOUBLE) FROM documents
    UNION ALL SELECT 'zero_crossings_sum',
        CAST(SUM(2 * (1 + doc_id % 60)) AS DOUBLE) FROM documents
"""


def q_sequence_packing(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing (llm/packing.py
    pack_sequences): documents tokenized by whitespace, salted into 8
    independent streams, packed into 256-token sequences (straddling
    docs split across consecutive packs).  The oracle regenerates every
    (doc x pack) slice with DuckDB window functions; the layout checksum
    SUM(pack_id * slice_tokens) pins the exact pack assignment, not just
    the aggregate counts.  Scale: the prefix-sum window is PARTITIONED
    BY the salt group - no global sort (asserted in test_llm.py)."""
    from deequ_spark.llm import (pack_sequences, pack_statistics,
                                 token_count_whitespace)
    docs = _load(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id",
                            token_count_whitespace(F.col("text")),
                            budget=256, n_groups=8)
    stats = pack_statistics(packed, 256).collect()[0]
    extra = packed.agg(
        F.count(F.lit(1)).alias("n_slices"),
        F.max("n_slices").alias("max_slices"),
        F.sum(F.col("pack_id") * F.col("slice_tokens")).alias("ck"),
    ).collect()[0]
    # r8: assemble_packs CONTENT check — synthetic ids
    # doc_id*100000 + in-doc position make every packed token's value
    # (and therefore per-pack content sums) pure arithmetic the oracle
    # re-derives from the layout
    from deequ_spark.llm import assemble_packs
    wc = token_count_whitespace(F.col("text"))
    ids = docs.select(
        "doc_id",
        F.when(wc > 0, F.transform(
            F.sequence(F.lit(1), wc.cast("int")),
            lambda i: F.col("doc_id") * 100000 + i.cast("long")))
        .otherwise(F.array().cast("array<long>")).alias("token_ids"))
    packs = assemble_packs(packed, ids, budget=256,
                            id_col="doc_id")
    asm = packs.select(
        F.aggregate(F.col("token_ids"), F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("ids_sum"),
        F.col("pack_id"), F.size("token_ids").alias("nt"),
        F.size("doc_spans").alias("ns")).agg(
        F.sum("ids_sum").alias("ids_ck"),
        F.sum(F.col("pack_id") * F.col("ids_sum")).alias("w_ck"),
        F.sum("nt").alias("atok"), F.sum("ns").alias("aspans")) \
        .collect()[0]
    return _metrics_df(spark, sorted([
        ("n_packs", stats["n_packs"]),
        ("total_tokens", stats["total_tokens"]),
        ("full_packs", stats["full_packs"]),
        ("max_docs_per_pack", stats["max_docs_per_pack"]),
        ("n_slices", extra["n_slices"]),
        ("max_slices_per_doc", extra["max_slices"]),
        ("layout_checksum", extra["ck"]),
        ("assembled_tokens", asm["atok"]),
        ("assembled_spans", asm["aspans"]),
        ("ids_checksum", asm["ids_ck"]),
        ("weighted_ids_checksum", asm["w_ck"])]))


_SEQUENCE_PACKING_ORACLE_SQL = """
    WITH toks AS (
      SELECT doc_id, doc_id % 8 AS grp,
             len(list_filter(string_split_regex(text, '\\s+'),
                             w -> w <> '')) AS tokens
      FROM documents),
    pos AS (SELECT * FROM toks WHERE tokens > 0),
    offs AS (
      SELECT grp, doc_id, tokens,
             CAST(COALESCE(SUM(tokens) OVER (PARTITION BY grp ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS start_off
      FROM pos),
    ex AS (
      SELECT grp, doc_id, tokens, start_off,
             unnest(range(start_off // 256,
                          (start_off + tokens - 1) // 256 + 1)) AS pack_id
      FROM offs),
    slices AS (
      SELECT grp, pack_id, doc_id,
             least(start_off + tokens, (pack_id + 1) * 256)
               - greatest(start_off, pack_id * 256) AS slice_tokens
      FROM ex),
    per_pack AS (
      SELECT grp, pack_id, SUM(slice_tokens) AS fill,
             COUNT(*) AS docs_in_pack
      FROM slices GROUP BY grp, pack_id),
    per_doc AS (
      SELECT grp, doc_id, COUNT(*) AS n_sl FROM slices GROUP BY grp, doc_id)
    , content AS (
      SELECT s.grp, s.pack_id, s.doc_id, s.slice_tokens,
             greatest(o.start_off, s.pack_id * 256) - o.start_off + 1
               AS a,
             least(o.start_off + o.tokens, (s.pack_id + 1) * 256)
               - o.start_off AS b
      FROM slices s JOIN offs o
        ON s.grp = o.grp AND s.doc_id = o.doc_id),
    content_sums AS (
      SELECT grp, pack_id,
             slice_tokens * doc_id * 100000
               + (a + b) * (b - a + 1) // 2 AS ids_sum
      FROM content)
    SELECT 'full_packs' AS metric,
           CAST(SUM(CASE WHEN fill = 256 THEN 1 ELSE 0 END) AS DOUBLE) AS value
    FROM per_pack
    UNION ALL SELECT 'layout_checksum',
        CAST(SUM(pack_id * slice_tokens) AS DOUBLE) FROM slices
    UNION ALL SELECT 'max_docs_per_pack',
        CAST(MAX(docs_in_pack) AS DOUBLE) FROM per_pack
    UNION ALL SELECT 'max_slices_per_doc',
        CAST(MAX(n_sl) AS DOUBLE) FROM per_doc
    UNION ALL SELECT 'n_packs', CAST(COUNT(*) AS DOUBLE) FROM per_pack
    UNION ALL SELECT 'n_slices', CAST(COUNT(*) AS DOUBLE) FROM slices
    UNION ALL SELECT 'total_tokens', CAST(SUM(fill) AS DOUBLE) FROM per_pack
    UNION ALL SELECT 'assembled_tokens',
        CAST(SUM(fill) AS DOUBLE) FROM per_pack
    UNION ALL SELECT 'assembled_spans',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM slices)
    UNION ALL SELECT 'ids_checksum',
        CAST(SUM(ids_sum) AS DOUBLE) FROM content_sums
    UNION ALL SELECT 'weighted_ids_checksum',
        CAST(SUM(pack_id * ids_sum) AS DOUBLE) FROM content_sums
"""


def q_corpus_sampling(spark, sf_dir):
    """Deterministic corpus sampling/mixing (llm/packing.py): md5-
    threshold Bernoulli sampling (map-only, engine-portable, the
    reproducible train/held-out split primitive) plus exact per-language
    stratified quotas (row_number over the md5 ordering).  Checksums of
    the kept doc_ids pin the EXACT selected set against the DuckDB
    oracle, proving the sampling decisions are engine-independent.
    NEW r7: mixture_sample — Pile/LLaMA-style domain-mixture composition
    via exact integer largest-remainder apportionment (weights 5:2:2:1
    over en/de/fr/zh, es deliberately unweighted, total=601 so both the
    leftover-distribution and the availability-cap paths fire); the
    oracle replays the SAME integer apportionment in SQL."""
    from deequ_spark.llm import hash_sample, mixture_sample, \
        stratified_sample
    docs = _load(spark, sf_dir, "documents")
    bern = hash_sample(docs, "doc_id", 0.25)
    b = bern.agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_chars").alias("chars"),
                 F.sum("doc_id").alias("ck")).collect()[0]
    strat = stratified_sample(docs, "lang", "doc_id", quota=50)
    s = strat.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("doc_id").alias("ck")).collect()[0]
    per_lang = strat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()
    mix = mixture_sample(docs, "lang", "doc_id",
                         {"en": 5, "de": 2, "fr": 2, "zh": 1}, total=601)
    m = mix.agg(F.count(F.lit(1)).alias("n"),
                F.sum("doc_id").alias("ck")).collect()[0]
    mix_lang = mix.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()
    return _metrics_df(spark, sorted(
        [("bern_n", b["n"]), ("bern_chars", b["chars"]),
         ("bern_checksum", b["ck"]),
         ("strat_n", s["n"]), ("strat_checksum", s["ck"]),
         ("mix_n", m["n"]), ("mix_checksum", m["ck"])] +
        [("strat_" + r["lang"], r["n"]) for r in per_lang] +
        [("mix_" + r["lang"], r["n"]) for r in mix_lang]))


_CORPUS_SAMPLING_ORACLE_SQL = """
    WITH bern AS (
      SELECT * FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'),
    strat AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                          doc_id) AS rn
        FROM documents) t
      WHERE rn <= 50)
    SELECT 'bern_chars' AS metric, CAST(SUM(n_chars) AS DOUBLE) AS value
    FROM bern
    UNION ALL SELECT 'bern_checksum', CAST(SUM(doc_id) AS DOUBLE) FROM bern
    UNION ALL SELECT 'bern_n', CAST(COUNT(*) AS DOUBLE) FROM bern
    UNION ALL SELECT 'strat_checksum', CAST(SUM(doc_id) AS DOUBLE) FROM strat
    UNION ALL SELECT 'strat_n', CAST(COUNT(*) AS DOUBLE) FROM strat
    UNION ALL SELECT 'strat_' || lang, CAST(COUNT(*) AS DOUBLE)
    FROM strat GROUP BY lang
    UNION ALL SELECT * FROM (
      -- mixture_sample replay: integer largest-remainder apportionment
      -- (same rational arithmetic as apportion_quotas: base = N*w // den,
      -- remainder order = N*w % den desc then lang asc, cap at count)
      WITH mixw AS (SELECT * FROM (VALUES ('en', 5), ('de', 2),
                                          ('fr', 2), ('zh', 1)) AS t(lang, wt)),
      pres AS (SELECT m.lang, m.wt, COUNT(*) AS c
               FROM mixw m JOIN documents d ON d.lang = m.lang
               GROUP BY m.lang, m.wt),
      app AS (SELECT lang, c, (601 * wt) // den AS base,
                     (601 * wt) % den AS rem
              FROM pres, (SELECT SUM(wt) AS den FROM pres)),
      ranked AS (SELECT lang, c, base,
                        ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk
                 FROM app),
      quota AS (SELECT lang,
                       LEAST(base + CASE WHEN rk <= (SELECT 601 - SUM(base)
                                                     FROM app)
                                         THEN 1 ELSE 0 END, c) AS q
                FROM ranked),
      mix AS (SELECT r.doc_id, r.lang FROM (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                                  doc_id) AS rn
                FROM documents) r JOIN quota USING (lang)
              WHERE rn <= q)
      SELECT 'mix_checksum' AS metric, CAST(SUM(doc_id) AS DOUBLE) AS value
      FROM mix
      UNION ALL SELECT 'mix_n', CAST(COUNT(*) AS DOUBLE) FROM mix
      UNION ALL SELECT 'mix_' || lang, CAST(COUNT(*) AS DOUBLE)
      FROM mix GROUP BY lang)
"""


def q_bm25_search(spark, sf_dir):
    """BM25 ranked retrieval (llm/search.py bm25_topk/bm25_corpus_stats):
    the query side of a training-data pipeline. Two MAP-ONLY corpus
    passes (stats partial-agg, then a scoring projection); ranking is
    TakeOrderedAndProject, never a global sort (plan-asserted in
    tests/test_search.py). The oracle recomputes the Robertson/Lucene
    formula term-by-term in DuckDB with the identical left-to-right
    float-sum order; scores are fuzzed, ids/dfs exact."""
    from deequ_spark.llm import bm25_corpus_stats, bm25_topk
    docs = _load(spark, sf_dir, "documents")
    terms = ["hash", "join", "merge", "table"]  # sorted(set(query terms))
    stats = bm25_corpus_stats(docs, "text", terms)
    top = bm25_topk(docs, "doc_id", "text", "hash join merge table",
                    k=10).collect()
    pairs = [("n_docs", stats["n_docs"]),
             ("avgdl_fuzz", _fuzz(stats["avgdl"]))]
    pairs += [(f"df_{t}", stats["df"][i]) for i, t in enumerate(terms)]
    for r in top:
        pairs.append((f"rank_{r['rank']:02d}_doc", r["doc_id"]))
        pairs.append((f"rank_{r['rank']:02d}_score_fuzz", _fuzz(r["score"])))
    return _metrics_df(spark, sorted(pairs))


_BM25_ORACLE_SQL = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      FROM documents),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(len(tk)) AS DOUBLE) / COUNT(*) AS avgdl FROM toks),
    tf AS (
      SELECT doc_id, len(tk) AS dl,
             len(list_filter(tk, x -> x = 'hash'))  AS tf0,
             len(list_filter(tk, x -> x = 'join'))  AS tf1,
             len(list_filter(tk, x -> x = 'merge')) AS tf2,
             len(list_filter(tk, x -> x = 'table')) AS tf3
      FROM toks),
    dfs AS (
      SELECT SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
             SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
      FROM tf),
    scored AS (
      SELECT doc_id,
        0.0
        + ln(1 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        + ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        + ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        + ln(1 + (n - df3 + 0.5) / (df3 + 0.5)) * (tf3 * 2.2) / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        AS score
      FROM tf, dfs, stats),
    top AS (
      SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank,
             doc_id, FLOOR(score * 1e6) AS sf
      FROM scored WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT 10)
    SELECT 'rank_' || lpad(CAST(rank AS VARCHAR), 2, '0') || '_doc' AS metric,
           CAST(doc_id AS DOUBLE) AS value FROM top
    UNION ALL SELECT 'rank_' || lpad(CAST(rank AS VARCHAR), 2, '0') || '_score_fuzz', sf FROM top
    UNION ALL SELECT 'n_docs', CAST(n AS DOUBLE) FROM stats
    UNION ALL SELECT 'avgdl_fuzz', FLOOR(avgdl * 1e6) FROM stats
    UNION ALL SELECT 'df_hash',  CAST(df0 AS DOUBLE) FROM dfs
    UNION ALL SELECT 'df_join',  CAST(df1 AS DOUBLE) FROM dfs
    UNION ALL SELECT 'df_merge', CAST(df2 AS DOUBLE) FROM dfs
    UNION ALL SELECT 'df_table', CAST(df3 AS DOUBLE) FROM dfs
    ORDER BY metric, value
"""


def q_token_stats(spark, sf_dir):
    """Corpus token statistics (llm/search.py): frequency table (one
    map-side-combined groupBy shuffle, TakeOrdered rank slice), total/
    vocab counts, mass concentration, and the Zipf slope fitted on the
    BOUNDED top-200 slice. The top-20 tokens are pinned BY NAME in the
    metric column (total tie-break freq desc / token asc makes the set
    engine-portable); slope fuzzed, counts exact."""
    from deequ_spark.llm import corpus_token_stats, token_frequencies
    docs = _load(spark, sf_dir, "documents")
    stats = corpus_token_stats(docs, "text", top_n=200)
    top = token_frequencies(docs, "text", top_n=20).collect()
    pairs = [("n_tokens", stats["n_tokens"]),
             ("vocab", stats["vocab"]),
             ("top1_freq", stats["top1_freq"]),
             ("top200_mass", stats["top_n_mass"]),
             ("zipf_slope_fuzz", _fuzz(stats["zipf_slope"]))]
    pairs += [(f"tok_{r['token']}", r["freq"]) for r in top]
    return _metrics_df(spark, sorted(pairs))


_TOKEN_STATS_ORACLE_SQL = """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents),
    freq AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY token),
    ranked AS (
      SELECT token, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
      FROM freq),
    top200 AS (SELECT * FROM ranked WHERE rank <= 200),
    fit AS (
      SELECT COUNT(*) AS m, SUM(ln(rank)) AS sx, SUM(ln(freq)) AS sy,
             SUM(ln(rank) * ln(rank)) AS sxx,
             SUM(ln(rank) * ln(freq)) AS sxy
      FROM top200),
    tot AS (SELECT SUM(freq) AS n_tokens, COUNT(*) AS vocab FROM freq)
    SELECT 'n_tokens' AS metric, CAST(n_tokens AS DOUBLE) AS value FROM tot
    UNION ALL SELECT 'vocab', CAST(vocab AS DOUBLE) FROM tot
    UNION ALL SELECT 'top1_freq',
        (SELECT CAST(freq AS DOUBLE) FROM ranked WHERE rank = 1)
    UNION ALL SELECT 'top200_mass',
        (SELECT CAST(SUM(freq) AS DOUBLE) FROM top200)
    UNION ALL SELECT 'zipf_slope_fuzz',
        (SELECT FLOOR((m * sxy - sx * sy) / (m * sxx - sx * sx) * 1e6)
         FROM fit)
    UNION ALL SELECT 'tok_' || token, CAST(freq AS DOUBLE)
    FROM ranked WHERE rank <= 20
    ORDER BY metric, value
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style cluster-scoped semantic dedup (llm/semdedup.py,
    Abbas et al. arXiv:2303.09540): assign to nearest centroid, exact
    within-cluster pair search, keep the LEAST-centroid-similar member
    per duplicate component. Centroids are engine-replayable: the
    embeddings of the 4 vec_ids with smallest md5(vec_id), ordered by
    vec_id. The oracle recomputes assignment (argmax cosine, ties to
    the lower index), the within-cluster pair set, a recursive-CTE
    transitive closure, and the keep rule."""
    from deequ_spark.llm import (assign_clusters, semantic_deduplicate,
                                 semantic_duplicate_pairs)
    emb = _load(spark, sf_dir, "embeddings")
    seeds = (emb.select("vec_id", "embedding")
             .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
             .limit(4).collect())
    cents = [[float(v) for v in r["embedding"]]
             for r in sorted(seeds, key=lambda r: r["vec_id"])]
    assigned = assign_clusters(emb, "embedding", cents)
    csizes = assigned.groupBy("cluster").count().collect()
    # ONE fuzz-quantized aggregate, not a sum of 500 per-row floors —
    # each row's floor is an independent last-ulp boundary trial
    # between numpy-BLAS and sequential-SQL dot products
    cavg = assigned.agg(F.avg("centroid_sim").alias("s")).collect()[0]["s"]
    pairs = semantic_duplicate_pairs(emb, "vec_id", "embedding",
                                     threshold=0.45,
                                     centroids=cents).collect()
    kept = semantic_deduplicate(emb, "vec_id", "embedding", threshold=0.45,
                                centroids=cents).count()
    rows = [(f"p_{r['id_a']}_{r['id_b']}", _fuzz(r["cosine"]))
            for r in pairs]
    rows += [(f"csize_{r['cluster']}", float(r["count"])) for r in csizes]
    rows += [("n_pairs", float(len(pairs))), ("kept", float(kept)),
             ("csim_avg_fuzz", _fuzz(cavg))]
    return _metrics_df(spark, sorted(rows))


_SEMANTIC_DEDUP_ORACLE = """
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seeds AS (
  SELECT vec_id, v FROM e
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv,
         sqrt(list_dot_product(v, v)) AS cn
  FROM seeds),
sims AS (
  SELECT e.vec_id, c.cidx,
         list_dot_product(e.v, c.cv)
         / (sqrt(list_dot_product(e.v, e.v)) * c.cn) AS sim
  FROM e, cents c),
assign AS (
  SELECT vec_id, cidx AS cluster, sim AS centroid_sim FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, cidx) AS rk
    FROM sims) WHERE rk = 1),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  JOIN assign aa ON aa.vec_id = a.vec_id
  JOIN assign ab ON ab.vec_id = b.vec_id AND ab.cluster = aa.cluster
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v))
           * sqrt(list_dot_product(b.v, b.v))) >= 0.45),
edges AS (
  SELECT ia AS src, ib AS dst FROM pairs
  UNION SELECT ib, ia FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, ed.dst FROM reach r JOIN edges ed ON r.b = ed.src),
comp AS (SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a),
ranked AS (
  SELECT c.id, c.component,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY s.centroid_sim ASC, c.id ASC) AS rk
  FROM comp c JOIN assign s ON s.vec_id = c.id)
SELECT 'p_' || CAST(ia AS VARCHAR) || '_' || CAST(ib AS VARCHAR) AS metric,
       FLOOR(cos * 1e6) AS value FROM pairs
UNION ALL SELECT 'csize_' || CAST(cluster AS VARCHAR),
       CAST(COUNT(*) AS DOUBLE) FROM assign GROUP BY cluster
UNION ALL SELECT 'n_pairs', CAST(COUNT(*) AS DOUBLE) FROM pairs
UNION ALL SELECT 'kept',
       (SELECT COUNT(*) FROM e)
       - (SELECT COUNT(*) FROM ranked WHERE rk > 1)
UNION ALL SELECT 'csim_avg_fuzz',
       FLOOR(AVG(centroid_sim) * 1e6) FROM assign
ORDER BY metric, value
"""


def q_paragraph_dedup(spark, sf_dir):
    """Keep-first duplicate-span removal (llm/text.py paragraph_dedup,
    the C4 repeated-span / RefinedWeb duplicated-passage treatment):
    every repeated paragraph keeps its minimum-(id,pos) occurrence and
    loses the rest. The synthetic corpus has no newlines, so the query
    splits on the literal ' a ' separator — the operator semantics are
    separator-independent. All metrics are integer-exact: paragraph
    counts, removals, rebuilt-corpus length and an id-weighted length
    checksum that pins WHICH documents changed and by how much."""
    from deequ_spark.llm import paragraph_dedup
    docs = _load(spark, sf_dir, "documents")
    out = paragraph_dedup(docs, "doc_id", "text", sep=" a ", min_chars=2)
    row = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_paragraphs").alias("paras"),
        F.sum("n_removed").alias("removed"),
        F.sum(F.length("deduped")).alias("len_sum"),
        F.sum(F.col("doc_id") * F.length("deduped")).alias("checksum"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_changed"),
    ).collect()[0]
    return _metrics_df(spark, sorted([
        ("n_docs", row["n_docs"]), ("paras", row["paras"]),
        ("removed", row["removed"]), ("len_sum", row["len_sum"]),
        ("checksum", row["checksum"]),
        ("docs_changed", row["docs_changed"])]))


_PARAGRAPH_DEDUP_ORACLE = """
    WITH arrs AS (
      SELECT doc_id, regexp_split_to_array(text, ' a ') AS arr
      FROM documents),
    parts AS (
      SELECT doc_id,
             unnest([{'pos': i, 'para': arr[i]}
                     for i in range(1, len(arr) + 1)],
                    recursive := true)
      FROM arrs),
    marked AS (
      SELECT doc_id, pos, para,
             length(para) < 2 OR ROW_NUMBER() OVER (
                 PARTITION BY CASE WHEN length(para) >= 2
                                   THEN para END
                 ORDER BY doc_id, pos) = 1 AS keep
      FROM parts),
    rebuilt AS (
      SELECT doc_id,
             COALESCE(string_agg(para, ' a ' ORDER BY pos)
                      FILTER (WHERE keep), '') AS d,
             COUNT(*) AS np,
             SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS nr
      FROM marked GROUP BY doc_id)
    SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM rebuilt
    UNION ALL SELECT 'paras', CAST(SUM(np) AS DOUBLE) FROM rebuilt
    UNION ALL SELECT 'removed', CAST(SUM(nr) AS DOUBLE) FROM rebuilt
    UNION ALL SELECT 'len_sum', CAST(SUM(length(d)) AS DOUBLE) FROM rebuilt
    UNION ALL SELECT 'checksum',
        CAST(SUM(doc_id * length(d)) AS DOUBLE) FROM rebuilt
    UNION ALL SELECT 'docs_changed',
        CAST(SUM(CASE WHEN nr > 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM rebuilt
    ORDER BY metric
"""


def q_corpus_drift(spark, sf_dir):
    """Token-distribution drift between two corpus snapshots
    (llm/search.py corpus_drift) — here the en vs non-en split of
    documents, whose vocabularies genuinely differ. Union-of-top-100
    vocabulary + __OTHER__ fold; totals/union/other masses are
    integer-exact, PSI and L∞ fuzzed, and the top-5 drifted tokens are
    pinned BY NAME with their fuzzed probability gaps (the gap doubles
    are single divisions of exact integers — identical across engines,
    so the selection order is engine-portable)."""
    from deequ_spark.llm import corpus_drift
    docs = _load(spark, sf_dir, "documents")
    d = corpus_drift(docs.where(F.col("lang") == "en"),
                     docs.where(F.col("lang") != "en"),
                     "text", top_n=100)
    rows = [("psi_fuzz", _fuzz(d["psi"])),
            ("linf_fuzz", _fuzz(d["l_infinity"])),
            ("n_tokens_a", d["n_tokens_a"]), ("n_tokens_b", d["n_tokens_b"]),
            ("union_size", d["union_size"]),
            ("other_a", d["other_a"]), ("other_b", d["other_b"])]
    rows += [(f"drift_{t}", _fuzz(abs(pa - pb)))
             for t, pa, pb in d["top_drifted"][:5]]
    return _metrics_df(spark, sorted(rows))


_CORPUS_DRIFT_ORACLE = """
    WITH ta AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents WHERE lang = 'en'),
    tb AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents WHERE lang <> 'en'),
    fa AS (SELECT t, COUNT(*) AS c FROM ta GROUP BY t),
    fb AS (SELECT t, COUNT(*) AS c FROM tb GROUP BY t),
    un AS (
      SELECT t FROM (SELECT t, ROW_NUMBER() OVER (ORDER BY c DESC, t) rk
                     FROM fa) WHERE rk <= 100
      UNION
      SELECT t FROM (SELECT t, ROW_NUMBER() OVER (ORDER BY c DESC, t) rk
                     FROM fb) WHERE rk <= 100),
    na AS (SELECT SUM(c) AS n FROM fa),
    nb AS (SELECT SUM(c) AS n FROM fb),
    dist AS (
      SELECT u.t,
             COALESCE(fa.c, 0) AS ca, COALESCE(fb.c, 0) AS cb,
             COALESCE(fa.c, 0) / (SELECT n FROM na) AS pa,
             COALESCE(fb.c, 0) / (SELECT n FROM nb) AS pb
      FROM un u LEFT JOIN fa ON fa.t = u.t LEFT JOIN fb ON fb.t = u.t),
    oth AS (
      SELECT (SELECT n FROM na) - SUM(ca) AS oa,
             (SELECT n FROM nb) - SUM(cb) AS ob
      FROM dist),
    buckets AS (
      SELECT pa, pb FROM dist
      UNION ALL
      SELECT oa / (SELECT n FROM na), ob / (SELECT n FROM nb) FROM oth)
    SELECT 'psi_fuzz' AS metric,
           FLOOR(SUM((GREATEST(pb, 1e-4) - GREATEST(pa, 1e-4))
                     * ln(GREATEST(pb, 1e-4) / GREATEST(pa, 1e-4)))
                 * 1e6) AS value
    FROM buckets
    UNION ALL SELECT 'linf_fuzz',
        (SELECT FLOOR(MAX(ABS(pa - pb)) * 1e6) FROM buckets)
    UNION ALL SELECT 'n_tokens_a', CAST((SELECT n FROM na) AS DOUBLE)
    UNION ALL SELECT 'n_tokens_b', CAST((SELECT n FROM nb) AS DOUBLE)
    UNION ALL SELECT 'union_size',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM un)
    UNION ALL SELECT 'other_a', (SELECT CAST(oa AS DOUBLE) FROM oth)
    UNION ALL SELECT 'other_b', (SELECT CAST(ob AS DOUBLE) FROM oth)
    UNION ALL
    SELECT * FROM (
      SELECT 'drift_' || t AS metric, FLOOR(ABS(pa - pb) * 1e6) AS value
      FROM dist ORDER BY ABS(pa - pb) DESC, t LIMIT 5)
"""


def q_span_dedup(spark, sf_dir):
    """Exact substring dedup (llm/dedup.py duplicate_span_removal, the
    Lee et al. ExactSubstr semantics): every duplicated 4-token window
    keeps its minimum-(id,pos) occurrence; other occurrences' spans are
    cut, overlaps merging. key='text' here so the oracle's text-keyed
    GROUP BY is the literal same computation (key='hash' is the
    documented scale path — 24-byte shuffle rows instead of n-gram
    strings; the two keys are asserted equal in tests). All metrics are
    integer-exact."""
    from deequ_spark.llm import duplicate_span_removal
    docs = _load(spark, sf_dir, "documents")
    out = duplicate_span_removal(docs, "doc_id", "text", n=4, key="text")
    row = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_removed_tokens").alias("removed"),
        F.sum(F.length("deduped")).alias("len_sum"),
        F.sum(F.col("doc_id") * F.length("deduped")).alias("checksum"),
        F.sum((F.col("n_removed_tokens") > 0).cast("long"))
        .alias("docs_changed"),
    ).collect()[0]
    return _metrics_df(spark, sorted([
        ("n_docs", row["n_docs"]), ("tokens", row["tokens"]),
        ("removed", row["removed"]), ("len_sum", row["len_sum"]),
        ("checksum", row["checksum"]),
        ("docs_changed", row["docs_changed"])]))


_SPAN_DEDUP_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'),
                         t -> t <> '') AS t
      FROM documents),
    w AS (
      SELECT doc_id,
             unnest([{'pos': i - 1,
                      'g': array_to_string(t[i:i+3], ' ')}
                     for i in range(1, len(t) - 2)],
                    recursive := true)
      FROM toks WHERE len(t) >= 4),
    ranked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY g) AS c,
             ROW_NUMBER() OVER (PARTITION BY g
                                ORDER BY doc_id, pos) AS rn
      FROM w),
    losers AS (SELECT doc_id, pos FROM ranked WHERE c >= 2 AND rn > 1),
    tok_rows AS (
      SELECT doc_id,
             unnest([{'tpos': i - 1, 'tok': t[i]}
                     for i in range(1, len(t) + 1)],
                    recursive := true)
      FROM toks),
    marked AS (
      SELECT tr.doc_id, tr.tpos, tr.tok,
             EXISTS (SELECT 1 FROM losers l
                     WHERE l.doc_id = tr.doc_id
                       AND l.pos <= tr.tpos AND tr.tpos < l.pos + 4)
             AS cut
      FROM tok_rows tr),
    rebuilt AS (
      SELECT t.doc_id,
             COALESCE(m.d, '') AS d,
             COALESCE(m.nt, 0) AS nt,
             COALESCE(m.nr, 0) AS nr
      FROM toks t LEFT JOIN (
        SELECT doc_id,
               string_agg(tok, ' ' ORDER BY tpos) FILTER (WHERE NOT cut)
                 AS d,
               COUNT(*) AS nt,
               SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS nr
        FROM marked GROUP BY doc_id) m ON m.doc_id = t.doc_id)
    SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM rebuilt
    UNION ALL SELECT 'tokens', CAST(SUM(nt) AS DOUBLE) FROM rebuilt
    UNION ALL SELECT 'removed', CAST(SUM(nr) AS DOUBLE) FROM rebuilt
    UNION ALL SELECT 'len_sum',
        CAST(SUM(length(COALESCE(d, ''))) AS DOUBLE) FROM rebuilt
    UNION ALL SELECT 'checksum',
        CAST(SUM(doc_id * length(COALESCE(d, ''))) AS DOUBLE) FROM rebuilt
    UNION ALL SELECT 'docs_changed',
        CAST(SUM(CASE WHEN nr > 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM rebuilt
    ORDER BY metric
"""


def q_video_frames(spark, sf_dir):
    """Video frame sampling (llm/multimodal.py sample_video_frames):
    per doc one synthetic blob — 3 of 4 are MP4 skeletons whose
    duration/dims/track-count are doc_id arithmetic, every 4th a WAV
    (must yield ZERO frame rows — the operator is also the video
    filter). Midpoint-uniform timestamps ts = dur·(2i+1)/8 are exact
    multiples of 1/8 so every aggregate is bit-exact; the oracle
    recomputes them from the same arithmetic without parsing MP4 (the
    skeleton round-trip itself is pinned by the media_probe query)."""
    import numpy as np
    import pandas as pd

    from deequ_spark.llm import encode_mp4_skeleton, sample_video_frames
    from deequ_spark.llm.multimodal import encode_wav_pcm16

    docs = _load(spark, sf_dir, "documents")

    def synth(batches):
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                if i % 4 == 3:
                    blob = encode_wav_pcm16(
                        np.zeros((64, 1), dtype=np.int16), 8000)
                else:
                    blob = encode_mp4_skeleton(
                        500 + (i * 37) % 1500, 160 + i % 32,
                        90 + i % 18, n_tracks=1 + i % 3)
                ids.append(i)
                blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "payload": blobs})

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary")
    frames = sample_video_frames(media, n_frames=4)
    row = frames.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("media_id").alias("videos"),
        F.sum("ts_ms").alias("ts_sum"),
        F.sum("width").alias("w_sum"),
        F.sum("height").alias("h_sum"),
        F.sum("n_tracks").alias("tr_sum"),
        F.sum(F.col("decoded").cast("long")).alias("decoded"),
    ).collect()[0]
    return _metrics_df(spark, sorted([
        ("frame_rows", row["rows"]), ("videos", row["videos"]),
        ("ts_sum", row["ts_sum"]), ("w_sum", row["w_sum"]),
        ("h_sum", row["h_sum"]), ("tr_sum", row["tr_sum"]),
        ("decoded", row["decoded"])]))


_VIDEO_FRAMES_ORACLE = """
    WITH vids AS (
      SELECT doc_id, 500 + (doc_id * 37) % 1500 AS dur,
             160 + doc_id % 32 AS w, 90 + doc_id % 18 AS h,
             1 + doc_id % 3 AS tr
      FROM documents WHERE doc_id % 4 <> 3),
    frames AS (
      SELECT doc_id, dur, w, h, tr, unnest([0, 1, 2, 3]) AS i FROM vids)
    SELECT 'frame_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
    FROM frames
    UNION ALL SELECT 'videos',
        CAST(COUNT(DISTINCT doc_id) AS DOUBLE) FROM frames
    UNION ALL SELECT 'ts_sum',
        SUM(dur * (2 * i + 1) / 8.0) FROM frames
    UNION ALL SELECT 'w_sum', CAST(SUM(w) AS DOUBLE) FROM frames
    UNION ALL SELECT 'h_sum', CAST(SUM(h) AS DOUBLE) FROM frames
    UNION ALL SELECT 'tr_sum', CAST(SUM(tr) AS DOUBLE) FROM frames
    UNION ALL SELECT 'decoded', 0.0
    ORDER BY metric
"""


def q_streaming_drift(spark, sf_dir):
    """Streaming drift monitor (streaming/drift.py): baseline = en
    docs; the stream delivers the non-en docs in two parity-split
    micro-batches. PSI binning is FIXED at the baseline's top-100
    vocabulary (+__OTHER__), so each batch's scores are pure integer
    arithmetic the oracle replays (fuzzed at the PSI/L∞ floats).
    Results are keyed by each batch's exact token total — stream batch
    ORDER is an implementation detail, content identity is not — and
    the cumulative PSI over both batches is order-independent."""
    import os
    import shutil

    from deequ_spark.streaming import StreamingDriftMonitor

    docs = _load(spark, sf_dir, "documents")
    src = f"/tmp/deequ_drift_src_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    for k in (0, 1):
        (docs.where((F.col("lang") != "en") & (F.col("doc_id") % 2 == k))
         .select("doc_id", "text").coalesce(1)
         .write.parquet(f"{src}/split{k}"))
    flat = f"{src}/flat"
    os.makedirs(flat)
    n = 0
    for k in (0, 1):
        d = f"{src}/split{k}"
        for f_ in sorted(os.listdir(d)):
            if f_.endswith(".parquet"):
                os.rename(f"{d}/{f_}", f"{flat}/part{n}.parquet")
                n += 1

    mon = StreamingDriftMonitor(docs.where(F.col("lang") == "en"),
                                "text", top_n=100, psi_threshold=0.25)
    q = (spark.readStream.schema("doc_id long, text string")
         .option("maxFilesPerTrigger", 1).parquet(flat)
         .writeStream.foreachBatch(mon)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    rows = [("n_batches", float(len(mon.results))),
            ("cum_psi_fuzz", _fuzz(mon.results[-1].cumulative_psi))]
    for i, r in enumerate(sorted(mon.results, key=lambda r: r.n_tokens)):
        rows += [(f"b{i}_tokens", float(r.n_tokens)),
                 (f"b{i}_psi_fuzz", _fuzz(r.psi)),
                 (f"b{i}_linf_fuzz", _fuzz(r.l_infinity)),
                 (f"b{i}_alert", float(r.alert))]
    return _metrics_df(spark, sorted(rows))


_STREAMING_DRIFT_ORACLE = """
    WITH ref_toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents WHERE lang = 'en'),
    ref_freq AS (SELECT t, COUNT(*) AS c FROM ref_toks GROUP BY t),
    vocab AS (
      SELECT t, c FROM (SELECT t, c,
                        ROW_NUMBER() OVER (ORDER BY c DESC, t) rk
                        FROM ref_freq) WHERE rk <= 100),
    ref AS (
      SELECT t, c FROM vocab
      UNION ALL
      SELECT '__OTHER__',
             (SELECT SUM(c) FROM ref_freq) - (SELECT SUM(c) FROM vocab)),
    ref_n AS (SELECT SUM(c) AS n FROM ref),
    batch_toks AS (
      SELECT doc_id % 2 AS split,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents WHERE lang <> 'en'),
    splits AS (SELECT DISTINCT split FROM batch_toks),
    hits AS (
      SELECT split, t, COUNT(*) AS c FROM batch_toks
      WHERE t IN (SELECT t FROM vocab) GROUP BY split, t),
    bcnt AS (
      SELECT s.split, v.t, COALESCE(h.c, 0) AS c
      FROM splits s CROSS JOIN vocab v
      LEFT JOIN hits h ON h.split = s.split AND h.t = v.t
      UNION ALL
      SELECT split, '__OTHER__',
             COUNT(*) - SUM(CASE WHEN t IN (SELECT t FROM vocab)
                            THEN 1 ELSE 0 END)
      FROM batch_toks GROUP BY split),
    btot AS (SELECT split, SUM(c) AS n FROM bcnt GROUP BY split),
    labeled AS (
      SELECT split, ROW_NUMBER() OVER (ORDER BY n, split) - 1 AS bi, n
      FROM btot),
    scored AS (
      SELECT l.bi, l.n,
             SUM((GREATEST(b.c / l.n, 1e-4) - GREATEST(r.c / rn.n, 1e-4))
                 * ln(GREATEST(b.c / l.n, 1e-4)
                      / GREATEST(r.c / rn.n, 1e-4))) AS psi,
             MAX(ABS(b.c / l.n - r.c / rn.n)) AS linf
      FROM bcnt b
      JOIN labeled l ON l.split = b.split
      JOIN ref r ON r.t = b.t, ref_n rn
      GROUP BY l.bi, l.n),
    cum AS (
      SELECT t, SUM(c) AS c FROM bcnt GROUP BY t),
    cum_scored AS (
      SELECT SUM((GREATEST(c.c / cn.n, 1e-4) - GREATEST(r.c / rn.n, 1e-4))
                 * ln(GREATEST(c.c / cn.n, 1e-4)
                      / GREATEST(r.c / rn.n, 1e-4))) AS psi
      FROM cum c JOIN ref r ON r.t = c.t,
           (SELECT SUM(c) AS n FROM cum) cn, ref_n rn)
    SELECT 'n_batches' AS metric,
           CAST((SELECT COUNT(*) FROM labeled) AS DOUBLE) AS value
    UNION ALL SELECT 'cum_psi_fuzz',
        (SELECT FLOOR(psi * 1e6) FROM cum_scored)
    UNION ALL SELECT 'b' || bi || '_tokens', CAST(n AS DOUBLE) FROM scored
    UNION ALL SELECT 'b' || bi || '_psi_fuzz', FLOOR(psi * 1e6) FROM scored
    UNION ALL SELECT 'b' || bi || '_linf_fuzz', FLOOR(linf * 1e6)
    FROM scored
    UNION ALL SELECT 'b' || bi || '_alert',
        CASE WHEN psi > 0.25 THEN 1.0 ELSE 0.0 END FROM scored
    ORDER BY metric, value
"""


def q_near_dup_ratio(spark, sf_dir):
    """Corpus hygiene as a data-quality constraint (analyzers/corpus.py
    NearDuplicateRatio + Check.has_near_duplicate_ratio): the
    near-duplicate loser fraction of documents rides the regular
    VerificationSuite machinery. method='jaccard' at threshold 0.5 /
    shingle 3 — the exact math the near_dedup oracle already replays —
    so the oracle recomputes losers/total/ratio and both check verdicts
    from the same transitive closure."""
    from deequ_spark import (Check, CheckLevel, CheckStatus,
                             NearDuplicateRatio, VerificationSuite,
                             do_analysis_run)
    docs = _load(spark, sf_dir, "documents")
    analyzer = NearDuplicateRatio("doc_id", "text", threshold=0.5,
                                  method="jaccard")
    ctx = do_analysis_run(docs, [analyzer])
    (metric,) = ctx.metric_map.values()
    state = analyzer.compute_state_from(docs)
    loose = (VerificationSuite().on_data(docs)
             .add_check(Check(CheckLevel.ERROR, "loose")
                        .has_near_duplicate_ratio(
                            "doc_id", "text", lambda r: r <= 0.9,
                            threshold=0.5, method="jaccard"))
             .run())
    tight = (VerificationSuite().on_data(docs)
             .add_check(Check(CheckLevel.ERROR, "tight")
                        .has_near_duplicate_ratio(
                            "doc_id", "text", lambda r: r < 1e-9,
                            threshold=0.5, method="jaccard"))
             .run())
    return _metrics_df(spark, sorted([
        ("losers", float(state.losers)),
        ("total", float(state.total)),
        ("ratio_fuzz", _fuzz(metric.value)),
        ("loose_ok", float(loose.status == CheckStatus.SUCCESS)),
        ("tight_ok", float(tight.status == CheckStatus.SUCCESS))]))


_NEAR_DUP_RATIO_ORACLE = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
    THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
    ELSE [array_to_string(t, ' ')] END) AS shingles
  FROM toks
), w AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
  FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT i, j FROM inter
  JOIN sizes sa ON sa.doc_id = inter.i
  JOIN sizes sb ON sb.doc_id = inter.j
  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
), edges AS (
  SELECT i AS src, j AS dst FROM pairs
  UNION SELECT j, i FROM pairs
), nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
), comp AS (
  SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a
), agg AS (
  SELECT (SELECT COUNT(*) FROM comp WHERE id <> component) AS losers,
         (SELECT COUNT(*) FROM documents) AS total)
SELECT 'losers' AS metric, CAST(losers AS DOUBLE) AS value FROM agg
UNION ALL SELECT 'total', CAST(total AS DOUBLE) FROM agg
UNION ALL SELECT 'ratio_fuzz',
    FLOOR(losers * 1.0 / total * 1e6) FROM agg
UNION ALL SELECT 'loose_ok',
    CASE WHEN losers * 1.0 / total <= 0.9 THEN 1.0 ELSE 0.0 END FROM agg
UNION ALL SELECT 'tight_ok',
    CASE WHEN losers * 1.0 / total < 1e-9 THEN 1.0 ELSE 0.0 END FROM agg
ORDER BY metric
"""


def q_dsir_sample(spark, sf_dir):
    """DSIR importance resampling (llm/packing.py importance_sample,
    Xie et al. arXiv:2302.03169): target = en docs, corpus = all docs;
    per-doc trigram importance weights, engine-portable Gumbel top-40
    (noise from md5(doc_id) integers — the oracle derives the SAME
    doubles). The drawn SET is pinned by name; weights are fuzzed at
    1e3 (they are ~1e2-magnitude sums of hundreds of log terms, so a
    1e6 grid would sit too close to the cross-engine summation
    noise)."""
    from deequ_spark.llm import importance_sample
    docs = _load(spark, sf_dir, "documents")
    picked = importance_sample(docs, "doc_id", "text",
                               docs.where(F.col("lang") == "en"),
                               k=40, temperature=2.0).collect()
    rows = [("n_picked", float(len(picked)))]
    rows += [(f"d_{r['doc_id']}", float(math.floor(r["dsir_weight"] * 1e3)))
             for r in picked]
    return _metrics_df(spark, sorted(rows))


_DSIR_ORACLE = """
    WITH tris AS (
      SELECT doc_id, lang,
             unnest([substr(lower(text), i, 3)
                     for i in range(1, length(text) - 1)]) AS trigram
      FROM documents WHERE length(text) >= 3),
    tm AS (SELECT trigram, COUNT(*) AS c FROM tris WHERE lang = 'en'
           GROUP BY trigram),
    tt AS (SELECT SUM(c) AS total, COUNT(*) AS vocab FROM tm),
    tp AS (SELECT trigram, ln((c + 1.0) / (total + vocab)) AS lp
           FROM tm, tt),
    rm AS (SELECT trigram, COUNT(*) AS c FROM tris GROUP BY trigram),
    rt AS (SELECT SUM(c) AS total, COUNT(*) AS vocab FROM rm),
    rp AS (SELECT trigram, ln((c + 1.0) / (total + vocab)) AS lp
           FROM rm, rt),
    w AS (
      SELECT t.doc_id,
             SUM(COALESCE(tpp.lp,
                          (SELECT ln(1.0 / (total + vocab)) FROM tt))
                 - COALESCE(rpp.lp,
                            (SELECT ln(1.0 / (total + vocab)) FROM rt)))
             AS wt
      FROM tris t
      LEFT JOIN tp tpp USING (trigram)
      LEFT JOIN rp rpp USING (trigram)
      GROUP BY t.doc_id),
    keyed AS (
      SELECT doc_id, wt,
             wt / 2.0 - ln(-ln(
               (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                     AS BIGINT) + 0.5) / 4503599627370496.0)) AS k
      FROM w),
    top AS (
      SELECT doc_id, wt FROM keyed
      ORDER BY k DESC, doc_id LIMIT 40)
    SELECT 'n_picked' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
    FROM top
    UNION ALL
    SELECT 'd_' || CAST(doc_id AS VARCHAR), FLOOR(wt * 1e3) FROM top
    ORDER BY metric, value
"""


def q_bpe_stats(spark, sf_dir):
    """SQL-verifiable surface of BPE training (llm/bpe.py): the
    word-frequency table head and the FIRST merge — the argmax over
    end-marked character pairs weighted by word count, which the
    oracle recomputes independently. (The full merge loop is iterative
    and lives in `bpe_train` under the rows-only contract.)"""
    from deequ_spark.llm import train_bpe, word_frequency_table
    docs = _load(spark, sf_dir, "documents")
    head = (word_frequency_table(docs, "text")
            .orderBy(F.col("count").desc(), F.col("word"))
            .limit(10).collect())
    first = train_bpe(docs, "text", n_merges=1)[0]
    rows = [(f"w_{r['word']}", float(r["count"])) for r in head]
    rows.append((f"first_merge_{first[0]}+{first[1]}", 1.0))
    return _metrics_df(spark, sorted(rows))


_BPE_STATS_ORACLE = r"""
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                w -> w <> '')) AS word
      FROM documents),
    freq AS (SELECT word, COUNT(*) AS c FROM words GROUP BY word),
    head AS (
      SELECT word, c FROM freq ORDER BY c DESC, word LIMIT 10),
    syms AS (
      SELECT list_append(split(word, ''), '</w>') AS s, c FROM freq),
    pairs AS (
      SELECT a, b, SUM(pc) AS pc
      FROM (SELECT unnest([{'a': s[i], 'b': s[i + 1], 'pc': c}
                          for i in range(1, len(s))],
                         recursive := true)
            FROM syms)
      GROUP BY a, b),
    first AS (
      SELECT a, b FROM pairs ORDER BY pc DESC, a, b LIMIT 1)
    SELECT 'w_' || word AS metric, CAST(c AS DOUBLE) AS value FROM head
    UNION ALL
    SELECT 'first_merge_' || a || '+' || b, 1.0 FROM first
    ORDER BY metric, value
"""


def q_bpe_train(spark, sf_dir):
    """Full BPE training + retokenization (llm/bpe.py): 60 merges
    learned from the corpus word-frequency table (one Spark pass +
    driver loop), then per-document token counts under the trained
    tokenizer. VALUE-ORACLED (r10): the DuckDB oracle replays all 60
    merge rounds via iterated ranked-pair CTEs (_bpe_train_oracle),
    including the min_pair_count=2 early stop, then re-derives every
    document's token count from the final segmentation table — merge
    names/order, n_merges, and token totals are all hash-compared."""
    from deequ_spark.llm import bpe_token_count, train_bpe
    docs = _load(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", n_merges=60, min_pair_count=2)
    counted = bpe_token_count(docs, "text", merges)
    row = counted.agg(
        F.sum("bpe_tokens").alias("tok"),
        F.max("bpe_tokens").alias("mx")).collect()[0]
    rows = [(f"m{i:02d}_{a}+{b}", float(i))
            for i, (a, b) in enumerate(merges)]
    rows += [("n_merges", float(len(merges))),
             ("bpe_tokens_total", float(row["tok"])),
             ("bpe_tokens_max", float(row["mx"]))]
    return _metrics_df(spark, sorted(rows))


def q_text_normalize(spark, sf_dir):
    """Unicode hygiene (llm/text.py normalize_text): mojibake repair →
    NFC → control/zero-width strip → whitespace collapse, one Arrow
    map-only stage. The sf corpus is ASCII, so each doc gets a
    deterministic doc_id%6 unicode suffix (NFD combining mark / cp1252
    mojibake / tab / zero-width / NBSP) injected IDENTICALLY in the
    oracle; per-group doc counts, cleaned lengths and marker counts are
    integer-exact."""
    from deequ_spark.llm import normalize_text
    docs = _load(spark, sf_dir, "documents")
    g = F.col("doc_id") % 6
    suffix = (F.when(g == 1, F.lit(" e\u0301tude"))   # NFD e+acute
              .when(g == 2, F.lit(" caf\u00C3\u00A9"))  # mojibake 'Ã©'
              .when(g == 3, F.lit(" tab\tx"))
              .when(g == 4, F.lit(" zero\u200Bwidth"))
              .when(g == 5, F.lit(" nb\u00A0sp"))
              .otherwise(F.lit("")))
    dirty = docs.select("doc_id",
                        F.concat(F.col("text"), suffix).alias("text"))
    cleaned = normalize_text(dirty, "text")
    agg = (cleaned.groupBy((F.col("doc_id") % 6).alias("g"))
           .agg(F.count("*").alias("n"),
                F.sum(F.length("text_clean")).alias("len"),
                F.sum("mojibake_markers").alias("mk"))
           .collect())
    pairs = []
    for r in agg:
        pairs += [(f"g{r['g']}_docs", r["n"]), (f"g{r['g']}_len", r["len"]),
                  (f"g{r['g']}_markers", r["mk"])]
    return _metrics_df(spark, sorted(pairs))


_TEXT_NORMALIZE_ORACLE_SQL = """
    WITH dirty AS (
      SELECT doc_id, doc_id % 6 AS g,
        text || CASE doc_id % 6
          WHEN 1 THEN ' e' || chr(769) || 'tude'
          WHEN 2 THEN ' caf' || chr(195) || chr(169)
          WHEN 3 THEN ' tab' || chr(9) || 'x'
          WHEN 4 THEN ' zero' || chr(8203) || 'width'
          WHEN 5 THEN ' nb' || chr(160) || 'sp'
          ELSE '' END AS t
      FROM documents),
    clean AS (
      SELECT g,
        trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          nfc_normalize(replace(t, chr(195) || chr(169), chr(233))),
          '[' || chr(8203) || chr(8204) || chr(8205) || chr(65279) || ']',
          '', 'g'),
          chr(160), ' ', 'g'),
          '[^\\S\\n]+', ' ', 'g'),
          ' ?\\n ?', chr(10), 'g')) AS c,
        CASE WHEN g = 2 THEN 1 ELSE 0 END AS markers
      FROM dirty)
    SELECT metric, value FROM (
      SELECT 'g' || g || '_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
      FROM clean GROUP BY g
      UNION ALL SELECT 'g' || g || '_len', CAST(SUM(length(c)) AS DOUBLE)
      FROM clean GROUP BY g
      UNION ALL SELECT 'g' || g || '_markers', CAST(SUM(markers) AS DOUBLE)
      FROM clean GROUP BY g) ORDER BY metric
"""


def q_url_ops(spark, sf_dir):
    """URL canonicalization + URL-keyed dedup (llm/urls.py): scheme/host
    lowering, www/default-port/userinfo/fragment/tracking-param removal,
    path slash collapse, query sort — all whole-stage-codegen expressions.
    URLs are synthesized from doc_id arithmetic so the oracle derives
    every canonical form INDEPENDENTLY (pure integer arithmetic, no regex
    replay): doc_id%7 picks the host, %3 the path, %4 the query/fragment
    shape, where shapes {0,1} share a canonical form."""
    from deequ_spark.llm import (canonicalize_url, extract_domain,
                                 url_dedup_stats, url_deduplicate)
    docs = _load(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 7).cast("string")
    j = (F.col("doc_id") % 3).cast("string")
    t = F.col("doc_id") % 4
    raw = F.concat(
        F.lit("https://WWW.Site"), k, F.lit(".COM:443/p//"), j, F.lit("/"),
        F.when(t == 0, F.lit("?utm_source=a&z=1&a=2"))
         .when(t == 1, F.lit("?z=1&a=2"))
         .when(t == 2, F.lit("?utm_campaign=x")).otherwise(F.lit("")),
        F.when(t % 2 == 0, F.concat(F.lit("#sec"), j)).otherwise(F.lit("")))
    urls = docs.select("doc_id", raw.alias("url"))
    stats = url_dedup_stats(urls, "url")
    kept = url_deduplicate(urls, "doc_id", "url")
    kept_row = kept.agg(F.count("*").alias("n"),
                        F.sum("doc_id").alias("s")).collect()[0]
    dom = (urls.groupBy(extract_domain(F.col("url")).alias("d"))
           .count().collect())
    pairs = [("n_urls", stats["n_urls"]),
             ("distinct_raw", stats["distinct_raw"]),
             ("distinct_canonical", stats["distinct_canonical"]),
             ("dup_fraction_fuzz", _fuzz(stats["duplicate_fraction"])),
             ("kept_count", kept_row["n"]),
             ("kept_id_sum", kept_row["s"])]
    pairs += [(f"dom_{r['d']}", r["count"]) for r in dom]
    return _metrics_df(spark, sorted(pairs))


_URL_OPS_ORACLE_SQL = """
    WITH u AS (
      SELECT doc_id, doc_id % 7 AS k, doc_id % 3 AS j, doc_id % 4 AS t
      FROM documents),
    canon AS (
      SELECT doc_id,
             'https://site' || k || '.com/p/' || j ||
             CASE WHEN t < 2 THEN '?a=2&z=1' ELSE '' END AS c,
             k, j, t
      FROM u),
    groups AS (SELECT c, MIN(doc_id) AS winner, COUNT(*) AS n
               FROM canon GROUP BY c),
    tot AS (SELECT COUNT(*) AS n_urls,
                   COUNT(DISTINCT (k, j, t)) AS distinct_raw,
                   COUNT(DISTINCT (k, j, t < 2)) AS distinct_canonical
            FROM u)
    SELECT metric, value FROM (
      SELECT 'n_urls' AS metric, CAST(n_urls AS DOUBLE) AS value FROM tot
      UNION ALL SELECT 'distinct_raw', CAST(distinct_raw AS DOUBLE) FROM tot
      UNION ALL SELECT 'distinct_canonical',
        CAST(distinct_canonical AS DOUBLE) FROM tot
      UNION ALL SELECT 'dup_fraction_fuzz',
        FLOOR((1.0 - CAST(distinct_canonical AS DOUBLE) / n_urls) * 1e6)
        FROM tot
      UNION ALL SELECT 'kept_count',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM groups)
      UNION ALL SELECT 'kept_id_sum',
        (SELECT CAST(SUM(winner) AS DOUBLE) FROM groups)
      UNION ALL SELECT 'dom_site' || k || '.com', CAST(COUNT(*) AS DOUBLE)
      FROM u GROUP BY k) ORDER BY metric
"""


def q_skew_report(spark, sf_dir):
    """Key-skew diagnostics (diagnostics.py key_skew_report): the
    pre-flight answer to "will this groupBy/join key skew kill a task" —
    one reduced-map-side groupBy + one fixed-size aggregate; nothing
    O(keys) reaches the driver. Exact counts/percentiles over lineitem's
    l_suppkey; the top-5 heavy hitters are pinned BY NAME (count desc,
    key asc tie-break is engine-portable)."""
    from deequ_spark.diagnostics import key_skew_report
    li = _load(spark, sf_dir, "lineitem")
    rep = key_skew_report(li, "l_suppkey", top_n=5)
    pairs = [("n_rows", rep["n_rows"]), ("n_keys", rep["n_keys"]),
             ("null_key_rows", rep["null_key_rows"]),
             ("max_count", rep["max_count"]),
             ("avg_count_fuzz", _fuzz(rep["avg_count"])),
             ("skew_ratio_fuzz", _fuzz(rep["skew_ratio"])),
             ("p50_count", rep["p50_count"]),
             ("p90_count", rep["p90_count"]),
             ("p99_count_fuzz", _fuzz(rep["p99_count"])),
             ("top_mass_fuzz", _fuzz(rep["top_mass"]))]
    pairs += [(f"top_{key}", cnt) for key, cnt in rep["top_keys"]]
    return _metrics_df(spark, sorted(pairs))


_SKEW_REPORT_ORACLE_SQL = """
    WITH counts AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_suppkey),
    summary AS (
      SELECT SUM(cnt) AS n_rows, COUNT(*) AS n_keys, MAX(cnt) AS max_count,
             AVG(cnt) AS avg_count,
             quantile_cont(cnt, 0.5) AS p50,
             quantile_cont(cnt, 0.9) AS p90,
             quantile_cont(cnt, 0.99) AS p99
      FROM counts),
    top5 AS (SELECT key, cnt FROM counts
             ORDER BY cnt DESC, key LIMIT 5)
    SELECT metric, value FROM (
      SELECT 'n_rows' AS metric, CAST(n_rows AS DOUBLE) AS value FROM summary
      UNION ALL SELECT 'n_keys', CAST(n_keys AS DOUBLE) FROM summary
      UNION ALL SELECT 'null_key_rows', 0.0
      UNION ALL SELECT 'max_count', CAST(max_count AS DOUBLE) FROM summary
      UNION ALL SELECT 'avg_count_fuzz', FLOOR(avg_count * 1e6) FROM summary
      UNION ALL SELECT 'skew_ratio_fuzz',
        FLOOR(max_count / avg_count * 1e6) FROM summary
      UNION ALL SELECT 'p50_count', p50 FROM summary
      UNION ALL SELECT 'p90_count', p90 FROM summary
      UNION ALL SELECT 'p99_count_fuzz', FLOOR(p99 * 1e6) FROM summary
      UNION ALL SELECT 'top_mass_fuzz',
        FLOOR((SELECT CAST(SUM(cnt) AS DOUBLE) FROM top5)
              / n_rows * 1e6) FROM summary
      UNION ALL SELECT 'top_' || key, CAST(cnt AS DOUBLE) FROM top5
    ) ORDER BY metric
"""


def q_asof_join(spark, sf_dir):
    """As-of join (joins.py asof_join): Spark has no ASOF JOIN, so the
    keyed path encodes it as union + ONE window shuffle (O(1) state per
    row, no per-key materialization, no range self-join) and the keyless
    path broadcasts the right side and binary-searches per Arrow batch
    (map-only over the left). The oracle is DuckDB's NATIVE ASOF JOIN —
    a fully independent implementation. Clicks join the latest same-user
    view (backward), the next same-user view (forward), a 1-hour
    tolerance variant, and the latest signup of ANY user (keyless).
    Lags are summed in whole seconds of truncated-micros arithmetic so
    Spark's micro-precision timestamps and DuckDB's nano-precision ones
    agree exactly."""
    from deequ_spark import asof_join
    from deequ_spark.sources import load_table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts", "value")
    views = ev.where(F.col("event_type") == "view") \
        .select("user_id", "ts", F.col("value").alias("vval"))
    signups = ev.where(F.col("event_type") == "signup") \
        .select("ts", F.col("value").alias("sval"))

    def ntz_micros(c):
        # zone-free epoch micros from wall-clock fields (NTZ-safe: no
        # session zone consulted, exact integers — same everywhere)
        return ((F.unix_date(c.cast("date")).cast("long") * 86400
                 + F.hour(c).cast("long") * 3600
                 + F.minute(c).cast("long") * 60) * 1_000_000
                + F.round(F.date_part(F.lit("SECOND"), c) * 1e6)
                .cast("long"))

    lag_s = F.floor((ntz_micros(F.col("ts"))
                     - ntz_micros(F.col("ts_r"))) / F.lit(1e6))
    cents = lambda c: F.sum(F.round(F.col(c) * 100).cast("long"))  # noqa: E731
    bw = asof_join(clicks, views, on="ts", by="user_id").agg(
        F.count("ts_r").alias("n"),
        cents("vval_r").alias("v"),
        F.sum(lag_s).alias("lag")).collect()[0]
    fw = asof_join(clicks, views, on="ts", by="user_id",
                   direction="forward").agg(
        F.count("ts_r").alias("n"),
        cents("vval_r").alias("v")
    ).collect()[0]
    tol = asof_join(clicks, views, on="ts", by="user_id",
                    tolerance=3600.0).agg(
        F.count("ts_r").alias("n")).collect()[0]
    g = asof_join(clicks, signups, on="ts").agg(
        F.count("ts_r").alias("n"),
        cents("sval_r").alias("v"),
        F.sum(lag_s).alias("lag")).collect()[0]
    pairs = [("bw_matched", bw["n"]),
             ("bw_value_cents", bw["v"]),
             ("bw_lag_s_sum", bw["lag"]),
             ("fw_matched", fw["n"]),
             ("fw_value_cents", fw["v"]),
             ("tol_matched", tol["n"]),
             ("g_matched", g["n"]),
             ("g_value_cents", g["v"]),
             ("g_lag_s_sum", g["lag"])]
    return _metrics_df(spark, sorted(pairs))


_ASOF_JOIN_ORACLE_SQL = """
    WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
                    WHERE event_type = 'click'),
    views AS (SELECT user_id, ts, value AS vval FROM events
              WHERE event_type = 'view'),
    signups AS (SELECT ts, value AS sval FROM events
                WHERE event_type = 'signup'),
    bw AS (SELECT l.value, r.vval, l.ts AS lts, r.ts AS rts
           FROM clicks l ASOF LEFT JOIN views r
           ON l.user_id = r.user_id AND l.ts >= r.ts),
    fw AS (SELECT l.value, r.vval, r.ts AS rts
           FROM clicks l ASOF LEFT JOIN views r
           ON l.user_id = r.user_id AND l.ts <= r.ts),
    g AS (SELECT l.value, r.sval, l.ts AS lts, r.ts AS rts
          FROM clicks l ASOF LEFT JOIN signups r ON l.ts >= r.ts)
    SELECT metric, value FROM (
      SELECT 'bw_matched' AS metric, CAST(COUNT(rts) AS DOUBLE) AS value
      FROM bw
      UNION ALL SELECT 'bw_value_cents',
        CAST(SUM(CAST(round(vval * 100) AS BIGINT)) AS DOUBLE) FROM bw
      UNION ALL SELECT 'bw_lag_s_sum',
        SUM(FLOOR((epoch_ns(lts) // 1000 - epoch_ns(rts) // 1000) / 1e6))
        FROM bw
      UNION ALL SELECT 'fw_matched', CAST(COUNT(rts) AS DOUBLE) FROM fw
      UNION ALL SELECT 'fw_value_cents',
        CAST(SUM(CAST(round(vval * 100) AS BIGINT)) AS DOUBLE) FROM fw
      UNION ALL SELECT 'tol_matched',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM bw
         WHERE rts IS NOT NULL
           AND epoch_ns(lts) // 1000 - epoch_ns(rts) // 1000 <= 3600000000)
      UNION ALL SELECT 'g_matched', CAST(COUNT(rts) AS DOUBLE) FROM g
      UNION ALL SELECT 'g_value_cents',
        CAST(SUM(CAST(round(sval * 100) AS BIGINT)) AS DOUBLE) FROM g
      UNION ALL SELECT 'g_lag_s_sum',
        SUM(FLOOR((epoch_ns(lts) // 1000 - epoch_ns(rts) // 1000) / 1e6))
        FROM g
    ) ORDER BY metric
"""


def q_interval_join(spark, sf_dir):
    """Point-in-interval join (joins.py interval_join): Spark plans a
    naive BETWEEN join as a BroadcastNestedLoopJoin (quadratic); this
    bucketizes the time axis so the match is an EQUI-join on (key, bin)
    + exact range filter — one hash shuffle per side. Clicks are joined
    to 1-hour attribution windows opened by same-user views (keyed) and
    by any signup (keyless). The oracle is DuckDB's plain inequality
    join — an independent (quadratic, but fine at sf0.01) evaluation of
    the same predicate."""
    from deequ_spark import interval_join
    from deequ_spark.sources import load_table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts", "value")
    views = ev.where(F.col("event_type") == "view") \
        .select("user_id", F.col("ts").alias("w_start"),
                (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
                F.col("event_id").alias("view_id"))
    signups = ev.where(F.col("event_type") == "signup") \
        .select(F.col("ts").alias("w_start"),
                (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
                F.col("event_id").alias("signup_id"))

    keyed = interval_join(clicks, views, on="ts", start="w_start",
                          end="w_end", by="user_id")
    k = keyed.agg(
        F.count("*").alias("pairs"),
        F.countDistinct("event_id").alias("pts"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        F.sum("view_id").alias("vid_sum")).collect()[0]
    left_n = interval_join(clicks, views, on="ts", start="w_start",
                           end="w_end", by="user_id", how="left").count()
    g = interval_join(clicks, signups, on="ts", start="w_start",
                      end="w_end").agg(
        F.count("*").alias("pairs"),
        F.countDistinct("event_id").alias("pts")).collect()[0]
    pairs = [("k_pairs", k["pairs"]), ("k_points", k["pts"]),
             ("k_value_cents", k["cents"]), ("k_viewid_sum", k["vid_sum"]),
             ("k_left_rows", left_n),
             ("g_pairs", g["pairs"]), ("g_points", g["pts"])]
    return _metrics_df(spark, sorted(pairs))


_INTERVAL_JOIN_ORACLE_SQL = """
    WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
                    WHERE event_type = 'click'),
    views AS (SELECT user_id, ts AS w_start, ts + INTERVAL 1 HOUR AS w_end,
              event_id AS view_id FROM events WHERE event_type = 'view'),
    signups AS (SELECT ts AS w_start, ts + INTERVAL 1 HOUR AS w_end
                FROM events WHERE event_type = 'signup'),
    keyed AS (SELECT l.event_id, l.value, r.view_id
              FROM clicks l JOIN views r
              ON l.user_id = r.user_id
              AND l.ts >= r.w_start AND l.ts <= r.w_end),
    g AS (SELECT l.event_id FROM clicks l JOIN signups r
          ON l.ts >= r.w_start AND l.ts <= r.w_end)
    SELECT metric, value FROM (
      SELECT 'k_pairs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
      FROM keyed
      UNION ALL SELECT 'k_points',
        CAST(COUNT(DISTINCT event_id) AS DOUBLE) FROM keyed
      UNION ALL SELECT 'k_value_cents',
        CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) FROM keyed
      UNION ALL SELECT 'k_viewid_sum', CAST(SUM(view_id) AS DOUBLE)
      FROM keyed
      UNION ALL SELECT 'k_left_rows',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM keyed)
        + (SELECT CAST(COUNT(*) AS DOUBLE) FROM clicks)
        - (SELECT CAST(COUNT(DISTINCT event_id) AS DOUBLE) FROM keyed)
      UNION ALL SELECT 'g_pairs', CAST(COUNT(*) AS DOUBLE) FROM g
      UNION ALL SELECT 'g_points',
        CAST(COUNT(DISTINCT event_id) AS DOUBLE) FROM g
    ) ORDER BY metric
"""


def q_robust_stats(spark, sf_dir):
    """Robust-statistics analyzers (analyzers/robust.py): exact MAD
    (median(|x − median|), two fused passes) and the Hampel robust
    z-score outlier rule |x−med| > k·1.4826·MAD — immune to the
    outliers themselves inflating the scale, unlike stddev rules. The
    oracle recomputes both medians with quantile_cont and replays the
    rule exactly (counts integer-exact, MAD quantized)."""
    from deequ_spark import (MedianAbsoluteDeviation, RobustOutlierCount,
                             do_analysis_run, mad_outlier_flags)
    li = _load(spark, sf_dir, "lineitem")
    ctx = do_analysis_run(li, [
        MedianAbsoluteDeviation("l_extendedprice"),
        MedianAbsoluteDeviation("l_quantity"),
        MedianAbsoluteDeviation("l_extendedprice",
                                where="l_returnflag = 'R'"),
        RobustOutlierCount("l_extendedprice", k=3.0),
        RobustOutlierCount("l_quantity", k=2.0),
    ])
    vals = {}
    for a, m in ctx.metric_map.items():
        key = f"{type(a).__name__}_{a.instance}_{a.where or 'all'}" \
            .replace(" ", "").replace("=", "").replace("'", "")
        vals[key] = m.value
    n = li.count()
    flagged = mad_outlier_flags(li, "l_extendedprice", k=3.0) \
        .where(F.col("l_extendedprice_outlier")).count()
    pairs = [
        ("mad_price_fuzz",
         _fuzz(vals["MedianAbsoluteDeviation_l_extendedprice_all"])),
        ("mad_qty_fuzz",
         _fuzz(vals["MedianAbsoluteDeviation_l_quantity_all"])),
        ("mad_price_r_fuzz",
         _fuzz(vals["MedianAbsoluteDeviation_l_extendedprice_"
                    "l_returnflagR"])),
        ("outliers_price_k3", round(
            vals["RobustOutlierCount_l_extendedprice_all"] * n)),
        ("outliers_qty_k2", round(
            vals["RobustOutlierCount_l_quantity_all"] * n)),
        ("flagged_rows", flagged),
    ]
    return _metrics_df(spark, sorted(pairs))


_ROBUST_STATS_ORACLE_SQL = """
    WITH meds AS (
      SELECT quantile_cont(l_extendedprice, 0.5) AS mp,
             quantile_cont(l_quantity, 0.5) AS mq
      FROM lineitem),
    mads AS (
      SELECT quantile_cont(abs(l_extendedprice - (SELECT mp FROM meds)), 0.5)
               AS mad_p,
             quantile_cont(abs(l_quantity - (SELECT mq FROM meds)), 0.5)
               AS mad_q
      FROM lineitem),
    rmed AS (SELECT quantile_cont(l_extendedprice, 0.5) AS m
             FROM lineitem WHERE l_returnflag = 'R'),
    rmad AS (SELECT quantile_cont(abs(l_extendedprice
                                      - (SELECT m FROM rmed)), 0.5) AS v
             FROM lineitem WHERE l_returnflag = 'R'),
    outl AS (
      SELECT
        SUM(CASE WHEN abs(l_extendedprice - (SELECT mp FROM meds))
                  > 3.0 * 1.4826 * (SELECT mad_p FROM mads)
            THEN 1 ELSE 0 END) AS o_price,
        SUM(CASE WHEN abs(l_quantity - (SELECT mq FROM meds))
                  > 2.0 * 1.4826 * (SELECT mad_q FROM mads)
            THEN 1 ELSE 0 END) AS o_qty
      FROM lineitem)
    SELECT metric, value FROM (
      SELECT 'mad_price_fuzz' AS metric,
             FLOOR(mad_p * 1e6) AS value FROM mads
      UNION ALL SELECT 'mad_qty_fuzz', FLOOR(mad_q * 1e6) FROM mads
      UNION ALL SELECT 'mad_price_r_fuzz', FLOOR(v * 1e6) FROM rmad
      UNION ALL SELECT 'outliers_price_k3', CAST(o_price AS DOUBLE)
      FROM outl
      UNION ALL SELECT 'outliers_qty_k2', CAST(o_qty AS DOUBLE) FROM outl
      UNION ALL SELECT 'flagged_rows',
        (SELECT CAST(o_price AS DOUBLE) FROM outl)
    ) ORDER BY metric
"""


def q_doc_vectors(spark, sf_dir):
    """Feature-hashed document vectors (llm/vectors.py, Weinberger et al.
    hashing trick): word tokens → portable 31-bit polynomial hash →
    signed bucket counts → L2-normalized array<double>, no UDF, no model.
    The oracle rebuilds every vector in DuckDB with the identical hash
    fold and compares per-bucket corpus sums (quantized) plus norm and
    zero-vector counts."""
    from deequ_spark.llm import hashed_doc_vectors
    docs = _load(spark, sf_dir, "documents")
    DIM = 16
    vecs = hashed_doc_vectors(docs, "doc_id", "text", dim=DIM)
    # per-doc values quantize to an integer grid BEFORE the corpus sum:
    # per-doc arithmetic is bit-identical across engines (integer bucket
    # sums, one sqrt, one division), while a cross-doc float sum is
    # partial-aggregation-order dependent and can land a hair off a
    # floor boundary
    agg = vecs.agg(
        *[F.sum(F.floor(F.col("vector")[i] * 1e6)).alias(f"s{i}")
          for i in range(DIM)],
        F.sum(F.when(F.aggregate(
            "vector", F.lit(0.0), lambda a, x: a + x * x) > 0.999999,
            1).otherwise(0)).alias("unit"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    pairs = [(f"bucket{i:02d}_fuzz", agg[f"s{i}"]) for i in range(DIM)]
    pairs += [("unit_norm_docs", agg["unit"]), ("n_docs", agg["n"])]
    return _metrics_df(spark, sorted(pairs))


_DOC_VECTORS_ORACLE_SQL = """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    hashed AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                                      [CAST(ascii(c) AS BIGINT)
                                       FOR c IN string_split(tok, '')]),
                         (acc, x) -> (acc * 131 + x) % 2147483647) AS h
      FROM toks),
    contrib AS (
      SELECT doc_id, h % 16 AS b,
             CASE WHEN (h // 16) % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
      FROM hashed),
    per_bucket AS (
      SELECT doc_id, b, SUM(s) AS v FROM contrib GROUP BY doc_id, b),
    norms AS (
      SELECT doc_id, sqrt(SUM(v * v)) AS nrm FROM per_bucket
      GROUP BY doc_id),
    normalized AS (
      SELECT p.doc_id, p.b, p.v / n.nrm AS v
      FROM per_bucket p JOIN norms n USING (doc_id) WHERE n.nrm > 0),
    sums AS (
      SELECT b, SUM(FLOOR(v * 1e6)) AS sv FROM normalized GROUP BY b),
    buckets AS (SELECT unnest(range(16)) AS b)
    SELECT metric, value FROM (
      SELECT printf('bucket%02d_fuzz', CAST(bk.b AS INT)) AS metric,
             COALESCE(s.sv, 0.0) AS value
      FROM buckets bk LEFT JOIN sums s ON bk.b = s.b
      UNION ALL SELECT 'unit_norm_docs',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM norms WHERE nrm > 0)
      UNION ALL SELECT 'n_docs',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents)
    ) ORDER BY metric
"""


def q_scale_utils(spark, sf_dir):
    """Scale utilities (diagnostics.py salted_agg + llm/packing.py
    length_bucketize): the two-stage salted aggregation must equal a
    plain GROUP BY exactly (sum/count/min/max/avg are algebraic — the
    salt only changes the plan shape), and quantile length-bucketing at
    relative_error=0 learns Greenwald-Khanna-exact cuts that equal
    DuckDB's quantile_disc, so per-bucket populations are integer-exact
    (assignment is strictly-greater-than the cut on both sides)."""
    from deequ_spark.diagnostics import salted_agg
    from deequ_spark.llm import length_bucketize
    li = _load(spark, sf_dir, "lineitem")
    cents = li.withColumn(
        "price_cents", F.round(F.col("l_extendedprice") * 100).cast("long"))
    agg = salted_agg(cents, "l_returnflag", {
        "n": ("count", "price_cents"), "s": ("sum", "price_cents"),
        "mn": ("min", "price_cents"), "mx": ("max", "price_cents")},
        salt=8).collect()
    pairs = []
    for r in agg:
        f = r["l_returnflag"]
        pairs += [(f"sa_{f}_n", r["n"]), (f"sa_{f}_sum", r["s"]),
                  (f"sa_{f}_min", r["mn"]), (f"sa_{f}_max", r["mx"])]
    docs = _load(spark, sf_dir, "documents")
    buckets = (length_bucketize(docs, "n_chars", n_buckets=4,
                                relative_error=0.0)
               .groupBy("length_bucket").count().collect())
    pairs += [(f"lb_{r['length_bucket']}", r["count"]) for r in buckets]
    # r8: per-file stats manifest + file-level pruning (sources.py
    # write_corpus/read_corpus). Sorted 100-row files make the k-th file
    # hold ranked rows [100k+1, 100k+100], so the PRUNED FILE COUNT for
    # a doc_id range is itself oracle-replayable (count of distinct
    # rank-buckets the range touches) — the engine-checked proof that
    # pruning reads only the files it must.
    import shutil
    import tempfile

    from deequ_spark.sources import read_corpus, write_corpus
    d = tempfile.mkdtemp(prefix="deequ_manifest_")
    try:
        write_corpus(docs.select("doc_id", "n_chars").repartition(1),
                     d, max_records_per_file=100,
                     sort_within_partitions="doc_id",
                     manifest_cols="doc_id")
        man = spark.read.parquet(f"{d}/_manifest").agg(
            F.count(F.lit(1)).alias("files"),
            F.sum("n_rows").alias("rows"),
            F.min("min_doc_id").alias("mn"),
            F.max("max_doc_id").alias("mx")).collect()[0]
        lo = int(man["mn"]) + 37
        hi = lo + 199
        pruned = read_corpus(spark, d, prune={"doc_id": (lo, hi)})
        pr_files = len(pruned.inputFiles())
        pr = pruned.agg(F.count(F.lit(1)).alias("n"),
                        F.sum("doc_id").alias("ids")).collect()[0]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    pairs += [("man_files", man["files"]), ("man_rows", man["rows"]),
              ("man_min", man["mn"]), ("man_max", man["mx"]),
              ("pr_files", pr_files), ("pr_count", pr["n"]),
              ("pr_id_sum", pr["ids"] or 0)]
    return _metrics_df(spark, sorted(pairs))


_SCALE_UTILS_ORACLE_SQL = """
    WITH sa AS (
      SELECT l_returnflag AS f,
             COUNT(*) AS n,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s,
             MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mn,
             MAX(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mx
      FROM lineitem GROUP BY l_returnflag),
    cuts AS (
      SELECT quantile_disc(n_chars, 0.25) AS c1,
             quantile_disc(n_chars, 0.50) AS c2,
             quantile_disc(n_chars, 0.75) AS c3
      FROM documents),
    lb AS (
      SELECT CASE WHEN n_chars > (SELECT c3 FROM cuts) THEN 3
                  WHEN n_chars > (SELECT c2 FROM cuts) THEN 2
                  WHEN n_chars > (SELECT c1 FROM cuts) THEN 1
                  ELSE 0 END AS b
      FROM documents)
    SELECT metric, value FROM (
      SELECT 'sa_' || f || '_n' AS metric, CAST(n AS DOUBLE) AS value
      FROM sa
      UNION ALL SELECT 'sa_' || f || '_sum', CAST(s AS DOUBLE) FROM sa
      UNION ALL SELECT 'sa_' || f || '_min', CAST(mn AS DOUBLE) FROM sa
      UNION ALL SELECT 'sa_' || f || '_max', CAST(mx AS DOUBLE) FROM sa
      UNION ALL SELECT 'lb_' || b, CAST(COUNT(*) AS DOUBLE)
      FROM lb GROUP BY b
      UNION ALL SELECT 'man_files',
        CEIL(COUNT(*) / 100.0) FROM documents
      UNION ALL SELECT 'man_rows', CAST(COUNT(*) AS DOUBLE) FROM documents
      UNION ALL SELECT 'man_min', CAST(MIN(doc_id) AS DOUBLE) FROM documents
      UNION ALL SELECT 'man_max', CAST(MAX(doc_id) AS DOUBLE) FROM documents
      UNION ALL SELECT 'pr_files', CAST(COUNT(DISTINCT (rn - 1) // 100)
        AS DOUBLE)
      FROM (SELECT row_number() OVER (ORDER BY doc_id) AS rn, doc_id
            FROM documents)
      WHERE doc_id BETWEEN (SELECT MIN(doc_id) + 37 FROM documents)
        AND (SELECT MIN(doc_id) + 236 FROM documents)
      UNION ALL SELECT 'pr_count', CAST(COUNT(*) AS DOUBLE) FROM documents
      WHERE doc_id BETWEEN (SELECT MIN(doc_id) + 37 FROM documents)
        AND (SELECT MIN(doc_id) + 236 FROM documents)
      UNION ALL SELECT 'pr_id_sum', CAST(SUM(doc_id) AS DOUBLE)
      FROM documents
      WHERE doc_id BETWEEN (SELECT MIN(doc_id) + 37 FROM documents)
        AND (SELECT MIN(doc_id) + 236 FROM documents)
    ) ORDER BY metric
"""


def q_quality_score(spark, sf_dir):
    """Quality-classifier scoring (llm/classifier.py score_quality): the
    fastText-style linear filter's HOT PATH — hashed vector + dot
    product + sigmoid as pure expressions, no pyspark.ml and no Python
    at inference. Weights here are a fixed Knuth-hash sequence
    w_b = ((b·2654435761) mod 1000)/1000 − 0.5 so the oracle derives
    the identical model; the pre-sigmoid margin z quantizes per doc
    (training itself is validated in pytest, where an ml-trained model
    must separate fluent from gibberish corpora)."""
    from deequ_spark.llm import score_quality
    docs = _load(spark, sf_dir, "documents")
    DIM = 16
    weights = [((b * 2654435761) % 1000) / 1000.0 - 0.5
               for b in range(DIM)]
    model = {"weights": weights, "intercept": 0.125, "dim": DIM}
    scored = score_quality(docs, "doc_id", "text", model)
    agg = (scored.groupBy((F.col("doc_id") % 8).alias("g"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum((F.col("quality_score") > 0.5).cast("long"))
                .alias("above"),
                F.sum(F.floor(F.col("quality_score") * 1e6)).alias("qs"))
           .collect())
    pairs = []
    for r in agg:
        pairs += [(f"g{r['g']}_n", r["n"]), (f"g{r['g']}_above", r["above"]),
                  (f"g{r['g']}_score_sum", r["qs"])]
    return _metrics_df(spark, sorted(pairs))


_QUALITY_SCORE_ORACLE_SQL = """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    hashed AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                                      [CAST(ascii(c) AS BIGINT)
                                       FOR c IN string_split(tok, '')]),
                         (acc, x) -> (acc * 131 + x) % 2147483647) AS h
      FROM toks),
    per_bucket AS (
      SELECT doc_id, h % 16 AS b,
             SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1.0 ELSE -1.0 END) AS v
      FROM hashed GROUP BY doc_id, h % 16),
    norms AS (
      SELECT doc_id, sqrt(SUM(v * v)) AS nrm FROM per_bucket
      GROUP BY doc_id),
    dots AS (
      SELECT p.doc_id,
             SUM((p.v / n.nrm) *
                 (CAST((p.b * 2654435761) % 1000 AS DOUBLE) / 1000.0
                  - 0.5)) AS dot
      FROM per_bucket p JOIN norms n USING (doc_id) WHERE n.nrm > 0
      GROUP BY p.doc_id),
    scores AS (
      SELECT d.doc_id,
             1.0 / (1.0 + exp(-(COALESCE(t.dot, 0.0) + 0.125))) AS s
      FROM documents d LEFT JOIN dots t USING (doc_id)),
    g AS (SELECT doc_id % 8 AS g,
                 COUNT(*) AS n,
                 SUM(CASE WHEN s > 0.5 THEN 1 ELSE 0 END) AS above,
                 SUM(FLOOR(s * 1e6)) AS qs
          FROM scores GROUP BY doc_id % 8)
    SELECT metric, value FROM (
      SELECT 'g' || g || '_n' AS metric, CAST(n AS DOUBLE) AS value FROM g
      UNION ALL SELECT 'g' || g || '_above', CAST(above AS DOUBLE) FROM g
      UNION ALL SELECT 'g' || g || '_score_sum', CAST(qs AS DOUBLE) FROM g
    ) ORDER BY metric
"""


def q_semantic_decon(spark, sf_dir):
    """Semantic benchmark decontamination (llm/similarity.py
    semantic_decontaminate): corpus docs within cosine threshold of ANY
    eval embedding are dropped — the paraphrase-robust complement of
    13-gram lexical decontamination. Benchmark = embeddings with
    vec_id % 50 == 0 (broadcast side); one Arrow matmul per corpus
    batch, map-only. The oracle brute-forces max cosine per vector with
    DuckDB's list_cosine_similarity; metrics are threshold COUNTS and
    id-sums (thresholds sit far from attainable similarities, so
    engine ulp differences cannot flip membership)."""
    from deequ_spark.llm import semantic_decontaminate
    emb = _load(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 50 == 0) \
        .select(F.col("embedding").alias("bvec"))
    rows = []
    for tag, thr in (("t80", 0.80), ("t99", 0.99)):
        clean, contam = semantic_decontaminate(
            emb, "vec_id", "embedding", bench, "bvec", threshold=thr)
        c = contam.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("vec_id").alias("ids")).collect()[0]
        rows += [(f"{tag}_contaminated", c["n"]),
                 (f"{tag}_id_sum", c["ids"] or 0),
                 (f"{tag}_clean", clean.count())]
    return _metrics_df(spark, sorted(rows))


_SEMANTIC_DECON_ORACLE_SQL = """
    WITH bench AS (
      SELECT embedding AS bvec FROM embeddings WHERE vec_id % 50 = 0),
    sims AS (
      SELECT e.vec_id,
             MAX(list_cosine_similarity(e.embedding, b.bvec)) AS s
      FROM embeddings e CROSS JOIN bench b
      GROUP BY e.vec_id)
    SELECT metric, value FROM (
      SELECT 't80_contaminated' AS metric,
             CAST(SUM(CASE WHEN s >= 0.80 THEN 1 ELSE 0 END) AS DOUBLE)
             AS value FROM sims
      UNION ALL SELECT 't80_id_sum',
        CAST(COALESCE(SUM(CASE WHEN s >= 0.80 THEN vec_id END), 0)
             AS DOUBLE) FROM sims
      UNION ALL SELECT 't80_clean',
        CAST(SUM(CASE WHEN s < 0.80 THEN 1 ELSE 0 END) AS DOUBLE)
        FROM sims
      UNION ALL SELECT 't99_contaminated',
        CAST(SUM(CASE WHEN s >= 0.99 THEN 1 ELSE 0 END) AS DOUBLE)
        FROM sims
      UNION ALL SELECT 't99_id_sum',
        CAST(COALESCE(SUM(CASE WHEN s >= 0.99 THEN vec_id END), 0)
             AS DOUBLE) FROM sims
      UNION ALL SELECT 't99_clean',
        CAST(SUM(CASE WHEN s < 0.99 THEN 1 ELSE 0 END) AS DOUBLE)
        FROM sims
    ) ORDER BY metric
"""


def q_char_dedup(spark, sf_dir):
    """Character-shingle near-dup for UNSEGMENTED scripts (llm/dedup.py
    char_shingles + shingles='char'): spaces stripped from every doc —
    whitespace tokenization now sees ONE giant token, the regime where
    word shingles are blind — then exact char-5-gram Jaccard pairs via
    the inverted-index join. The oracle rebuilds the identical shingle
    sets and pair list in DuckDB (substr windows + distinct + posting
    join); per-pair Jaccard quantizes floor(1e6) from identical integer
    intersections/sizes."""
    from deequ_spark.llm import jaccard_similarity_pairs
    docs = _load(spark, sf_dir, "documents")
    nospace = docs.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"\s+", "").alias("text"))
    pairs = jaccard_similarity_pairs(nospace, "doc_id", "text",
                                     threshold=0.4, shingle_n=5,
                                     shingles="char")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id_a") + F.col("id_b")).alias("ids"),
        F.sum(F.floor(F.col("jaccard") * 1e6)).alias("jf")).collect()[0]
    return _metrics_df(spark, sorted([
        ("n_docs", nospace.count()),
        ("n_pairs", agg["n"]),
        ("pair_id_sum", agg["ids"] or 0),
        ("jaccard_fuzz_sum", agg["jf"] or 0)]))


_CHAR_DEDUP_ORACLE_SQL = r"""
    WITH t AS (
      SELECT doc_id, regexp_replace(lower(text), '\s+', '', 'g') AS s
      FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(CASE WHEN length(s) >= 5
        THEN [substr(s, i, 5) for i in range(1, length(s) - 3)]
        ELSE [s] END) AS shingles
      FROM t),
    w AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
      FROM w a JOIN w b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT i, j,
             c * 1.0 / (sa.sz + sb.sz - c) AS jac
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.i
      JOIN sizes sb ON sb.doc_id = inter.j
      WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.4)
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS value
      UNION ALL SELECT 'n_pairs',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM pairs)
      UNION ALL SELECT 'pair_id_sum',
        (SELECT CAST(COALESCE(SUM(i + j), 0) AS DOUBLE) FROM pairs)
      UNION ALL SELECT 'jaccard_fuzz_sum',
        (SELECT CAST(COALESCE(SUM(FLOOR(jac * 1e6)), 0) AS DOUBLE)
         FROM pairs)
    ) ORDER BY metric
"""


def q_bpe_ids(spark, sf_dir):
    """BPE id encode/decode round trip (llm/bpe.py bpe_encode_ids /
    bpe_decode_ids): 40 merges trained on the corpus, every document
    encoded to token ids and decoded back — decoded text must equal the
    lowercased whitespace-normalized original PER ROW (match_count ==
    COUNT(*) in the oracle), with zero <unk> ids (corpus verified
    strictly printable-ASCII, the default base alphabet). Token totals
    cross-check bpe_token_count (the two independent encoders must
    agree on every document's length)."""
    from deequ_spark.llm import (bpe_decode_ids, bpe_encode_ids,
                                 bpe_token_count, train_bpe)
    docs = _load(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", n_merges=40)
    enc = bpe_encode_ids(docs, "text", merges)
    enc = bpe_token_count(enc, "text", merges)
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    agg = enc.select(
        (bpe_decode_ids("token_ids", merges) == norm)
        .cast("long").alias("m"),
        F.size(F.filter(F.col("token_ids"), lambda i: i == 0))
        .alias("unk"),
        (F.size("token_ids") == F.col("bpe_tokens")).cast("long")
        .alias("len_ok")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("m").alias("match"),
        F.sum("unk").alias("unk"), F.sum("len_ok").alias("len_ok")) \
        .collect()[0]
    return _metrics_df(spark, sorted([
        ("n_docs", agg["n"]), ("roundtrip_match", agg["match"]),
        ("unk_ids", agg["unk"]), ("len_agree", agg["len_ok"])]))


_BPE_IDS_ORACLE_SQL = """
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
      FROM documents
      UNION ALL SELECT 'roundtrip_match', CAST(COUNT(*) AS DOUBLE)
      FROM documents
      UNION ALL SELECT 'unk_ids', 0.0
      UNION ALL SELECT 'len_agree', CAST(COUNT(*) AS DOUBLE)
      FROM documents
    ) ORDER BY metric
"""


def q_bpe_merges(spark, sf_dir):
    """BPE merge-loop induction (llm/bpe.py train_bpe): the first 5
    merges AND the pair counts that won them, re-derived merge-by-merge
    in DuckDB via iterated ranked-pair-count CTEs (segmentations carried
    as chr(31)-wrapped symbol strings; replace() of the wrapped pair
    reproduces the trainer's greedy leftmost non-overlapping merge).
    This engine-checks the loop induction itself — the word table,
    adjacent-pair weighting, (count desc, pair lex asc) tie-break, and
    re-segmentation after each merge — where `bpe_train` (60 merges +
    retokenization) stays a rows-only check."""
    from deequ_spark.llm import train_bpe
    docs = _load(spark, sf_dir, "documents")
    traced = train_bpe(docs, "text", n_merges=5, min_pair_count=2,
                       return_counts=True)
    return _metrics_df(spark, sorted(
        (f"m{k}_{a}+{b}", cnt) for k, (a, b, cnt) in enumerate(traced)))


def _bpe_merges_oracle() -> str:
    sep = "chr(31)"
    parts = [f"""
wf AS (
  SELECT word, COUNT(*) AS c FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS word FROM documents)
  GROUP BY word),
seg_0 AS (
  SELECT c, {sep} || array_to_string(
      list_append(string_split(word, ''), '</w>'), {sep} || {sep})
      || {sep} AS s
  FROM wf)"""]
    for k in range(5):
        parts.append(f"""
pairs_{k} AS (
  SELECT p['a'] AS a, p['b'] AS b, SUM(c) AS cnt FROM (
    SELECT c, unnest(list_transform(
        generate_series(1, len(string_split(trim(s, {sep}),
                                            {sep}||{sep})) - 1),
        i -> {{'a': string_split(trim(s, {sep}), {sep}||{sep})[i],
              'b': string_split(trim(s, {sep}), {sep}||{sep})[i+1]}})) AS p
    FROM seg_{k}) GROUP BY 1, 2),
best_{k} AS (SELECT a, b, cnt FROM pairs_{k}
             ORDER BY cnt DESC, a, b LIMIT 1),
seg_{k + 1} AS (
  SELECT w.c, replace(w.s, {sep}||m.a||{sep}||{sep}||m.b||{sep},
                      {sep}||m.a||m.b||{sep}) AS s
  FROM seg_{k} w, best_{k} m)""")
    sel = " UNION ALL ".join(
        f"SELECT 'm{k}_' || a || '+' || b AS metric, "
        f"CAST(cnt AS DOUBLE) AS value FROM best_{k}" for k in range(5))
    return ("WITH " + ",".join(parts)
            + " SELECT metric, value FROM (" + sel + ") ORDER BY metric")


_BPE_MERGES_ORACLE_SQL = _bpe_merges_oracle()


def _bpe_train_oracle(n_merges: int = 60) -> str:
    """Full-length replay of train_bpe + bpe_token_count in DuckDB: the
    bpe_merges iterated ranked-pair CTE technique extended to all
    ``n_merges`` rounds, PLUS the min_pair_count=2 stop rule (a best
    pair below 2 freezes the segmentation via CASE, and its merge row
    is filtered — every later round then recomputes the same sub-2 best,
    so emitted merges exactly equal the trainer's early-stopped list)
    PLUS retokenization: after the last round each word's symbol count
    is its split length, and per-document token totals re-join those
    counts onto the whitespace-split docs (greedy rank-order encoding
    equals the trainer's replace-based segmentation for trained words —
    the standard BPE equivalence, memoized the same way in
    bpe_token_count)."""
    sep = "chr(31)"
    parts = [f"""
wf AS MATERIALIZED (
  SELECT word, COUNT(*) AS c FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS word FROM documents)
  GROUP BY word),
seg_0 AS MATERIALIZED (
  SELECT word, c, {sep} || array_to_string(
      list_append(string_split(word, ''), '</w>'), {sep} || {sep})
      || {sep} AS s
  FROM wf)"""]
    for k in range(n_merges):
        parts.append(f"""
pairs_{k} AS MATERIALIZED (
  SELECT p['a'] AS a, p['b'] AS b, SUM(c) AS cnt FROM (
    SELECT c, unnest(list_transform(
        generate_series(1, len(string_split(trim(s, {sep}),
                                            {sep}||{sep})) - 1),
        i -> {{'a': string_split(trim(s, {sep}), {sep}||{sep})[i],
              'b': string_split(trim(s, {sep}), {sep}||{sep})[i+1]}})) AS p
    FROM seg_{k}) GROUP BY 1, 2),
best_{k} AS MATERIALIZED (SELECT a, b, cnt FROM pairs_{k}
             ORDER BY cnt DESC, a, b LIMIT 1),
seg_{k + 1} AS MATERIALIZED (
  SELECT w.word, w.c,
         CASE WHEN m.a IS NOT NULL AND m.cnt >= 2
              THEN replace(w.s, {sep}||m.a||{sep}||{sep}||m.b||{sep},
                           {sep}||m.a||m.b||{sep})
              ELSE w.s END AS s
  FROM seg_{k} w LEFT JOIN best_{k} m ON TRUE)""")
    merge_rows = " UNION ALL ".join(
        f"SELECT {k} AS k, a, b FROM best_{k} WHERE cnt >= 2"
        for k in range(n_merges))
    parts.append(f"""
merges_all AS MATERIALIZED ({merge_rows}),
symlen AS MATERIALIZED (
  SELECT word,
         len(string_split(trim(s, {sep}), {sep}||{sep})) AS n
  FROM seg_{n_merges}),
docw AS MATERIALIZED (
  SELECT doc_id, unnest(list_filter(
      string_split_regex(lower(text), '\\s+'), x -> x != '')) AS word
  FROM documents),
doctok AS MATERIALIZED (
  SELECT doc_id, SUM(n) AS toks
  FROM docw JOIN symlen USING (word) GROUP BY doc_id)""")
    return ("WITH " + ",".join(parts) + """
    SELECT metric, value FROM (
      SELECT 'm' || lpad(CAST(k AS VARCHAR), 2, '0') || '_' || a || '+'
             || b AS metric, CAST(k AS DOUBLE) AS value FROM merges_all
      UNION ALL SELECT 'n_merges',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM merges_all)
      UNION ALL SELECT 'bpe_tokens_total',
        (SELECT CAST(SUM(toks) AS DOUBLE) FROM doctok)
      UNION ALL SELECT 'bpe_tokens_max',
        (SELECT CAST(MAX(toks) AS DOUBLE) FROM doctok)
    ) ORDER BY metric""")


_BPE_TRAIN_ORACLE_SQL = _bpe_train_oracle()


def q_embedding_quantize(spark, sf_dir):
    """int8 embedding quantization (llm/vectors.py): symmetric
    per-vector scale = max|v|/127, q = round(v/scale). The oracle
    re-derives every INTEGER code in DuckDB (identical IEEE double ops
    on both engines: cast, divide, round-half-away) — code sums,
    absolute mass, full-scale counts — and quantized COSINES for the
    first 40 vectors' pairs (integer dots and norms; per-pair floor
    quantization before summing, per the oracle float rules)."""
    from deequ_spark.llm import cosine_quantized, quantize_embeddings
    emb = _load(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "embedding")
    agg = q.select(
        F.aggregate(F.col("embedding_q8"), F.lit(0).cast("long"),
                    lambda a, x: a + x.cast("long")).alias("qs"),
        F.aggregate(F.col("embedding_q8"), F.lit(0).cast("long"),
                    lambda a, x: a + F.abs(x.cast("long"))).alias("qa"),
        F.size(F.filter(F.col("embedding_q8"),
                        lambda x: F.abs(x.cast("int")) == 127))
        .alias("fs")).agg(
        F.sum("qs").alias("qsum"), F.sum("qa").alias("qabs"),
        F.sum("fs").alias("full"), F.count(F.lit(1)).alias("n")) \
        .collect()[0]
    small = q.where(F.col("vec_id") < 40) \
        .select("vec_id", "embedding_q8")
    a = small.selectExpr("vec_id AS ia", "embedding_q8 AS qa")
    b = small.selectExpr("vec_id AS ib", "embedding_q8 AS qb")
    cos = (a.join(b, F.col("ia") < F.col("ib"))
           .select(F.floor(cosine_quantized("qa", "qb") * 1e6)
                   .alias("cf"))
           .agg(F.sum("cf").alias("s"),
                F.count(F.lit(1)).alias("np")).collect()[0])
    return _metrics_df(spark, sorted([
        ("n_vecs", agg["n"]), ("q_sum", agg["qsum"]),
        ("q_abs_sum", agg["qabs"]), ("full_scale_count", agg["full"]),
        ("n_pairs", cos["np"]), ("cos_fuzz_sum", cos["s"])]))


_EMBEDDING_QUANTIZE_ORACLE_SQL = """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) /
                    (CAST(list_max(list_transform(embedding,
                         y -> abs(CAST(y AS DOUBLE)))) AS DOUBLE)
                     / 127.0)) AS BIGINT)) AS c
      FROM embeddings),
    stats AS (
      SELECT SUM(list_sum(c)) AS qsum,
             SUM(list_sum(list_transform(c, x -> abs(x)))) AS qabs,
             SUM(len(list_filter(c, x -> abs(x) = 127))) AS fullsc,
             COUNT(*) AS n
      FROM q),
    pairs AS (
      SELECT FLOOR(
        CAST(list_sum(list_transform(range(1, len(a.c) + 1),
             i -> a.c[i] * b.c[i])) AS DOUBLE)
        / (sqrt(CAST(list_sum(list_transform(a.c, x -> x * x))
                AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(b.c, x -> x * x))
                  AS DOUBLE))) * 1e6) AS cf
      FROM q a JOIN q b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 40 AND b.vec_id < 40)
    SELECT metric, value FROM (
      SELECT 'n_vecs' AS metric, CAST(n AS DOUBLE) AS value FROM stats
      UNION ALL SELECT 'q_sum', CAST(qsum AS DOUBLE) FROM stats
      UNION ALL SELECT 'q_abs_sum', CAST(qabs AS DOUBLE) FROM stats
      UNION ALL SELECT 'full_scale_count', CAST(fullsc AS DOUBLE)
        FROM stats
      UNION ALL SELECT 'n_pairs',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM pairs)
      UNION ALL SELECT 'cos_fuzz_sum',
        (SELECT CAST(SUM(cf) AS DOUBLE) FROM pairs)
    ) ORDER BY metric
"""


def q_robots_filter(spark, sf_dir):
    """robots.txt compliance filtering (llm/robots.py): one robots body
    (disallow /private/, allow back /private/pub/, disallow /tmp/) is
    parsed JVM-side; per-doc URLs cycle path families by doc_id%4 —
    page (kept), private (disallowed), private/pub (allow wins by RFC
    9309 longest match), tmp (disallowed). Kept/dropped counts and id
    sums are pure doc_id arithmetic in the oracle; n_rules pins the
    section/extract parsing."""
    from deequ_spark.llm import (filter_disallowed, parse_robots,
                                 parse_robots_directives)
    docs = _load(spark, sf_dir, "documents")
    body = ("User-agent: googlebot\nDisallow: /all-of-it/\n"
            "Crawl-delay: 2.5\n\n"
            "User-agent: *\nDisallow: /private/\n"
            "Allow: /private/pub/\nDisallow: /tmp/\nDisallow:\n"
            "Crawl-delay: 10\n\n"
            "Sitemap: http://www.example.com/sitemap.xml\n"
            "Sitemap: http://www.example.com/sitemap-news.xml\n")
    robots = spark.createDataFrame(
        [("http://www.example.com/robots.txt", body)],
        "url string, body string")
    rules = parse_robots(robots, "url", "body")
    seg = (F.when(F.col("doc_id") % 4 == 0, F.lit("page/"))
           .when(F.col("doc_id") % 4 == 1, F.lit("private/"))
           .when(F.col("doc_id") % 4 == 2, F.lit("private/pub/"))
           .otherwise(F.lit("tmp/")))
    # all URLs on the robots host — rules scope per HOST (RFC 9309
    # 2.3), a sibling subdomain's rules never apply (pytest-pinned)
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("http://www.example.com/"), seg, F.col("doc_id"))
        .alias("url"))
    kept = filter_disallowed(urls, rules).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("ids")).collect()[0]
    dropped = filter_disallowed(urls, rules, keep_disallowed=True).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("ids")).collect()[0]
    # r9: non-rule directives — Crawl-delay is agent-group-scoped
    # (googlebot's own 2.5 beats the * group's 10), Sitemap: lines are
    # global per sitemaps.org
    [dstar] = parse_robots_directives(robots, "url", "body").collect()
    [dgbot] = parse_robots_directives(robots, "url", "body",
                                      user_agent="googlebot").collect()
    return _metrics_df(spark, sorted([
        ("n_rules", rules.count()),
        ("kept_count", kept["n"]), ("kept_id_sum", kept["ids"] or 0),
        ("dropped_count", dropped["n"]),
        ("dropped_id_sum", dropped["ids"] or 0),
        ("crawl_delay_star", dstar["crawl_delay"]),
        ("crawl_delay_googlebot", dgbot["crawl_delay"]),
        ("n_sitemaps", len(dstar["sitemaps"]))]))


_ROBOTS_FILTER_ORACLE_SQL = """
    WITH d AS (SELECT doc_id AS i, doc_id % 4 AS f FROM documents)
    SELECT metric, value FROM (
      SELECT 'n_rules' AS metric, 3.0 AS value
      UNION ALL SELECT 'crawl_delay_star', 10.0
      UNION ALL SELECT 'crawl_delay_googlebot', 2.5
      UNION ALL SELECT 'n_sitemaps', 2.0
      UNION ALL SELECT 'kept_count',
        CAST(SUM(CASE WHEN f IN (0, 2) THEN 1 ELSE 0 END) AS DOUBLE)
        FROM d
      UNION ALL SELECT 'kept_id_sum',
        CAST(SUM(CASE WHEN f IN (0, 2) THEN i ELSE 0 END) AS DOUBLE)
        FROM d
      UNION ALL SELECT 'dropped_count',
        CAST(SUM(CASE WHEN f IN (1, 3) THEN 1 ELSE 0 END) AS DOUBLE)
        FROM d
      UNION ALL SELECT 'dropped_id_sum',
        CAST(SUM(CASE WHEN f IN (1, 3) THEN i ELSE 0 END) AS DOUBLE)
        FROM d
    ) ORDER BY metric
"""


def q_c4_filters(spark, sf_dir):
    """C4-style cleanup (llm/text.py c4_line_clean + c4_page_flags,
    Raffel et al. 1910.10683 §2.2): each doc becomes a synthetic page —
    its text + '.' (kept), a short line, a javascript notice, a cookie-
    policy line (all removed), and a proper closing line (kept; docs
    with doc_id%7==0 carry 'lorem ipsum' inside it, doc_id%5==0 add a
    curly-brace code line). Kept/removed line counts, cleaned lengths
    and page-flag failures are replayed from documents arithmetic
    (corpus verified: every doc ≥ 10 words, no newlines)."""
    from deequ_spark.llm import c4_line_clean, c4_page_flags
    docs = _load(spark, sf_dir, "documents")
    closing = F.when(F.col("doc_id") % 7 == 0,
                     F.lit("The final line has lorem ipsum inside it."))\
        .otherwise(F.lit("The final line of this page ends properly."))
    page = F.concat(
        F.col("text"), F.lit(".\n"),
        F.lit("short line here.\n"),
        F.lit("Please enable javascript to continue viewing content.\n"),
        F.lit("This site uses cookies per the privacy policy rules.\n"),
        closing,
        F.when(F.col("doc_id") % 5 == 0, F.lit("\ncode { sample."))
        .otherwise(F.lit("")))
    staged = docs.select("doc_id", page.alias("page"))
    cleaned = c4_line_clean(staged, "page")
    flagged = c4_page_flags(cleaned, "page")
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c4_lines_kept").alias("kept"),
        F.sum("c4_lines_removed").alias("removed"),
        F.sum(F.length("page_c4")).alias("clean_len"),
        F.sum((~F.col("c4_no_lorem_ipsum")).cast("long")).alias("lorem"),
        F.sum((~F.col("c4_no_curly_brace")).cast("long")).alias("brace"),
        F.sum(F.col("c4_keep").cast("long")).alias("keep")).collect()[0]
    return _metrics_df(spark, sorted([
        ("n_docs", agg["n"]), ("kept_sum", agg["kept"]),
        ("removed_sum", agg["removed"]),
        ("clean_len_sum", agg["clean_len"]),
        ("lorem_fail", agg["lorem"]), ("brace_fail", agg["brace"]),
        ("keep_count", agg["keep"])]))


_C4_FILTERS_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id AS i, length(text) AS tl FROM documents)
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM d
      UNION ALL SELECT 'kept_sum', CAST(2 * COUNT(*) AS DOUBLE) FROM d
      UNION ALL SELECT 'removed_sum',
        CAST(SUM(3 + CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        FROM d
      UNION ALL SELECT 'clean_len_sum',
        CAST(SUM(tl + 1 + 1 + CASE WHEN i % 7 = 0
             THEN length('The final line has lorem ipsum inside it.')
             ELSE length('The final line of this page ends properly.')
             END) AS DOUBLE) FROM d
      UNION ALL SELECT 'lorem_fail',
        CAST(SUM(CASE WHEN i % 7 = 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM d
      UNION ALL SELECT 'brace_fail',
        CAST(SUM(CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM d
      UNION ALL SELECT 'keep_count',
        CAST(SUM(CASE WHEN i % 5 <> 0 AND i % 7 <> 0 THEN 1 ELSE 0 END)
             AS DOUBLE) FROM d
    ) ORDER BY metric
"""


def q_webdataset(spark, sf_dir):
    """WebDataset tar shard export/import (llm/shards.py): documents
    shard by doc_id % 8, each sample a {doc_id}.txt entry; shards read
    back through the binaryFile + tar parser. The oracle recomputes the
    EXACT tar byte size per shard from USTAR math (512-byte header +
    size padded to 512 per member, + 1024 end marker, padded to the
    10240 record size) — the writer's framing is engine-checked, not
    just round-tripped — plus sample counts and read-back char sums."""
    import shutil
    import tempfile

    from deequ_spark.llm import read_webdataset, write_webdataset
    docs = _load(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="deequ_wds_")
    try:
        man = write_webdataset(
            docs, d, "doc_id", {"text": "txt"}, n_shards=8,
            shard_expr=F.pmod(F.col("doc_id"), F.lit(8))).collect()
        back = read_webdataset(spark, d, {"text": "txt"})
        ragg = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
            F.sum(F.col("key").cast("long")).alias("keys")).collect()[0]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # size-targeted API (r9): no n_shards/shard_expr — the shard count
    # derives from exact USTAR framing bytes over target_shard_bytes,
    # which the oracle recomputes in SQL (ceil(sum(member)/target)).
    # st_n_shards pins the DERIVED count (deterministic byte math, not
    # len(manifest): xxhash64 assignment could leave a derived shard
    # empty and the manifest row count with it — a probabilistic gate);
    # the manifest is separately asserted <= derived, and sample totals
    # pin the actual write/read round trip.
    from deequ_spark.llm.shards import derive_n_shards
    target = 64 * 1024
    derived = derive_n_shards(docs, ["text"], target)
    d2 = tempfile.mkdtemp(prefix="deequ_wds_st_")
    try:
        man2 = write_webdataset(docs, d2, "doc_id", {"text": "txt"},
                                target_shard_bytes=target).collect()
        back2_n = read_webdataset(spark, d2, {"text": "txt"}).count()
    finally:
        shutil.rmtree(d2, ignore_errors=True)
    assert len(man2) <= derived
    pairs = [("n_shards", len(man)),
             ("samples_total", sum(r["n_samples"] for r in man)),
             ("read_samples", ragg["n"]),
             ("read_chars_sum", ragg["chars"]),
             ("read_key_sum", ragg["keys"]),
             ("st_n_shards", derived),
             ("st_samples_total", sum(r["n_samples"] for r in man2)),
             ("st_read_samples", back2_n)]
    pairs += [(f"shard{r['shard']}_bytes", r["n_bytes"]) for r in man]
    pairs += [(f"shard{r['shard']}_samples", r["n_samples"]) for r in man]
    return _metrics_df(spark, sorted(pairs))


_WEBDATASET_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id % 8 AS shard,
             512 + CEIL(octet_length(encode(text)) / 512.0) * 512
             AS member_bytes,
             length(text) AS chars, doc_id
      FROM documents),
    per AS (
      SELECT shard, COUNT(*) AS n,
             CAST(CEIL((SUM(member_bytes) + 1024) / 10240.0) * 10240
                  AS BIGINT) AS tar_bytes
      FROM d GROUP BY shard),
    st AS (
      -- size-targeted shard count: exact member framing bytes over the
      -- 64 KiB query target (the writer's pre-pass is the same sum)
      SELECT CEIL(SUM(member_bytes) / 65536.0) AS ns, COUNT(*) AS cnt
      FROM d)
    SELECT metric, value FROM (
      SELECT 'n_shards' AS metric,
             CAST(COUNT(*) AS DOUBLE) AS value FROM per
      UNION ALL SELECT 'samples_total',
        CAST(SUM(n) AS DOUBLE) FROM per
      UNION ALL SELECT 'st_n_shards', CAST(ns AS DOUBLE) FROM st
      UNION ALL SELECT 'st_samples_total', CAST(cnt AS DOUBLE) FROM st
      UNION ALL SELECT 'st_read_samples', CAST(cnt AS DOUBLE) FROM st
      UNION ALL SELECT 'read_samples',
        CAST(COUNT(*) AS DOUBLE) FROM d
      UNION ALL SELECT 'read_chars_sum', CAST(SUM(chars) AS DOUBLE) FROM d
      UNION ALL SELECT 'read_key_sum', CAST(SUM(doc_id) AS DOUBLE) FROM d
      UNION ALL SELECT 'shard' || shard || '_bytes',
        CAST(tar_bytes AS DOUBLE) FROM per
      UNION ALL SELECT 'shard' || shard || '_samples',
        CAST(n AS DOUBLE) FROM per
    ) ORDER BY metric
"""


def q_html_extract(spark, sf_dir):
    """HTML -> text extraction (llm/html.py html_to_text): each doc's
    text is wrapped in a full HTML page (head/title/script to drop, h1 +
    p + li blocks, a comment, an &amp; entity), extracted JVM-side, and
    compared PER ROW against the independently constructed expectation
    "T{i}\n{text}\na&b {i}" — match_count must equal COUNT(*) in the
    oracle, with length/line/flat-mode sums recomputed from documents
    arithmetic (corpus text verified free of <>& and whitespace runs)."""
    from deequ_spark.llm import html_to_text
    docs = _load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>skip</title>"
              "<script>var a = \"<p>no</p>\";</script></head>"
              "<body><h1>T"), F.col("doc_id"),
        F.lit("</h1>\n<p>"), F.col("text"),
        F.lit("</p><!-- c --><ul><li>a&amp;b "), F.col("doc_id"),
        F.lit("</li></ul></body></html>"))
    expected = F.concat(F.lit("T"), F.col("doc_id"), F.lit("\n"),
                        F.col("text"), F.lit("\na&b "), F.col("doc_id"))
    # r9 main-content extension: a boilerplate-heavy page per doc —
    # link-saturated nav + short title + body prose + link-saturated
    # footer. html_main_content must keep EXACTLY the body line (nav 22
    # chars < 30 and 16/22 anchored; title short; footer 35 chars but
    # 33/35 anchored) and html_content_score is replayed in SQL from
    # the four lines' exact char counts: nav 22, title 1+digits(i),
    # body len(text), footer 35 — quantized floor(1e6·score) PER ROW.
    from deequ_spark.llm import html_content_score, html_main_content
    bp = F.concat(
        F.lit("<html><head><title>skip</title></head><body>"
              "<div><a href='/'>Home</a> | <a href='/a'>About</a> | "
              "<a href='/c'>Contact</a></div><h1>T"), F.col("doc_id"),
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><div><a href='/p'>Privacy</a> <a href='/t'>Terms</a> "
              "<a href='/i'>(c) 2026 Example Corp</a></div>"
              "</body></html>"))
    mc_expected = F.when(F.length("text") >= 30, F.col("text")) \
        .otherwise(F.lit(""))
    out = docs.select(
        html_to_text(html).alias("t"),
        html_to_text(html, preserve_lines=False).alias("flat"),
        expected.alias("e"),
        html_main_content(bp).alias("mc"),
        html_content_score(bp).alias("mc_score"),
        mc_expected.alias("mce"))
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("t") == F.col("e")).cast("long")).alias("match"),
        F.sum(F.length("t")).alias("len_sum"),
        F.sum(F.size(F.split(F.col("t"), "\n"))).alias("lines"),
        F.sum(F.length("flat")).alias("flat_len"),
        F.sum((F.col("mc") == F.col("mce")).cast("long"))
        .alias("mc_match"),
        F.sum(F.floor(F.col("mc_score") * 1e6)).alias("mc_score_q"),
        F.sum(F.length("mc")).alias("mc_len")).collect()[0]
    return _metrics_df(spark, sorted([
        ("n_docs", agg["n"]), ("match_count", agg["match"]),
        ("len_sum", agg["len_sum"]), ("lines_sum", agg["lines"]),
        ("flat_len_sum", agg["flat_len"]),
        ("mc_match_count", agg["mc_match"]),
        ("mc_score_q_sum", agg["mc_score_q"]),
        ("mc_len_sum", agg["mc_len"])]))


_HTML_EXTRACT_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id AS i,
             length('T' || doc_id || chr(10) || text || chr(10)
                    || 'a&b ' || doc_id) AS elen,
             length(text) AS tlen
      FROM documents),
    mc AS (
      -- boilerplate page line chars: nav 22, title 1+digits, body
      -- len(text), footer 35; kept = body iff >= 30 chars (nav/footer
      -- fall to the 0.30 link-density rule, title to min_chars)
      SELECT i,
             CASE WHEN tlen >= 30 THEN tlen ELSE 0 END AS kept,
             22 + 1 + length(CAST(i AS VARCHAR)) + tlen + 35 AS tot
      FROM d)
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM d
      UNION ALL SELECT 'match_count', CAST(COUNT(*) AS DOUBLE) FROM d
      UNION ALL SELECT 'len_sum', CAST(SUM(elen) AS DOUBLE) FROM d
      UNION ALL SELECT 'lines_sum', CAST(3 * COUNT(*) AS DOUBLE) FROM d
      UNION ALL SELECT 'flat_len_sum', CAST(SUM(elen) AS DOUBLE) FROM d
      UNION ALL SELECT 'mc_match_count', CAST(COUNT(*) AS DOUBLE) FROM mc
      UNION ALL SELECT 'mc_score_q_sum',
        CAST(SUM(FLOOR(1e6 * (CAST(kept AS DOUBLE) / tot))) AS DOUBLE)
        FROM mc
      UNION ALL SELECT 'mc_len_sum', CAST(SUM(kept) AS DOUBLE) FROM mc
    ) ORDER BY metric
"""


def q_link_graph(spark, sf_dir):
    """Host link graph + deterministic integer PageRank
    (llm/graph.py): every doc becomes a page on host h{doc_id%37} with
    two absolute links (to h{(7·id+3)%37} and h{(11·id+5)%37}, both
    quote styles), edges extract via regexp + host-scope + distinct +
    self-drop, and 3 PageRank iterations run in integer micro-units
    (rank DIV out_degree contributions, (85·Σ) DIV 100 update) — the
    oracle replays the SAME integer recurrence in chained DuckDB CTEs,
    so all 37 per-host ranks match EXACTLY, not fuzzily. Also pins
    edge/node counts."""
    from deequ_spark.llm import link_edges, pagerank
    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(F.lit("http://h"), did % 37,
                   F.lit(".example.com/p"), did)
    html = F.concat(
        F.lit("<html><body><p>text</p><a href=\"http://h"),
        (did * 7 + 3) % 37,
        F.lit(".example.com/q\">l1</a> <a href='http://h"),
        (did * 11 + 5) % 37,
        F.lit(".example.com/r'>l2</a></body></html>"))
    pages = docs.select(url.alias("url"), html.alias("html"))
    edges = link_edges(pages, "url", "html").localCheckpoint(eager=True)
    ranks = pagerank(edges, iterations=3)
    pairs = [("n_edges", edges.count()),
             ("n_nodes", ranks.count())]
    pairs += [("pr_" + r["node"].split(".")[0], r["rank_micro"])
              for r in ranks.collect()]
    return _metrics_df(spark, sorted(pairs))


_LINK_GRAPH_ORACLE_SQL = """
    WITH p AS (
      SELECT doc_id % 37 AS s,
             (doc_id * 7 + 3) % 37 AS d1,
             (doc_id * 11 + 5) % 37 AS d2
      FROM documents),
    e AS (
      SELECT DISTINCT s, d FROM (
        SELECT s, d1 AS d FROM p UNION ALL SELECT s, d2 FROM p)
      WHERE s <> d),
    n AS (SELECT DISTINCT x AS node FROM (
        SELECT s AS x FROM e UNION ALL SELECT d FROM e)),
    deg AS (SELECT s, COUNT(*) AS od FROM e GROUP BY s),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
    c1 AS (SELECT e.d AS node, SUM(r0.r // dg.od) AS cs
           FROM e JOIN deg dg ON dg.s = e.s JOIN r0 ON r0.node = e.s
           GROUP BY e.d),
    r1 AS (SELECT n.node, 150000 + (85 * COALESCE(c1.cs, 0)) // 100 AS r
           FROM n LEFT JOIN c1 ON c1.node = n.node),
    c2 AS (SELECT e.d AS node, SUM(r1.r // dg.od) AS cs
           FROM e JOIN deg dg ON dg.s = e.s JOIN r1 ON r1.node = e.s
           GROUP BY e.d),
    r2 AS (SELECT n.node, 150000 + (85 * COALESCE(c2.cs, 0)) // 100 AS r
           FROM n LEFT JOIN c2 ON c2.node = n.node),
    c3 AS (SELECT e.d AS node, SUM(r2.r // dg.od) AS cs
           FROM e JOIN deg dg ON dg.s = e.s JOIN r2 ON r2.node = e.s
           GROUP BY e.d),
    r3 AS (SELECT n.node, 150000 + (85 * COALESCE(c3.cs, 0)) // 100 AS r
           FROM n LEFT JOIN c3 ON c3.node = n.node)
    SELECT metric, value FROM (
      SELECT 'n_edges' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM e
      UNION ALL SELECT 'n_nodes', CAST(COUNT(*) AS DOUBLE) FROM n
      UNION ALL SELECT 'pr_h' || node, CAST(r AS DOUBLE) FROM r3
    ) ORDER BY metric
"""


def q_sitemap_ops(spark, sf_dir):
    """Sitemap parsing + crawl frontier (llm/sitemap.py): every doc
    becomes a sitemap served from host h{doc_id%23} advertising a good
    page (/p{id}, whitespace-padded loc), an entity-escaped query page
    (/q?a=1&amp;b={id} — decode check), a CROSS-HOST spam entry, and
    every 3rd doc a nested sitemap-index reference. Per-host robots
    disallow /q. The oracle replays entry counts by kind, the decoded
    &-loc count, and the frontier (same-host, robots-allowed pages
    only) with its doc-id sum recovered from the /p{id} suffix."""
    from deequ_spark.llm import parse_robots, parse_sitemap, \
        sitemap_frontier
    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = did % 23
    smurl = F.concat(F.lit("https://h"), k,
                     F.lit(".example.com/sitemap"), did, F.lit(".xml"))
    body = F.concat(
        F.lit("<urlset>"),
        F.when(did % 3 == 0, F.concat(
            F.lit("<sitemap><loc>https://h"), k,
            F.lit(".example.com/sm"), did,
            F.lit(".xml</loc></sitemap>"))).otherwise(F.lit("")),
        F.lit("<url><loc> https://h"), k,
        F.lit(".example.com/p"), did, F.lit(" </loc></url>"),
        F.lit("<url><loc>https://h"), k,
        F.lit(".example.com/q?a=1&amp;b="), did, F.lit("</loc></url>"),
        F.lit("<url><loc>https://spam.example.com/x"), did,
        F.lit("</loc></url></urlset>"))
    sitemaps = docs.select(smurl.alias("url"), body.alias("body"))
    entries = parse_sitemap(sitemaps, "url", "body")
    ek = entries.groupBy("kind").agg(F.count(F.lit(1)).alias("n"))
    kind_n = {r["kind"]: r["n"] for r in ek.collect()}
    amp = entries.where(F.col("loc").contains("&")
                        & ~F.col("loc").contains("&amp;")).count()
    robots = (docs.select(k.alias("k")).distinct()
              .select(F.concat(F.lit("http://h"), F.col("k"),
                               F.lit(".example.com/robots.txt"))
                      .alias("url"),
                      F.lit("User-agent: *\nDisallow: /q\n")
                      .alias("body")))
    rules = parse_robots(robots, "url", "body")
    frontier = sitemap_frontier(sitemaps, rules)
    fagg = frontier.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.regexp_extract("url", r"/p(\d+)$", 1).cast("long"))
        .alias("ids")).collect()[0]
    return _metrics_df(spark, sorted([
        ("sm_entries_url", kind_n.get("url", 0)),
        ("sm_entries_sitemap", kind_n.get("sitemap", 0)),
        ("sm_amp_locs", amp),
        ("frontier_rows", fagg["n"]),
        ("frontier_id_sum", fagg["ids"])]))


_SITEMAP_OPS_ORACLE_SQL = """
    WITH d AS (SELECT doc_id AS i FROM documents)
    SELECT metric, value FROM (
      SELECT 'sm_entries_url' AS metric,
             CAST(3 * COUNT(*) AS DOUBLE) AS value FROM d
      UNION ALL SELECT 'sm_entries_sitemap',
        CAST(SUM(CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM d
      UNION ALL SELECT 'sm_amp_locs', CAST(COUNT(*) AS DOUBLE) FROM d
      UNION ALL SELECT 'frontier_rows', CAST(COUNT(*) AS DOUBLE) FROM d
      UNION ALL SELECT 'frontier_id_sum', CAST(SUM(i) AS DOUBLE) FROM d
    ) ORDER BY metric
"""


def q_warc_ingest(spark, sf_dir):
    """WARC/WET crawl ingest (llm/warc.py): documents are serialized
    into 6 synthetic multi-record WARC files (odd files gzip-member
    compressed, the Common Crawl convention) — each doc a `conversion`
    (WET) record, every third doc also an HTTP `response` record, one
    `warcinfo` per file — then read back through the binaryFile +
    mapInPandas record splitter (a map-only plan; the file is the unit
    of parallelism, exactly how CC publishes). Record counts by type,
    payload byte/char sums, parsed HTTP status sums, header round-trips
    (record-id digit sums) and canonical-URL dedup counts are all
    replayed from `documents` arithmetic by the oracle. Fixture BUILD is
    driver-side (test scaffolding); the read path under test is the
    distributed product surface."""
    import shutil
    import tempfile

    from deequ_spark.llm import canonicalize_url, read_warc, wet_documents
    from deequ_spark.llm.warc import (build_warc_file, build_warc_record,
                                      http_responses)

    docs = _load(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "text").orderBy("doc_id").collect()

    files = {}

    def _file(k):
        # lazily created so n_warcinfo == COUNT(DISTINCT doc_id % 6)
        # even when doc_ids miss a residue class (tiny/filtered inputs)
        if k not in files:
            files[k] = [build_warc_record(
                "warcinfo", b"software: deequ-spark\r\n",
                content_type="application/warc-fields")]
        return files[k]

    for r in rows:
        i, text = int(r["doc_id"]), r["text"]
        base = i - i % 2
        uri = (f"http://site{base % 5}.example.com/page/{base}"
               + ("?utm_source=feed" if i % 2 else ""))
        payload = text.encode("utf-8")
        _file(i % 6).append(build_warc_record(
            "conversion", payload, target_uri=uri,
            record_id=f"urn:uuid:rec-{i}", content_type="text/plain"))
        if i % 3 == 0:
            status = 200 if i % 2 == 0 else 404
            http = (f"HTTP/1.1 {status} X\r\n"
                    f"Content-Type: text/html\r\n\r\n").encode() + payload
            _file(i % 6).append(build_warc_record(
                "response", http, target_uri=uri,
                record_id=f"urn:uuid:resp-{i}",
                content_type="application/http; msgtype=response"))

    d = tempfile.mkdtemp(prefix="deequ_warc_")
    try:
        import os
        for k, recs in files.items():
            gz = k % 2 == 1
            name = f"f{k}.warc.gz" if gz else f"f{k}.warc"
            with open(os.path.join(d, name), "wb") as fh:
                fh.write(build_warc_file(recs, gzip_members=gz))

        recs = read_warc(spark, d, min_partitions=6)
        conv = recs.where(F.col("warc_type") == "conversion")
        agg = conv.agg(
            F.count(F.lit(1)).alias("n_conv"),
            F.sum("content_length").alias("conv_bytes"),
            F.sum(F.regexp_extract("record_id", r"rec-(\d+)", 1)
                  .cast("long")).alias("rec_id_sum")).collect()[0]
        n_info = recs.where(F.col("warc_type") == "warcinfo").count()
        resp = http_responses(recs).agg(
            F.count(F.lit(1)).alias("n_resp"),
            F.sum("status").alias("status_sum"),
            F.sum(F.octet_length("body")).alias("body_bytes"))             .collect()[0]
        wet = wet_documents(recs)
        wagg = wet.agg(
            F.sum(F.length("text")).alias("wet_chars"),
            F.countDistinct(canonicalize_url(F.col("url")))
            .alias("canon_distinct")).collect()[0]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return _metrics_df(spark, sorted([
        ("n_warcinfo", n_info), ("n_conversion", agg["n_conv"]),
        ("n_response", resp["n_resp"]),
        ("conv_bytes", agg["conv_bytes"]),
        ("rec_id_sum", agg["rec_id_sum"]),
        ("status_sum", resp["status_sum"]),
        ("body_bytes", resp["body_bytes"]),
        ("wet_chars", wagg["wet_chars"]),
        ("canon_distinct", wagg["canon_distinct"])]))


_WARC_INGEST_ORACLE_SQL = """
    WITH d AS (SELECT doc_id AS i, text FROM documents)
    SELECT metric, value FROM (
      SELECT 'n_warcinfo' AS metric,
             CAST(COUNT(DISTINCT i % 6) AS DOUBLE) AS value FROM d
      UNION ALL SELECT 'n_conversion', CAST(COUNT(*) AS DOUBLE) FROM d
      UNION ALL SELECT 'n_response',
        CAST(SUM(CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM d
      UNION ALL SELECT 'conv_bytes',
        CAST(SUM(octet_length(encode(text))) AS DOUBLE) FROM d
      UNION ALL SELECT 'rec_id_sum', CAST(SUM(i) AS DOUBLE) FROM d
      UNION ALL SELECT 'status_sum',
        CAST(SUM(CASE WHEN i % 3 = 0 THEN
             CASE WHEN i % 2 = 0 THEN 200 ELSE 404 END END) AS DOUBLE)
        FROM d
      UNION ALL SELECT 'body_bytes',
        CAST(SUM(CASE WHEN i % 3 = 0
             THEN octet_length(encode(text)) END) AS DOUBLE) FROM d
      UNION ALL SELECT 'wet_chars', CAST(SUM(length(text)) AS DOUBLE) FROM d
      UNION ALL SELECT 'canon_distinct',
        CAST(COUNT(DISTINCT i - i % 2) AS DOUBLE) FROM d
    ) ORDER BY metric
"""


def q_incremental_dedup(spark, sf_dir):
    """Incremental dedup against a persisted index (llm/incremental.py):
    the production loop — a new batch classifies against the WHOLE
    history via its (fingerprint, minhash-signature) index, no history
    text touched. History = even doc_ids; the new batch is built
    arithmetically in BOTH engines: verbatim copies (exact), copies
    with two appended tokens (near — true Jaccard ≥ ~0.85, far above
    the 0.5 threshold so the ±1/√64 signature estimator cannot flip
    membership), and md5-remapped-vocabulary docs (fresh — Jaccard 0).
    The oracle classifies by normalized-text equality and EXACT shingle
    Jaccard."""
    import shutil
    import tempfile

    from deequ_spark.llm import dedup_against_index, write_dedup_index
    docs = _load(spark, sf_dir, "documents")
    hist = docs.where(F.col("doc_id") % 2 == 0)
    remap = F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda w: F.substring(F.md5(w), 1, 8)), " ")
    new = (docs.where(F.col("doc_id") % 10 == 0)
           .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
           .unionByName(
               docs.where(F.col("doc_id") % 10 == 2)
               .select((F.col("doc_id") + 2000000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(" zzq1 zzq2"))
                       .alias("text")))
           .unionByName(
               docs.where(F.col("doc_id") % 10 == 1)
               .select((F.col("doc_id") + 3000000).alias("doc_id"),
                       remap.alias("text"))))
    path = tempfile.mkdtemp(prefix="deequ_incr_idx_")
    try:
        write_dedup_index(hist, "doc_id", "text", path)
        fresh, dups = dedup_against_index(new, "doc_id", "text", path,
                                          threshold=0.5)
        by_kind = {r["match_kind"]: (r["n"], r["ids"]) for r in
                   dups.groupBy("match_kind")
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.sum("id").alias("ids")).collect()}
        f = fresh.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("doc_id").alias("ids")).collect()[0]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    pairs = [("n_exact", by_kind.get("exact", (0, 0))[0]),
             ("exact_id_sum", by_kind.get("exact", (0, 0))[1] or 0),
             ("n_near", by_kind.get("near", (0, 0))[0]),
             ("near_id_sum", by_kind.get("near", (0, 0))[1] or 0),
             ("n_fresh", f["n"]), ("fresh_id_sum", f["ids"] or 0)]
    return _metrics_df(spark, sorted(pairs))


_INCREMENTAL_DEDUP_ORACLE_SQL = r"""
    WITH hist AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
             AS nt, text
      FROM documents WHERE doc_id % 2 = 0),
    newb AS (
      SELECT doc_id + 1000000 AS id, text FROM documents
      WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2000000, text || ' zzq1 zzq2' FROM documents
      WHERE doc_id % 10 = 2
      UNION ALL
      SELECT doc_id + 3000000,
             array_to_string(list_transform(
               string_split(text, ' '), w -> substr(md5(w), 1, 8)), ' ')
      FROM documents WHERE doc_id % 10 = 1),
    newn AS (SELECT id,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt,
             text FROM newb),
    exacts AS (
      SELECT DISTINCT n.id FROM newn n JOIN hist h ON n.nt = h.nt),
    -- shingles (3-word, distinct) for the near check on non-exact rows
    nw AS (SELECT id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '') AS t
           FROM newb WHERE id NOT IN (SELECT id FROM exacts)),
    nsh AS (SELECT id, unnest(CASE WHEN len(t) >= 3
            THEN list_distinct([array_to_string(t[i:i+2], ' ')
                                FOR i IN generate_series(1, len(t)-2)])
            ELSE [array_to_string(t, ' ')] END) AS s FROM nw),
    hw AS (SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '') AS t FROM hist),
    hsh AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
            THEN list_distinct([array_to_string(t[i:i+2], ' ')
                                FOR i IN generate_series(1, len(t)-2)])
            ELSE [array_to_string(t, ' ')] END) AS s FROM hw),
    nsz AS (SELECT id, COUNT(*) AS sz FROM nsh GROUP BY id),
    hsz AS (SELECT doc_id, COUNT(*) AS sz FROM hsh GROUP BY doc_id),
    inter AS (SELECT n.id, h.doc_id, COUNT(*) AS c
              FROM nsh n JOIN hsh h ON n.s = h.s GROUP BY 1, 2),
    nears AS (
      SELECT DISTINCT i.id
      FROM inter i JOIN nsz ON nsz.id = i.id
                   JOIN hsz ON hsz.doc_id = i.doc_id
      WHERE i.c * 1.0 / (nsz.sz + hsz.sz - i.c) >= 0.5),
    cls AS (
      SELECT id,
             CASE WHEN id IN (SELECT id FROM exacts) THEN 'exact'
                  WHEN id IN (SELECT id FROM nears) THEN 'near'
                  ELSE 'fresh' END AS k
      FROM newb)
    SELECT metric, value FROM (
      SELECT 'n_exact' AS metric,
             CAST(SUM(CASE WHEN k = 'exact' THEN 1 ELSE 0 END) AS DOUBLE)
             AS value FROM cls
      UNION ALL SELECT 'exact_id_sum',
        CAST(COALESCE(SUM(CASE WHEN k = 'exact' THEN id END), 0)
             AS DOUBLE) FROM cls
      UNION ALL SELECT 'n_near',
        CAST(SUM(CASE WHEN k = 'near' THEN 1 ELSE 0 END) AS DOUBLE)
        FROM cls
      UNION ALL SELECT 'near_id_sum',
        CAST(COALESCE(SUM(CASE WHEN k = 'near' THEN id END), 0)
             AS DOUBLE) FROM cls
      UNION ALL SELECT 'n_fresh',
        CAST(SUM(CASE WHEN k = 'fresh' THEN 1 ELSE 0 END) AS DOUBLE)
        FROM cls
      UNION ALL SELECT 'fresh_id_sum',
        CAST(COALESCE(SUM(CASE WHEN k = 'fresh' THEN id END), 0)
             AS DOUBLE) FROM cls
    ) ORDER BY metric
"""


def q_rolling_stats(spark, sf_dir):
    """Trailing-window rolling statistics (joins.py rolling_stats): per
    event, aggregates over the same user's events in the prior hour —
    ONE range-frame window (one shuffle, O(1) frame state), never the
    quadratic range self-join. Values ride as integer cents so window
    sums/counts/mins/maxes are exact; the oracle is DuckDB's native
    RANGE BETWEEN INTERVAL frame."""
    from deequ_spark.joins import rolling_stats
    from deequ_spark.sources import load_table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "user_id", "ts",
                  F.round(F.col("value") * 100).cast("long")
                  .alias("cents")))
    rolled = rolling_stats(ev, "ts", "cents", window_seconds=3600.0,
                           by="user_id",
                           stats=("sum", "count", "min", "max"))
    agg = (rolled.groupBy((F.col("user_id") % 4).alias("g"))
           .agg(F.sum("cents_roll_count").alias("cnt"),
                F.sum("cents_roll_sum").alias("s"),
                F.max("cents_roll_max").alias("mx"),
                F.min("cents_roll_min").alias("mn"),
                F.sum("cents_roll_min").alias("smn")).collect())
    pairs = []
    for r in agg:
        pairs += [(f"g{r['g']}_windows", r["cnt"]),
                  (f"g{r['g']}_sum", r["s"]),
                  (f"g{r['g']}_max", r["mx"]),
                  (f"g{r['g']}_min", r["mn"]),
                  (f"g{r['g']}_minsum", r["smn"])]
    return _metrics_df(spark, sorted(pairs))


_ROLLING_STATS_ORACLE_SQL = """
    WITH ev AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    rolled AS (
      SELECT user_id,
        SUM(cents) OVER w AS rs,
        COUNT(cents) OVER w AS rc,
        MIN(cents) OVER w AS rmn,
        MAX(cents) OVER w AS rmx
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                   AND CURRENT ROW)),
    g AS (SELECT user_id % 4 AS g,
                 SUM(rc) AS cnt, SUM(rs) AS s, MAX(rmx) AS mx,
                 MIN(rmn) AS mn, SUM(rmn) AS smn
          FROM rolled GROUP BY user_id % 4)
    SELECT metric, value FROM (
      SELECT 'g' || g || '_windows' AS metric, CAST(cnt AS DOUBLE) AS value
      FROM g
      UNION ALL SELECT 'g' || g || '_sum', CAST(s AS DOUBLE) FROM g
      UNION ALL SELECT 'g' || g || '_max', CAST(mx AS DOUBLE) FROM g
      UNION ALL SELECT 'g' || g || '_min', CAST(mn AS DOUBLE) FROM g
      UNION ALL SELECT 'g' || g || '_minsum', CAST(smn AS DOUBLE) FROM g
    ) ORDER BY metric
"""


def q_table_diff(spark, sf_dir):
    """Snapshot diff (comparison.py table_diff): added/removed/changed/
    unchanged + per-column change counts from ONE full-outer join whose
    changed test is a single xxhash64 per side (wide tables pay one hash,
    not C comparisons). The 'new' snapshot mutates orders
    deterministically: %7==0 rows change o_totalprice, %7==1 change
    o_orderstatus, %11==0 rows are dropped (removed), and 100 synthetic
    rows are appended (added) — the oracle replays the same mutations
    and counts with plain SQL."""
    from deequ_spark import table_diff
    orders = _load(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice")
    k = F.col("o_orderkey")
    new = (old.where(k % 11 != 0)
           .withColumn("o_totalprice",
                       F.when(k % 7 == 0, F.col("o_totalprice") + 1.0)
                       .otherwise(F.col("o_totalprice")))
           .withColumn("o_orderstatus",
                       F.when(k % 7 == 1, F.lit("Z"))
                       .otherwise(F.col("o_orderstatus"))))
    added = spark.range(100).select(
        (F.col("id") + 900_000_000).alias("o_orderkey"),
        F.lit(1).cast("long").alias("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"))
    new = new.unionByName(added)
    d = table_diff(old, new, "o_orderkey")
    pairs = [("added", d["added"]), ("removed", d["removed"]),
             ("changed", d["changed"]), ("unchanged", d["unchanged"])]
    pairs += [(f"col_{c}", n) for c, n in d["changed_by_column"].items()]
    return _metrics_df(spark, sorted(pairs))


_TABLE_DIFF_ORACLE_SQL = """
    WITH old AS (SELECT o_orderkey AS k, o_custkey, o_orderstatus,
                        o_totalprice FROM orders),
    survivors AS (SELECT * FROM old WHERE k % 11 <> 0),
    changed AS (
      SELECT k,
             CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END AS price_chg,
             CASE WHEN k % 7 = 1 AND o_orderstatus <> 'Z' THEN 1
                  ELSE 0 END AS status_chg
      FROM survivors)
    SELECT metric, value FROM (
      SELECT 'added' AS metric, 100.0 AS value
      UNION ALL SELECT 'removed',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM old WHERE k % 11 = 0)
      UNION ALL SELECT 'changed',
        (SELECT CAST(SUM(CASE WHEN price_chg = 1 OR status_chg = 1
                         THEN 1 ELSE 0 END) AS DOUBLE) FROM changed)
      UNION ALL SELECT 'unchanged',
        (SELECT CAST(SUM(CASE WHEN price_chg = 0 AND status_chg = 0
                         THEN 1 ELSE 0 END) AS DOUBLE) FROM changed)
      UNION ALL SELECT 'col_o_custkey', 0.0
      UNION ALL SELECT 'col_o_orderstatus',
        (SELECT CAST(SUM(status_chg) AS DOUBLE) FROM changed)
      UNION ALL SELECT 'col_o_totalprice',
        (SELECT CAST(SUM(price_chg) AS DOUBLE) FROM changed)
    ) ORDER BY metric
"""


def q_missingness(spark, sf_dir):
    """Co-missingness patterns (diagnostics.py missingness_patterns):
    counts of which columns are NULL TOGETHER — per-column Completeness
    can't see that one failed upstream join nulls a column GROUP. The sf
    tables are null-free, so nulls are injected by key arithmetic
    (o_orderkey%3 nulls the status, %5 nulls the price) identically in
    the oracle; the four pattern counts are pure modular counting."""
    from deequ_spark.diagnostics import missingness_patterns
    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    df = orders.select(
        F.when(k % 3 != 0, F.col("o_orderstatus")).alias("s"),
        F.when(k % 5 != 0, F.col("o_totalprice")).alias("p"))
    pats = missingness_patterns(df).collect()
    pairs = [(f"pat_{r['null_pattern'] or 'none'}", r["rows"])
             for r in pats]
    return _metrics_df(spark, sorted(pairs))


_MISSINGNESS_ORACLE_SQL = """
    WITH f AS (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS ns,
             CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END AS np
      FROM orders)
    SELECT metric, value FROM (
      SELECT 'pat_none' AS metric,
             CAST(SUM(CASE WHEN ns = 0 AND np = 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) AS value FROM f
      UNION ALL SELECT 'pat_s',
        CAST(SUM(CASE WHEN ns = 1 AND np = 0 THEN 1 ELSE 0 END)
             AS DOUBLE) FROM f
      UNION ALL SELECT 'pat_p',
        CAST(SUM(CASE WHEN ns = 0 AND np = 1 THEN 1 ELSE 0 END)
             AS DOUBLE) FROM f
      UNION ALL SELECT 'pat_s,p',
        CAST(SUM(CASE WHEN ns = 1 AND np = 1 THEN 1 ELSE 0 END)
             AS DOUBLE) FROM f
    ) ORDER BY metric
"""


def q_join_cardinality(spark, sf_dir):
    """Pre-flight join sizing (diagnostics.py join_cardinality):
    |A ⋈ B| computed from per-key COUNT TABLES — two reduced groupBys +
    one count-table join, never the join itself. Oracle recomputes
    Σ cA(k)·cB(k) and the top contributing keys in SQL."""
    from deequ_spark.diagnostics import join_cardinality
    orders = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    est = join_cardinality(orders, "o_orderkey", li, "l_orderkey",
                           top_n=3)
    pairs = [("rows", est["rows"]),
             ("matching_keys", est["matching_keys"])]
    pairs += [(f"top_{k}", c) for k, c in est["top_keys"]]
    return _metrics_df(spark, sorted(pairs))


_JOIN_CARDINALITY_ORACLE_SQL = """
    WITH lc AS (SELECT o_orderkey AS k, COUNT(*) AS cl FROM orders
                GROUP BY o_orderkey),
    rc AS (SELECT l_orderkey AS k, COUNT(*) AS cr FROM lineitem
           GROUP BY l_orderkey),
    prod AS (SELECT lc.k, cl * cr AS contrib FROM lc JOIN rc USING (k)),
    top3 AS (SELECT CAST(k AS VARCHAR) AS k, contrib FROM prod
             ORDER BY contrib DESC, CAST(k AS VARCHAR) LIMIT 3)
    SELECT metric, value FROM (
      SELECT 'rows' AS metric,
             (SELECT CAST(SUM(contrib) AS DOUBLE) FROM prod) AS value
      UNION ALL SELECT 'matching_keys',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM prod)
      UNION ALL SELECT 'top_' || k, CAST(contrib AS DOUBLE) FROM top3
    ) ORDER BY metric
"""


def q_functional_dependency(spark, sf_dir):
    """Functional-dependency checking (diagnostics.py fd_violations +
    Check.has_functional_dependency): does A determine B — one
    groupBy(A) countDistinct(B), bounded output. orders o_orderkey →
    o_custkey holds (unique keys, compliance 1.0); lineitem l_orderkey
    → l_returnflag is heavily violated (multi-line orders mix flags). Counts exact, compliance quantized."""
    from deequ_spark.diagnostics import fd_violations
    orders = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    ok = fd_violations(orders, "o_orderkey", "o_custkey")
    bad = fd_violations(li, "l_orderkey", "l_returnflag")
    pairs = [("ok_violating_keys", ok["violating_keys"]),
             ("ok_compliance_fuzz", _fuzz(ok["compliance"])),
             ("bad_keys", bad["keys"]),
             ("bad_violating_keys", bad["violating_keys"]),
             ("bad_violating_rows", bad["violating_rows"]),
             ("bad_compliance_fuzz", _fuzz(bad["compliance"]))]
    return _metrics_df(spark, sorted(pairs))


_FD_ORACLE_SQL = """
    WITH ok AS (
      SELECT o_orderkey, COUNT(DISTINCT COALESCE(CAST(o_custkey AS
             VARCHAR), '?')) AS d, COUNT(*) AS n
      FROM orders GROUP BY o_orderkey),
    bad AS (
      SELECT l_orderkey, COUNT(DISTINCT COALESCE(l_returnflag, '?')) AS d,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_orderkey)
    SELECT metric, value FROM (
      SELECT 'ok_violating_keys' AS metric,
             (SELECT CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) FROM ok) AS value
      UNION ALL SELECT 'ok_compliance_fuzz',
        -- (rows - bad) / rows in THIS order: one division of exact
        -- integers, matching fd_violations' (rows-bad_rows)/rows --
        -- 1.0 - bad/rows rounds twice and diverges 1 ulp at sf0.1
        (SELECT FLOOR((SUM(n) - SUM(CASE WHEN d > 1 THEN n ELSE 0 END))
                       * 1.0 / SUM(n) * 1e6) FROM ok)
      UNION ALL SELECT 'bad_keys',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM bad)
      UNION ALL SELECT 'bad_violating_keys',
        (SELECT CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         FROM bad)
      UNION ALL SELECT 'bad_violating_rows',
        (SELECT CAST(SUM(CASE WHEN d > 1 THEN n ELSE 0 END) AS DOUBLE)
         FROM bad)
      UNION ALL SELECT 'bad_compliance_fuzz',
        (SELECT FLOOR((SUM(n) - SUM(CASE WHEN d > 1 THEN n ELSE 0 END))
                       * 1.0 / SUM(n) * 1e6) FROM bad)
    ) ORDER BY metric
"""


def q_benford(spark, sf_dir):
    """Benford first-digit analysis (diagnostics.py benford_deviation):
    the fabricated-data screen — observed first-significant-digit
    proportions vs log10(1+1/d), chi-square and Nigrini MAD. One
    aggregation over floor(x/10^floor(log10 x)); digit counts exact in
    both engines, statistics quantized."""
    from deequ_spark.diagnostics import benford_deviation
    li = _load(spark, sf_dir, "lineitem")
    rep = benford_deviation(li, "l_extendedprice")
    pairs = [("n", rep["n"]),
             ("chi2_fuzz", _fuzz(rep["chi_square"])),
             ("mad_fuzz", _fuzz(rep["mad"]))]
    pairs += [(f"d{d}_fuzz", _fuzz(p)) for d, p in rep["observed"].items()]
    return _metrics_df(spark, sorted(pairs))


_BENFORD_ORACLE_SQL = """
    WITH pos AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
                 FROM lineitem WHERE l_extendedprice > 0),
    digits AS (SELECT CAST(FLOOR(x / POW(10.0, FLOOR(LOG10(x)))) AS INT)
               AS d FROM pos),
    counts AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    allx AS (SELECT unnest(range(1, 10)) AS d),
    filled AS (SELECT allx.d, COALESCE(counts.n, 0) AS n
               FROM allx LEFT JOIN counts ON allx.d = counts.d),
    tot AS (SELECT SUM(n) AS t FROM filled),
    stats AS (
      SELECT SUM(POW(n - LOG10(1 + 1.0/d) * (SELECT t FROM tot), 2)
                 / (LOG10(1 + 1.0/d) * (SELECT t FROM tot))) AS chi2,
             SUM(ABS(n * 1.0 / (SELECT t FROM tot)
                     - LOG10(1 + 1.0/d))) / 9 AS mad
      FROM filled)
    SELECT metric, value FROM (
      SELECT 'n' AS metric, (SELECT CAST(t AS DOUBLE) FROM tot) AS value
      UNION ALL SELECT 'chi2_fuzz', (SELECT FLOOR(chi2 * 1e6) FROM stats)
      UNION ALL SELECT 'mad_fuzz', (SELECT FLOOR(mad * 1e6) FROM stats)
      UNION ALL SELECT 'd' || d || '_fuzz',
        FLOOR(n * 1.0 / (SELECT t FROM tot) * 1e6)
      FROM filled WHERE n > 0
    ) ORDER BY metric
"""


def q_sliced_analysis(spark, sf_dir):
    """Sliced analysis (slicing.py sliced_metrics): the engine's fused-
    scan trick under groupBy — N scan-shareable analyzers × G data
    slices in ONE aggregation job (asserted in tests). Size/Mean/Min/
    Max/Sum of lineitem per l_returnflag slice; the oracle is the plain
    GROUP BY those analyzers compile to."""
    from deequ_spark import (Maximum, Mean, Minimum, Size, Sum,
                             sliced_metrics)
    li = _load(spark, sf_dir, "lineitem")
    out = sliced_metrics(li, "l_returnflag",
                         [Size(), Mean("l_quantity"),
                          Minimum("l_extendedprice"),
                          Maximum("l_extendedprice"),
                          Sum("l_quantity")])
    pairs = []
    for key, mm in out.items():
        f = key[0]
        for a, m in mm.items():
            if not m.is_success:
                continue
            name = type(a).__name__.lower()
            v = m.value
            pairs.append((f"{f}_{name}_fuzz", _fuzz(v))
                         if name == "mean" else (f"{f}_{name}", v))
    # r8: frequency-based analyzers per slice (sliced_grouped_metrics,
    # the reference grouping fusion slice-fused into TWO jobs):
    # Uniqueness / Distinctness / CountDistinct / Entropy of l_partkey
    # per l_returnflag
    from deequ_spark import (CountDistinct, Distinctness, Entropy,
                             Uniqueness, sliced_grouped_metrics)
    gout = sliced_grouped_metrics(
        li, "l_returnflag",
        [Uniqueness(("l_partkey",)), Distinctness(("l_partkey",)),
         CountDistinct(("l_partkey",)), Entropy("l_partkey")])
    for key, mm in gout.items():
        f = key[0]
        for a, m in mm.items():
            if not m.is_success:
                continue
            name = type(a).__name__.lower()
            pairs.append((f"{f}_{name}" if name == "countdistinct"
                          else f"{f}_{name}_fuzz",
                          m.value if name == "countdistinct"
                          else _fuzz(m.value)))
    return _metrics_df(spark, sorted(pairs))


_SLICED_ANALYSIS_ORACLE_SQL = """
    WITH g AS (
      SELECT l_returnflag AS f, COUNT(*) AS sz,
             AVG(l_quantity) AS mean_q,
             MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
             SUM(l_quantity) AS sq
      FROM lineitem GROUP BY l_returnflag),
    freq AS (
      SELECT l_returnflag AS f, l_partkey, COUNT(*) AS c
      FROM lineitem WHERE l_partkey IS NOT NULL
      GROUP BY l_returnflag, l_partkey),
    grp AS (
      SELECT f, SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS uniq,
             COUNT(*) AS dist, SUM(c) AS n,
             SUM(c * ln(c)) AS slogs, MAX(c) AS mxc
      FROM freq GROUP BY f)
    SELECT metric, value FROM (
      SELECT f || '_size' AS metric, CAST(sz AS DOUBLE) AS value FROM g
      UNION ALL SELECT f || '_mean_fuzz', FLOOR(mean_q * 1e6) FROM g
      UNION ALL SELECT f || '_minimum', mn FROM g
      UNION ALL SELECT f || '_maximum', mx FROM g
      UNION ALL SELECT f || '_sum', CAST(sq AS DOUBLE) FROM g
      UNION ALL SELECT f || '_uniqueness_fuzz',
        FLOOR(CAST(uniq AS DOUBLE) / n * 1e6) FROM grp
      UNION ALL SELECT f || '_distinctness_fuzz',
        FLOOR(CAST(dist AS DOUBLE) / n * 1e6) FROM grp
      UNION ALL SELECT f || '_countdistinct', CAST(dist AS DOUBLE) FROM grp
      UNION ALL SELECT f || '_entropy_fuzz',
        FLOOR(CASE WHEN mxc = n THEN 0.0
                   ELSE ln(n) - slogs / n END * 1e6) FROM grp
    ) ORDER BY metric
"""


def q_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty (llm/text.py ngram_novelty): the
    fraction of a doc's distinct word trigrams appearing in NO other
    document — cross-document template mass that per-doc repetition
    metrics can't see. One explode + one gram-df groupBy + join back;
    novel/total gram counts are integer-exact per doc_id%10 bucket."""
    from deequ_spark.llm import ngram_novelty
    docs = _load(spark, sf_dir, "documents")
    out = ngram_novelty(docs, "doc_id", "text", n=3)
    agg = (out.groupBy((F.col("doc_id") % 10).alias("g"))
           .agg(F.sum("novel_grams").alias("nv"),
                F.sum("total_grams").alias("tt"),
                F.count(F.lit(1)).alias("n")).collect())
    pairs = []
    for r in agg:
        pairs += [(f"g{r['g']}_novel", r["nv"]), (f"g{r['g']}_total",
                                                  r["tt"]),
                  (f"g{r['g']}_docs", r["n"])]
    return _metrics_df(spark, sorted(pairs))


_NGRAM_NOVELTY_ORACLE_SQL = r"""
    WITH toks AS (SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\s+'),
                        x -> x <> '') AS t
        FROM documents),
    sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
            THEN list_distinct([array_to_string(t[i:i+2], ' ')
                                FOR i IN generate_series(1, len(t)-2)])
            ELSE [array_to_string(t, ' ')] END AS s FROM toks),
    w AS (SELECT doc_id, unnest(s) AS g FROM sh
          WHERE len(s) > 0),
    wne AS (SELECT doc_id, g FROM w WHERE trim(g) <> ''),
    gdf AS (SELECT g, COUNT(*) AS df FROM wne GROUP BY g),
    per_doc AS (
      SELECT wne.doc_id, COUNT(*) AS total,
             SUM(CASE WHEN gdf.df = 1 THEN 1 ELSE 0 END) AS novel
      FROM wne JOIN gdf USING (g) GROUP BY wne.doc_id),
    filled AS (
      SELECT d.doc_id % 10 AS grp, COALESCE(p.novel, 0) AS novel,
             COALESCE(p.total, 0) AS total
      FROM documents d LEFT JOIN per_doc p USING (doc_id))
    SELECT metric, value FROM (
      SELECT 'g' || grp || '_novel' AS metric,
             CAST(SUM(novel) AS DOUBLE) AS value FROM filled GROUP BY grp
      UNION ALL SELECT 'g' || grp || '_total', CAST(SUM(total) AS DOUBLE)
      FROM filled GROUP BY grp
      UNION ALL SELECT 'g' || grp || '_docs', CAST(COUNT(*) AS DOUBLE)
      FROM filled GROUP BY grp
    ) ORDER BY metric
"""


def q_image_phash(spark, sf_dir):
    """Perceptual image hashing (llm/phash.py): aHash over the REAL BMP
    decode path + pigeonhole Hamming pair join. 35 images are built as
    16×16 vertical black/white splits at threshold t=(i%7+1)·2, so the
    aHash has the CLOSED FORM (2^(8−t/2)−1)·0x0101010101010101 — the
    oracle derives every hash and the same-hash pair count
    arithmetically, no decoding needed."""
    import numpy as np

    from deequ_spark.llm import image_near_duplicates, image_hashes
    from deequ_spark.llm.multimodal import encode_bmp
    rows = []
    for i in range(35):
        t = (i % 7 + 1) * 2
        px = np.full((16, 16, 3), 255, dtype=np.uint8)
        px[:, :t, :] = 0
        rows.append((i, bytearray(encode_bmp(px))))
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    hashes = image_hashes(df, "img_id", "payload")
    by_hash = hashes.groupBy("fp").count().collect()
    pairs = image_near_duplicates(df, "img_id", "payload",
                                  max_hamming=5)
    p = pairs.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("id_a") + F.col("id_b")).alias("ids"),
                  F.max("hamming").alias("mh")).collect()[0]
    out = [(f"h_{r['fp']}", r["count"]) for r in by_hash]
    out += [("pairs", p["n"]), ("pair_id_sum", p["ids"]),
            ("max_hamming", p["mh"])]
    return _metrics_df(spark, sorted(out))


_IMAGE_PHASH_ORACLE_SQL = """
    WITH imgs AS (
      SELECT i, (i % 7 + 1) * 2 AS t,
             ((CAST(1 AS BIGINT) << (8 - (i % 7 + 1))) - 1)
             * CAST(72340172838076673 AS BIGINT) AS fp
      FROM (SELECT unnest(range(35)) AS i)),
    pairs AS (
      SELECT a.i AS ia, b.i AS ib FROM imgs a JOIN imgs b
      ON a.fp = b.fp AND a.i < b.i)
    SELECT metric, value FROM (
      SELECT 'h_' || CAST(CAST(fp AS BIGINT) AS VARCHAR) AS metric,
             CAST(COUNT(*) AS DOUBLE) AS value FROM imgs GROUP BY fp
      UNION ALL SELECT 'pairs',
        (SELECT CAST(COUNT(*) AS DOUBLE) FROM pairs)
      UNION ALL SELECT 'pair_id_sum',
        (SELECT CAST(SUM(ia + ib) AS DOUBLE) FROM pairs)
      UNION ALL SELECT 'max_hamming', 0.0
    ) ORDER BY metric
"""


def q_audio_phash(spark, sf_dir):
    """Audio fingerprinting (llm/phash.py): band-energy signature over
    the real PCM WAV decode path + the shared Hamming pair join. 24
    synthetic tones in 4 frequency groups (30/100/500/2000 Hz — each in
    a different log band) at 6 volumes each: volume invariance puts all
    same-group pairs within distance 3, cross-group patterns differ in
    whole bands — so the pair STRUCTURE is closed-form (C(6,2)·4 = 60
    pairs, same-group only) and the oracle derives it arithmetically."""
    import numpy as np

    from deequ_spark.llm import audio_near_duplicates
    from deequ_spark.llm.multimodal import encode_wav_pcm16
    rate = 8000
    t = np.arange(rate) / rate
    freqs = [30.0, 100.0, 500.0, 2000.0]
    rows = []
    for i in range(24):
        amp = 0.2 + (i // 4) * 0.12
        sig = (amp * np.sin(2 * np.pi * freqs[i % 4] * t)
               * 32767).astype(np.int16)
        rows.append((i, bytearray(encode_wav_pcm16(sig.reshape(-1, 1),
                                                   rate))))
    df = spark.createDataFrame(rows, "aid long, payload binary")
    pairs = audio_near_duplicates(df, "aid", "payload", max_hamming=3)
    p = pairs.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("id_a") + F.col("id_b")).alias("ids")
                  ).collect()[0]
    cross = pairs.where(F.col("id_a") % 4 != F.col("id_b") % 4).count()
    return _metrics_df(spark, sorted([
        ("pairs", p["n"]), ("pair_id_sum", p["ids"]),
        ("cross_group_pairs", cross)]))


_AUDIO_PHASH_ORACLE_SQL = """
    WITH ids AS (SELECT unnest(range(24)) AS i),
    pairs AS (SELECT a.i AS ia, b.i AS ib FROM ids a JOIN ids b
              ON a.i % 4 = b.i % 4 AND a.i < b.i)
    SELECT metric, value FROM (
      SELECT 'pairs' AS metric,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM pairs) AS value
      UNION ALL SELECT 'pair_id_sum',
        (SELECT CAST(SUM(ia + ib) AS DOUBLE) FROM pairs)
      UNION ALL SELECT 'cross_group_pairs', 0.0
    ) ORDER BY metric
"""


def q_grouped_topk(spark, sf_dir):
    """Grouped top-k (diagnostics.py grouped_topk): Spark 3.5's
    WindowGroupLimit pushes the rank filter into the window exec
    (plan-asserted in tests) — per-group state k, not group size. Top-2
    lineitems per returnflag by a UNIQUE composite order (price desc,
    orderkey desc, linenumber desc) so ties are impossible and the
    oracle's row_number picks identical rows."""
    from deequ_spark.diagnostics import grouped_topk
    li = _load(spark, sf_dir, "lineitem")
    keyed = li.withColumn(
        "ord", F.struct(F.col("l_extendedprice"), F.col("l_orderkey"),
                        F.col("l_linenumber")))
    top = grouped_topk(keyed, "l_returnflag", "ord", k=2)
    rows = top.select("l_returnflag", "rank", "l_orderkey",
                      "l_linenumber").collect()
    pairs = []
    for r in rows:
        pairs += [(f"{r['l_returnflag']}_{r['rank']}_okey",
                   r["l_orderkey"]),
                  (f"{r['l_returnflag']}_{r['rank']}_line",
                   r["l_linenumber"])]
    return _metrics_df(spark, sorted(pairs))


_GROUPED_TOPK_ORACLE_SQL = """
    WITH ranked AS (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey DESC,
                                         l_linenumber DESC) AS rank
      FROM lineitem)
    SELECT metric, value FROM (
      SELECT l_returnflag || '_' || rank || '_okey' AS metric,
             CAST(l_orderkey AS DOUBLE) AS value
      FROM ranked WHERE rank <= 2
      UNION ALL
      SELECT l_returnflag || '_' || rank || '_line',
             CAST(l_linenumber AS DOUBLE)
      FROM ranked WHERE rank <= 2
    ) ORDER BY metric
"""


def q_fuzzy_join(spark, sf_dir):
    """EXACT Levenshtein<=1 self-join on customer names — PassJoin
    pigeonhole segment signatures (deequ_spark/linkage.py): bounded
    map-only key generation + one equi-join + thresholded levenshtein
    verify; identical pair set to the oracle's brute-force quadratic
    scan, with no cross join in the plan."""
    from deequ_spark.linkage import edit_distance_join
    cust = _load(spark, sf_dir, "customer")
    return (edit_distance_join(cust, "c_name", 1, "c_custkey")
            .select("id_a", "id_b",
                    F.col("dist").cast("double").alias("dist")))


def q_token_jaccard(spark, sf_dir):
    """EXACT token-set Jaccard>=0.8 self-join over documents via
    PPJoin-style prefix filtering (rarest-first token order,
    deequ_spark/linkage.py) — full pair set with exact similarities,
    candidates restricted to shared RARE prefix tokens."""
    from deequ_spark.linkage import token_jaccard_join
    docs = _load(spark, sf_dir, "documents")
    out = token_jaccard_join(docs, "doc_id", "text", 0.8)
    return out.select(
        "id_a", "id_b",
        F.floor(F.col("jaccard") * 1e6).cast("double").alias("jacc_q"))


def q_heavy_hitters(spark, sf_dir):
    """EXACT frequent items in two bounded-memory passes — per-partition
    Misra-Gries candidates (sound superset) + broadcast-verified exact
    counts (deequ_spark/diagnostics.py exact_heavy_hitters). Oracle is
    the plain GROUP BY ... HAVING the operator avoids materializing at
    full cardinality."""
    from deequ_spark.diagnostics import exact_heavy_hitters
    docs = _load(spark, sf_dir, "documents")
    ev = _load(spark, sf_dir, "events")
    hl = exact_heavy_hitters(docs, "lang", 0.13).select(
        F.concat(F.lit("lang_"), F.col("value")).alias("metric"),
        F.col("count").cast("double").alias("value"))
    he = exact_heavy_hitters(ev, "event_type", 0.15).select(
        F.concat(F.lit("etype_"), F.col("value")).alias("metric"),
        F.col("count").cast("double").alias("value"))
    return hl.unionAll(he)


def q_layout_ops(spark, sf_dir):
    """Composite: ALL space-filling-curve clustering keys (layout.py
    zorder_key + 2D hilbert_key at bits=8 over (o_custkey,
    o_totalprice), plus the r12 d-dimensional hilbert_key_nd at bits=6
    over (o_custkey, o_totalprice, o_orderkey)) — one row per (order,
    curve) so all 3x15k key values are checked; the oracle replays the
    Morton interleave closed-form, the Hilbert xy2d walk, and the 3D
    Skilling transpose walk via recursive CTEs."""
    from deequ_spark.layout import hilbert_key, hilbert_key_nd, \
        zorder_key
    orders = _load(spark, sf_dir, "orders")
    row = orders.agg(F.min("o_custkey"), F.max("o_custkey"),
                     F.min("o_totalprice"), F.max("o_totalprice"),
                     F.min("o_orderkey"), F.max("o_orderkey")) \
                .collect()[0]
    args = (["o_custkey", "o_totalprice"],
            [row[0], row[2]], [row[1], row[3]])
    z = orders.select("o_orderkey", F.lit("z").alias("curve"),
                      zorder_key(*args, bits=8).cast("double")
                      .alias("key"))
    h = orders.select("o_orderkey", F.lit("h").alias("curve"),
                      hilbert_key(*args, bits=8).cast("double")
                      .alias("key"))
    h3 = orders.select(
        "o_orderkey", F.lit("h3").alias("curve"),
        hilbert_key_nd(["o_custkey", "o_totalprice", "o_orderkey"],
                       [row[0], row[2], row[4]],
                       [row[1], row[3], row[5]], bits=6)
        .cast("double").alias("key"))
    return z.unionByName(h).unionByName(h3)


def q_bloom_join(spark, sf_dir):
    """Bloom-filter join pruning (deequ_spark/bloom.py): the exactness
    contract — bloom_semi_join / bloom_anti_join row sets must be
    IDENTICAL to the plain left-semi / left-anti joins the oracle runs
    (Bloom prunes map-side before the exchange; false positives are
    removed by the exact join, false negatives cannot exist). lineitem
    vs the URGENT slice of orders; per-returnflag counts + quantity
    sums, anti-join survivor count, and a certain-miss sanity flag
    (bloom negatives never exceed true non-members)."""
    from deequ_spark import bloom_anti_join, bloom_might_contain, \
        bloom_semi_join, build_bloom
    li = _load(spark, sf_dir, "lineitem")
    urgent = _load(spark, sf_dir, "orders") \
        .where(F.col("o_orderpriority") == "1-URGENT") \
        .select("o_orderkey")
    semi = bloom_semi_join(li, urgent, "l_orderkey",
                           small_on="o_orderkey")
    per_flag = (semi.groupBy("l_returnflag")
                .agg(F.count("*").alias("n"),
                     F.sum(F.col("l_quantity").cast("long")).alias("q"))
                .collect())
    rows = []
    for r in per_flag:
        rows.append((f"bj_semi_{r['l_returnflag']}_n", float(r["n"])))
        rows.append((f"bj_semi_{r['l_returnflag']}_qty", float(r["q"])))
    anti_n = bloom_anti_join(li, urgent, "l_orderkey",
                             small_on="o_orderkey").count()
    rows.append(("bj_anti_n", float(anti_n)))
    # sanity: bloom-certain-miss count can never exceed the true
    # non-member count (no false negatives); emitted as a 0/1 flag the
    # oracle pins to 1
    bloom = build_bloom(urgent, "o_orderkey")
    neg = li.where(~F.coalesce(
        bloom_might_contain(bloom, F.col("l_orderkey")),
        F.lit(False))).count()
    true_miss = anti_n
    rows.append(("bj_no_false_negatives", float(1 if neg <= true_miss
                                                else 0)))
    return _metrics_df(spark, sorted(rows))


def q_optimize_corpus(spark, sf_dir):
    """One-call corpus maintenance (sources.optimize_corpus): orders
    scattered into 40 tiny files, then ONE pass clusters+compacts the
    unoptimized tail on the Hilbert curve over (o_custkey,
    o_totalprice), refreshes the manifest incrementally, and attaches
    per-file Bloom bits for o_custkey. Pinned: exact content (count /
    integer cents / key sum), exact range-pruned and point-lookup row
    counts through read_corpus, plus layout flags — files reduced, all
    data files carry the clustered- prefix, range skipping on the lead
    cluster column actually prunes files, and repeated passes CONVERGE
    to a complete no-op (rewritten == manifest scans == bloom scans ==
    0 within 3 follow-ups: maintenance cost is proportional to the
    unoptimized tail, which the passes empty)."""
    import shutil
    import tempfile

    from deequ_spark.layout import skipping_report
    from deequ_spark.sources import (CLUSTERED_PREFIX, optimize_corpus,
                                     read_corpus)
    orders = _load(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="deequ_optimize_")
    try:
        orders.repartition(40).write.mode("overwrite").parquet(f"{d}/c")
        res = optimize_corpus(spark, f"{d}/c",
                              cluster_by=["o_custkey", "o_totalprice"],
                              bloom_cols=["o_custkey"],
                              target_bytes=128 * 1024)
        after = spark.read.parquet(f"{d}/c")
        row = after.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                  .cast("long")).alias("cents"),
            F.sum("o_orderkey").alias("keys")).collect()[0]
        pruned = read_corpus(spark, f"{d}/c",
                             prune={"o_custkey": (100, 300)}).count()
        eq = read_corpus(spark, f"{d}/c",
                         prune_eq={"o_custkey": 451}).count()
        names = [f.rsplit("/", 1)[-1] for f in after.inputFiles()]
        rep = skipping_report(spark, f"{d}/c",
                              {"o_custkey": (100.0, 300.0)})
        # convergence, not strict one-pass idempotence: range-partition
        # skew can leave a pass's outputs small enough that the NEXT
        # pass legitimately merges them (each pass strictly reduces the
        # file count, so the loop terminates); pinned contract = a
        # no-op pass (zero rewrites, zero manifest scans, zero bloom
        # scans) is reached within 3 follow-ups
        noop = False
        for _ in range(3):
            res2 = optimize_corpus(
                spark, f"{d}/c",
                cluster_by=["o_custkey", "o_totalprice"],
                bloom_cols=["o_custkey"], target_bytes=128 * 1024)
            if (res2["rewritten"] == 0
                    and res2["manifest"]["scanned"] == 0
                    and res2["blooms"]["o_custkey"]["scanned"] == 0):
                noop = True
                break
        pairs = [
            ("oc_rows", float(row["n"])),
            ("oc_cents", float(row["cents"])),
            ("oc_keys", float(row["keys"])),
            ("oc_pruned_rows", float(pruned)),
            ("oc_eq_rows", float(eq)),
            ("oc_files_reduced",
             float(1 if res["files_after"] < res["files_before"]
                   else 0)),
            ("oc_all_clustered",
             float(1 if all(n.startswith(CLUSTERED_PREFIX)
                            for n in names) else 0)),
            ("oc_skipping_works",
             float(1 if rep["skip_ratio_o_custkey"] >= 0.3 else 0)),
            ("oc_converges_to_noop", float(1 if noop else 0)),
        ]
        return _metrics_df(spark, sorted(pairs))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_compaction(spark, sf_dir):
    """Small-file compaction (sources.py compact_corpus): orders
    scattered into 40 tiny files, bin-packed and rewritten — the
    compacted corpus must aggregate EXACTLY what the oracle computes
    on the original table (count, per-row integer cents, key sum), the
    file count must drop (flag), the refreshed manifest must still
    range-prune exactly, and a second pass must be a no-op (flag:
    idempotence — compaction work is proportional to the small-file
    tail, which the first pass removed)."""
    import shutil
    import tempfile

    from deequ_spark.sources import (compact_corpus, read_corpus,
                                     write_manifest)
    orders = _load(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="deequ_compact_")
    try:
        orders.repartition(40).write.mode("overwrite").parquet(f"{d}/c")
        write_manifest(spark, f"{d}/c", ["o_custkey"])
        res = compact_corpus(spark, f"{d}/c", target_bytes=64 * 1024 * 1024)
        after = spark.read.parquet(f"{d}/c")
        row = after.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                  .cast("long")).alias("cents"),
            F.sum("o_orderkey").alias("keys")).collect()[0]
        pruned = read_corpus(spark, f"{d}/c",
                             prune={"o_custkey": (100, 300)}).count()
        res2 = compact_corpus(spark, f"{d}/c",
                              target_bytes=64 * 1024 * 1024)
        pairs = [
            ("cp_rows", float(row["n"])),
            ("cp_cents", float(row["cents"])),
            ("cp_keys", float(row["keys"])),
            ("cp_pruned_rows", float(pruned)),
            ("cp_files_reduced",
             float(1 if res["files_after"] < res["files_before"] else 0)),
            ("cp_idempotent", float(1 if res2["bins"] == 0 else 0)),
        ]
        return _metrics_df(spark, sorted(pairs))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_bloom_skipping(spark, sf_dir):
    """Manifest Bloom skipping (sources.py add_bloom_to_manifest /
    read_corpus prune_eq + the xxh64.py driver-probe replica): orders
    hash-scattered into 12 files by o_orderkey so every file's
    [min, max] of o_custkey spans ~everything (zone maps provably
    useless — pinned by the bs_minmax_useless flag); per-file Bloom
    bits then prune point lookups driver-side. Three fixed custkeys
    read through the pruned path must aggregate EXACTLY what the
    oracle's plain WHERE computes (bloom false positives only add
    files, the residual filter keeps results exact); a fourth metric
    pins that the bloom pruned at least one file where min/max pruned
    none."""
    import shutil
    import tempfile

    from deequ_spark.sources import (add_bloom_to_manifest,
                                     file_misses_key, file_misses_range,
                                     read_corpus, write_manifest)
    orders = _load(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="deequ_bloomskip_")
    try:
        orders.repartition(12, "o_orderkey").write             .mode("overwrite").parquet(f"{d}/c")
        write_manifest(spark, f"{d}/c", ["o_custkey"])
        add_bloom_to_manifest(spark, f"{d}/c", "o_custkey")
        man = spark.read.parquet(f"{d}/c/_manifest").collect()
        pairs = []
        keys = [7, 451, 1202]
        for key in keys:
            got = read_corpus(spark, f"{d}/c",
                              prune_eq={"o_custkey": key})
            row = got.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(F.floor(F.col("o_totalprice") * 100
                                         + 0.5).cast("long")),
                           F.lit(0)).alias("cents")).collect()[0]
            pairs += [(f"bs_k{key}_rows", float(row["n"])),
                      (f"bs_k{key}_cents", float(row["cents"]))]
        range_pruned = sum(file_misses_range(r, "o_custkey",
                                             keys[0], keys[0])
                           for r in man)
        bloom_pruned = sum(file_misses_key(r, "o_custkey", keys[0])
                           for r in man)
        pairs.append(("bs_minmax_useless",
                      float(1 if range_pruned == 0 else 0)))
        pairs.append(("bs_bloom_prunes",
                      float(1 if bloom_pruned > 0 else 0)))
        return _metrics_df(spark, sorted(pairs))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_salted_join(spark, sf_dir):
    """Replicated-salt skew join (deequ_spark/joins.py salted_join):
    orders x customer on custkey with 4 salts — result must be
    row-identical to the plain join the oracle runs, proving the salt
    spread is pure plan surgery."""
    from deequ_spark.joins import salted_join
    orders = _load(spark, sf_dir, "orders") \
        .withColumnRenamed("o_custkey", "c_custkey")
    cust = _load(spark, sf_dir, "customer")
    j = salted_join(orders, cust, "c_custkey", num_salts=4)
    # per-row integer cents then a LONG sum: double summation order
    # differs between engines/partitionings (floor(sum(double)*100)
    # measurably flipped the last cent under row reordering)
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return (j.groupBy("c_mktsegment")
            .agg(F.count("*").cast("double").alias("n"),
                 F.sum(cents).cast("double").alias("price_c")))


def q_assign_split(spark, sf_dir):
    """Leakage-safe train/val/test split (deequ_spark/llm/packing.py
    assign_split): documents split 80/10/10 by their source GROUP via
    the md5 portable hash; per-split doc and group counts, plus a
    straddle count the oracle pins at zero by construction."""
    from deequ_spark.llm.packing import assign_split
    docs = _load(spark, sf_dir, "documents")
    sp = assign_split(docs, "source",
                      {"train": 0.8, "val": 0.1, "test": 0.1})
    return (sp.groupBy("split")
            .agg(F.count("*").cast("double").alias("n_docs"),
                 F.countDistinct("source").cast("double")
                 .alias("n_groups")))


def q_streaming_hh(spark, sf_dir):
    """Streaming frequent items with BOUNDED state (streaming/frequent
    .py): 4 micro-batches of events through per-bucket Misra-Gries
    group state (update mode), then the exact verify pass over the
    at-rest table — final answer must equal the oracle's plain
    GROUP BY ... HAVING despite the stream's capped candidate memory."""
    import os
    import shutil
    import tempfile
    from deequ_spark.streaming import (streaming_heavy_hitters,
                                       verify_heavy_hitters)
    work = tempfile.mkdtemp(prefix="deequ_hh_")
    src = os.path.join(work, "src")
    try:
        ev = _load(spark, sf_dir, "events").select("event_type")
        ev.repartition(4).write.parquet(src)
        static = spark.read.parquet(src)
        stream = (spark.readStream.schema(static.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        hh = streaming_heavy_hitters(stream, "event_type",
                                     capacity=16, num_buckets=4)
        emitted = []
        batches = []
        q = (hh.writeStream.outputMode("update")
             .foreachBatch(lambda d, b: (emitted.extend(d.collect()),
                                         batches.append(b)))
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        cand = spark.createDataFrame(
            [(v,) for v in sorted({r["value"] for r in emitted})],
            "value string")
        verified = verify_heavy_hitters(static, "event_type", cand, 0.15)
        rows = [(f"etype_{r['value']}", float(r["count"]))
                for r in verified.collect()]
        rows.append(("stream_batches", float(len(batches))))
        return _metrics_df(spark, sorted(rows))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_feed_ops(spark, sf_dir):
    """RSS/Atom feed parsing (deequ_spark/llm/sitemap.py parse_feed):
    one synthesized RSS feed per doc with a titled+dated item and a
    bare-link item; every parsed (feed_url, entry_url, title,
    published) row — entity decode included — is replayed by string
    arithmetic in the oracle."""
    from deequ_spark.llm import parse_feed
    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    rss = F.concat(
        F.lit("<rss><channel><title>chan</title><item><title>Doc "),
        did, F.lit(" &amp; notes</title><link>http://h"), did % 37,
        F.lit(".test/p"), did, F.lit("</link><pubDate>2024-01-0"),
        (did % 9) + 1,
        F.lit("</pubDate></item><item><link>http://h"), did % 37,
        F.lit(".test/q"), did, F.lit("</link></item></channel></rss>"))
    feeds = docs.select(
        F.concat(F.lit("http://h"), did % 37, F.lit(".test/feed.xml"))
        .alias("url"), rss.alias("body"))
    return parse_feed(feeds, "url", "body")


def q_feed_discovery(spark, sf_dir):
    """Feed autodiscovery (deequ_spark/llm/sitemap.py discover_feeds):
    pages synthesized from doc_id advertise an RSS (even ids) or Atom
    (odd ids) feed among decoy links; every discovered (page_url,
    feed_url, feed_type) row is replayed by CASE arithmetic."""
    from deequ_spark.llm import discover_feeds
    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<head><link rel="stylesheet" href="/style.css">'),
        F.when(did % 2 == 0,
               F.concat(F.lit('<link rel="alternate" '
                              'type="application/rss+xml" href="/r'),
                        did, F.lit('.xml">')))
        .otherwise(F.concat(
            F.lit("<link type='application/atom+xml' href='/a"),
            did, F.lit(".xml' rel='alternate'>"))),
        F.lit('<link rel="alternate" type="text/html" href="/m">'
              "</head>"))
    pages = docs.select(
        F.concat(F.lit("http://h"), did % 37, F.lit(".test/p"), did)
        .alias("url"), html.alias("html"))
    return discover_feeds(pages, "url", "html")


def q_wet_export(spark, sf_dir):
    """Distributed WET export (deequ_spark/llm/warc.py write_wet):
    documents written as ISO 28500 conversion records with size-
    targeted sharding; the oracle replays the EXACT per-record framing
    arithmetic (204 + url + digits(len) + payload bytes per record) and
    the shard-count pre-pass, so the actually-written byte total is
    value-checked without gzip in the way."""
    import shutil
    import tempfile
    from deequ_spark.llm import write_wet
    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    corpus = docs.select(
        F.concat(F.lit("http://h"), did % 37, F.lit(".test/p"), did)
        .alias("url"), "text")
    target = 256 * 1024
    d = tempfile.mkdtemp(prefix="deequ_wet_")
    try:
        man = write_wet(corpus, f"{d}/wet", target_shard_bytes=target,
                        gzip_members=False).collect()
        derived = corpus.agg(F.coalesce(F.sum(
            F.octet_length("text") + F.octet_length("url") + F.lit(220)),
            F.lit(0))).collect()[0][0]
        n_derived = max(1, -(-int(derived) // target))
        return _metrics_df(spark, [
            ("wet_records", float(sum(r["n_records"] for r in man))),
            ("wet_bytes", float(sum(r["n_bytes"] for r in man))),
            ("wet_n_shards_derived", float(n_derived))])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_html_metadata(spark, sf_dir):
    """Head-metadata extraction (deequ_spark/llm/html.py html_metadata):
    pages synthesized from doc_id carry title entities, conditionally a
    meta description (did%3==0), a canonical link (did%4==0), and a
    robots meta in both attribute orders (did%5 in {0,1}); every
    extracted field is replayed by CASE arithmetic in the oracle."""
    from deequ_spark.llm import html_metadata
    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    html = F.concat(
        F.lit("<html><head><title>Doc "), did,
        F.lit(" &amp;  friends</title>"),
        F.when(did % 3 == 0,
               F.concat(F.lit('<meta name="description" content="about '),
                        did, F.lit('">'))).otherwise(F.lit("")),
        F.when(did % 4 == 0,
               F.concat(F.lit('<link rel="canonical" href="http://c.test/p'),
                        did % 50, F.lit('">'))).otherwise(F.lit("")),
        F.when(did % 5 == 0,
               F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(did % 5 == 1,
              F.lit('<meta content="nofollow" name="robots">'))
        .otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"))
    m = docs.select(did.alias("doc_id"),
                    html_metadata(html).alias("m"))
    return m.select(
        "doc_id", F.col("m.title").alias("title"),
        F.col("m.meta_description").alias("meta_description"),
        F.col("m.canonical_url").alias("canonical_url"),
        F.col("m.noindex").cast("double").alias("noindex"),
        F.col("m.nofollow").cast("double").alias("nofollow"))


def q_containment(spark, sf_dir):
    """EXACT asymmetric containment join (|A∩B|/|A| >= 0.95) over
    documents — deequ_spark/linkage.py token_containment_join:
    contained-side prefix filter + full index on the containing side,
    the quote-inclusion relation symmetric Jaccard misses. Full
    ordered-pair set value-checked against the brute-force SQL."""
    from deequ_spark.linkage import token_containment_join
    docs = _load(spark, sf_dir, "documents")
    out = token_containment_join(docs, "doc_id", "text", 0.95)
    return out.select(
        "id_a", "id_b",
        F.floor(F.col("containment") * 1e6).cast("double")
        .alias("cont_q"))


def q_fetch_schedule(spark, sf_dir):
    """Politeness fetch plan (deequ_spark/llm/sitemap.py
    fetch_schedule): frontier URLs synthesized from doc_id, per-host
    Crawl-delay for hosts h0-h3, default 0.5s elsewhere, 30-URL
    per-host quota — every (host, rank, scheduled_at) slot replayed by
    a ROW_NUMBER window + CASE arithmetic in the oracle."""
    from deequ_spark.llm import fetch_schedule
    docs = _load(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(F.lit("http://h"), F.col("doc_id") % 7,
                 F.lit(".test/p"), F.col("doc_id")).alias("url"))
    delays = spark.createDataFrame(
        [(f"h{k}.test", 1.0 + k % 3) for k in range(4)],
        "host string, crawl_delay_s double")
    out = fetch_schedule(urls, delays=delays, default_delay_s=0.5,
                         max_per_host=30, start_ts=1000.0)
    return out.select("host", "url",
                      F.col("fetch_rank").cast("double")
                      .alias("fetch_rank"), "scheduled_at")


def q_anchor_text(spark, sf_dir):
    """Anchor-text aggregation (deequ_spark/llm/graph.py anchor_texts +
    anchor_term_profile): pages synthesized from doc_id carry two
    anchors with inner markup; extraction strips tags, drops
    self-links, and the per-destination-host top-3 term profile is
    replayed in SQL from the same doc_id arithmetic."""
    from deequ_spark.llm import anchor_term_profile, anchor_texts
    docs = _load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(F.lit("http://h"), did % 37,
                   F.lit(".example.com/p"), did)
    html = F.concat(
        F.lit('<p>x</p><a href="http://h'), (did * 7 + 3) % 37,
        F.lit('.example.com/q">visit <b>h'), (did * 7 + 3) % 37,
        F.lit("</b> page "), did % 3,
        F.lit("</a> <a href='http://h"), (did * 11 + 5) % 37,
        F.lit(".example.com/r'>go to "), did % 5, F.lit("</a>"))
    pages = docs.select(url.alias("url"), html.alias("html"))
    prof = anchor_term_profile(anchor_texts(pages, "url", "html"),
                               top_k=3)
    return prof.select("dst_host", "term",
                       F.col("n").cast("double").alias("n"),
                       F.col("rank").cast("double").alias("rank"))


def _zorder_oracle() -> str:
    """orders z-key replay: same double math, same bit interleave."""
    def bucket(c):
        return (f"LEAST(GREATEST(CAST(FLOOR((CAST({c} AS DOUBLE) - mn_{c})"
                f" / (mx_{c} - mn_{c}) * 255.0) AS BIGINT), 0), 255)")
    terms = []
    for j, c in enumerate(["o_custkey", "o_totalprice"]):
        for i in range(8):
            terms.append(f"((({bucket(c)} >> {i}) & 1) << {i * 2 + j})")
    zsql = " | ".join(terms)
    return f"""
        WITH b AS (SELECT
            MIN(CAST(o_custkey AS DOUBLE)) AS mn_o_custkey,
            MAX(CAST(o_custkey AS DOUBLE)) AS mx_o_custkey,
            MIN(CAST(o_totalprice AS DOUBLE)) AS mn_o_totalprice,
            MAX(CAST(o_totalprice AS DOUBLE)) AS mx_o_totalprice
            FROM orders)
        SELECT o_orderkey, CAST({zsql} AS DOUBLE) AS z FROM orders, b
    """


def q_anomaly_gate(spark, sf_dir):
    """Repository-backed anomaly-GATED verification — the reference's
    isNewestPointNonAnomalous FLOW (checks/Check.scala:1512-1568 via
    VerificationRunBuilder.addAnomalyCheck, VerificationRunBuilder
    .scala:226-243), not just the strategies: two historical "days" of
    Size metrics are saved to a repository (day d = o_orderkey % 4 < d,
    so the series n1 < n2 < n3 is corpus-derived and strictly growing),
    then the day-3 run gates on three strategies — relative growth
    <= 2.0 (passes: n3/n2 ~ 1.5), relative growth <= 1.2 at ERROR level
    (fails), any absolute growth at WARNING (fails). The oracle
    recomputes the day counts and replays each bound check plus the
    suite's worst-status fold as literal SQL arithmetic."""
    from deequ_spark import CheckLevel, Size, VerificationSuite
    from deequ_spark.anomaly import (AbsoluteChangeStrategy,
                                     AnomalyCheckConfig,
                                     RelativeRateOfChangeStrategy)
    from deequ_spark.repository import InMemoryMetricsRepository, ResultKey

    orders = _load(spark, sf_dir, "orders")
    repo = InMemoryMetricsRepository()
    sizes = {}
    for day in (1, 2):
        df = orders.where(F.col("o_orderkey") % 4 < day)
        res = (VerificationSuite().on_data(df)
               .use_repository(repo)
               .add_required_analyzer(Size())
               .save_or_append_result(ResultKey.make(dataset_date=day))
               .run())
        sizes[day] = next(m.value for a, m in
                          res.metrics.metric_map.items()
                          if isinstance(a, Size))
    day3 = orders.where(F.col("o_orderkey") % 4 < 3)
    result = (VerificationSuite().on_data(day3)
              .use_repository(repo)
              .add_anomaly_check(
                  RelativeRateOfChangeStrategy(max_rate_increase=2.0),
                  Size(),
                  AnomalyCheckConfig(description="rel_loose"))
              .add_anomaly_check(
                  RelativeRateOfChangeStrategy(max_rate_increase=1.2),
                  Size(),
                  AnomalyCheckConfig(level=CheckLevel.ERROR,
                                     description="rel_tight"))
              .add_anomaly_check(
                  AbsoluteChangeStrategy(max_rate_increase=0.0),
                  Size(),
                  AnomalyCheckConfig(description="abs_zero"))
              .save_or_append_result(ResultKey.make(dataset_date=3))
              .run())
    gates = {c.description:
             (1.0 if cr.status.value == "Success" else 0.0)
             for c, cr in result.check_results.items()}
    n3 = next(m.value for a, m in
              result.metrics.metric_map.items()
              if isinstance(a, Size))
    order = {"Success": 0.0, "Warning": 1.0, "Error": 2.0}
    return _metrics_df(spark, sorted([
        ("size_day1", sizes[1]), ("size_day2", sizes[2]),
        ("size_day3", n3),
        ("gate_rel_loose", gates["rel_loose"]),
        ("gate_rel_tight", gates["rel_tight"]),
        ("gate_abs_zero", gates["abs_zero"]),
        ("suite_status", order[result.status.value])]))


_ANOMALY_GATE_ORACLE_SQL = """
    WITH d AS (SELECT
        SUM(CASE WHEN o_orderkey % 4 < 1 THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN o_orderkey % 4 < 2 THEN 1 ELSE 0 END) AS n2,
        SUM(CASE WHEN o_orderkey % 4 < 3 THEN 1 ELSE 0 END) AS n3
      FROM orders)
    SELECT metric, value FROM (
      SELECT 'size_day1' AS metric, CAST(n1 AS DOUBLE) AS value FROM d
      UNION ALL SELECT 'size_day2', CAST(n2 AS DOUBLE) FROM d
      UNION ALL SELECT 'size_day3', CAST(n3 AS DOUBLE) FROM d
      UNION ALL SELECT 'gate_rel_loose',
        CASE WHEN CAST(n3 AS DOUBLE) / n2 <= 2.0 THEN 1.0 ELSE 0.0 END
        FROM d
      UNION ALL SELECT 'gate_rel_tight',
        CASE WHEN CAST(n3 AS DOUBLE) / n2 <= 1.2 THEN 1.0 ELSE 0.0 END
        FROM d
      UNION ALL SELECT 'gate_abs_zero',
        CASE WHEN n3 - n2 <= 0 THEN 1.0 ELSE 0.0 END FROM d
      UNION ALL SELECT 'suite_status', CAST(GREATEST(
        CASE WHEN CAST(n3 AS DOUBLE) / n2 > 2.0 THEN 1 ELSE 0 END,
        CASE WHEN CAST(n3 AS DOUBLE) / n2 > 1.2 THEN 2 ELSE 0 END,
        CASE WHEN n3 - n2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM d
    ) ORDER BY metric
"""


def q_mp3_profile(spark, sf_dir):
    """Per-frame MP3 VBR profiling (llm/multimodal.py mp3_frame_profile):
    every 13th doc gets a synthetic MPEG1 Layer III stream whose j-th
    frame's bitrate cycles [64,96,128,160] by (doc_id+j)%4 at 48 kHz
    (pad-free 3*kbps-byte frames), every 3rd doc prefixed with an ID3v2
    tag of 1+(doc_id%4)*3 payload bytes. The profiler walks the real
    byte stream (tag skip + frame-chain walk); the oracle regenerates
    offsets/bitrates/frame sizes from the same doc_id arithmetic with a
    window running sum — one mismatch in tag skipping, header parsing,
    or chain stepping breaks a row."""
    import pandas as pd
    from deequ_spark.llm import encode_mp3_vbr, mp3_frame_profile

    docs = _load(spark, sf_dir, "documents") \
        .where(F.col("doc_id") % 13 == 0)

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                n = 2 + i % 6
                rates = [[64, 96, 128, 160][(i + j) % 4]
                         for j in range(n)]
                payloads.append(encode_mp3_vbr(
                    rates,
                    id3_payload=(1 + (i % 4) * 3) if i % 3 == 0 else 0))
                ids.append(i)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary")
    return mp3_frame_profile(media).orderBy("media_id", "frame_index")


_MP3_PROFILE_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id AS i, 2 + doc_id % 6 AS n,
             CASE WHEN doc_id % 3 = 0 THEN 11 + (doc_id % 4) * 3
                  ELSE 0 END AS base
      FROM documents WHERE doc_id % 13 = 0),
    fr AS (SELECT i, base, unnest(range(0, n)) AS j FROM d),
    c AS (SELECT i, j, base,
                 ([64, 96, 128, 160])[CAST((i + j) % 4 AS INT) + 1] AS kbps
          FROM fr)
    SELECT CAST(i AS BIGINT) AS media_id,
           CAST(j AS INT) AS frame_index,
           CAST(base + COALESCE(SUM(3 * kbps) OVER (
               PARTITION BY i ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS byte_offset,
           CAST(kbps AS INT) AS bitrate_kbps,
           48000 AS sample_rate,
           CAST(3 * kbps AS INT) AS frame_bytes,
           1152 AS samples
    FROM c ORDER BY media_id, frame_index
"""


def q_gif_frames(spark, sf_dir):
    """GIF animation compositing (llm/gif.py decode_gif_frames +
    llm/multimodal.py gif_frame_features): every 11th doc gets a
    synthetic 12x12 GIF89a animation of 2+doc_id%5 non-overlapping 3x3
    solid-grey patches; frame j's grey is (doc_id*7+j*13)%200+1, its
    top row is TRANSPARENT when (doc_id+j)%3==0, its disposal method
    cycles 1/2/3 by (7*doc_id+5*j)%3, its delay is (doc_id+7*j)%100 cs.
    Because patches never overlap on a black background, the composited
    canvas sum after frame j is exactly 3*(own contribution + sum of
    prior frames retained by disposal 1) — the oracle replays that with
    a window sum, so any error in GCE parsing, transparency masking, or
    disposal handling (restore-background vs restore-previous) breaks a
    row."""
    import numpy as np
    import pandas as pd
    from deequ_spark.llm import encode_gif_animation, gif_frame_features

    docs = _load(spark, sf_dir, "documents") \
        .where(F.col("doc_id") % 11 == 0)

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                frames = []
                for j in range(2 + i % 5):
                    v = (i * 7 + j * 13) % 200 + 1
                    mask = None
                    if (i + j) % 3 == 0:
                        mask = np.zeros((3, 3), bool)
                        mask[0, :] = True
                    frames.append({
                        "patch": np.full((3, 3, 3), v, np.uint8),
                        "left": 3 * (j % 4), "top": 3 * (j // 4),
                        "disposal": 1 + (7 * i + 5 * j) % 3,
                        "delay_cs": (i + 7 * j) % 100,
                        "transparent_mask": mask})
                ids.append(i)
                payloads.append(encode_gif_animation((12, 12), frames))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary")
    return gif_frame_features(media).orderBy("media_id", "frame_index")


_GIF_FRAMES_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id AS i, 2 + doc_id % 5 AS n
      FROM documents WHERE doc_id % 11 = 0),
    fr AS (SELECT i, unnest(range(0, n)) AS k FROM d),
    c AS (SELECT i, k,
             (i * 7 + k * 13) % 200 + 1 AS v,
             CASE WHEN (i + k) % 3 = 0 THEN 1 ELSE 0 END AS t,
             1 + (7 * i + 5 * k) % 3 AS disp,
             (i + 7 * k) % 100 AS delay
          FROM fr),
    e AS (SELECT i, k, disp, delay,
                 v * (9 - 3 * t) AS contrib, 9 - 3 * t AS px
          FROM c)
    SELECT CAST(i AS BIGINT) AS media_id,
           CAST(k AS INT) AS frame_index,
           CAST(delay AS INT) AS delay_cs,
           CAST(disp AS INT) AS disposal,
           CAST(3 * (contrib + COALESCE(SUM(CASE WHEN disp = 1
               THEN contrib ELSE 0 END) OVER (PARTITION BY i ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
             AS BIGINT) AS canvas_sum,
           CAST(px + COALESCE(SUM(CASE WHEN disp = 1
               THEN px ELSE 0 END) OVER (PARTITION BY i ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS lit_px
    FROM e ORDER BY media_id, frame_index
"""




def q_mp4_profile(spark, sf_dir):
    """MP4 stbl sample-table profiling (llm/multimodal.py
    mp4_sample_profile + encode_mp4_samples): every 17th doc gets a
    single-track MP4 whose sample tables are doc_id arithmetic — n =
    3+doc_id%5 samples, size_j = 100+((doc_id+3j)%7)*10, decode delta
    512 for the first ceil(n/2) samples then 256 (two stts runs), sync
    samples where (doc_id+j)%3==0, 2-sample chunks with REAL two-pass
    absolute offsets. The profiler re-derives every row from the byte
    stream; the oracle regenerates sizes/dts/durations/sync from the
    same arithmetic with window sums (offsets compared relative to the
    first sample: chunks are laid out contiguously, so rel offset =
    running size sum — the moov-size-dependent absolute base cancels)."""
    import pandas as pd
    from pyspark.sql import Window
    from deequ_spark.llm import encode_mp4_samples, mp4_sample_profile

    docs = _load(spark, sf_dir, "documents") \
        .where(F.col("doc_id") % 17 == 0)

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                n = 3 + i % 5
                sizes = [100 + ((i + 3 * j) % 7) * 10 for j in range(n)]
                deltas = [512 if j < (n + 1) // 2 else 256
                          for j in range(n)]
                sync = [j + 1 for j in range(n) if (i + j) % 3 == 0]
                ids.append(i)
                payloads.append(encode_mp4_samples(
                    sizes, deltas, sync_samples=sync, chunk_size=2))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary")
    prof = mp4_sample_profile(media)
    w = Window.partitionBy("media_id")
    return (prof
            .withColumn("rel_offset",
                        (F.col("byte_offset")
                         - F.min("byte_offset").over(w)).cast("long"))
            .select("media_id", "sample_index", "rel_offset",
                    "size_bytes", "dts_ms", "duration_ms", "is_sync")
            .orderBy("media_id", "sample_index"))


_MP4_PROFILE_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id AS i, 3 + doc_id % 5 AS n
      FROM documents WHERE doc_id % 17 = 0),
    fr AS (SELECT i, n, unnest(range(0, n)) AS j FROM d),
    c AS (SELECT i, n, j,
                 100 + ((i + 3 * j) % 7) * 10 AS sz,
                 CASE WHEN j < (n + 1) // 2 THEN 512 ELSE 256 END AS dl,
                 CASE WHEN (i + j) % 3 = 0 THEN TRUE ELSE FALSE END
                   AS sync
          FROM fr)
    SELECT CAST(i AS BIGINT) AS media_id,
           CAST(j AS INT) AS sample_index,
           CAST(COALESCE(SUM(sz) OVER (PARTITION BY i ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS rel_offset,
           CAST(sz AS INT) AS size_bytes,
           CAST(COALESCE(SUM(dl) OVER (PARTITION BY i ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS dts_ms,
           CAST(dl AS BIGINT) AS duration_ms,
           sync AS is_sync
    FROM c ORDER BY media_id, sample_index
"""




def q_id3_tags(spark, sf_dir):
    """ID3v2 text-frame metadata (llm/multimodal.py encode_id3v2 /
    id3_text_frames): every 19th doc gets a tagged MP3 — even doc_ids
    carry a v2.4 tag (syncsafe frame sizes, utf-8 title/album, utf-16
    artist, TDRC year), odd doc_ids a v2.3 tag (big-endian frame sizes,
    latin-1, TYER year) plus doc_id%16 padding bytes — composed with a
    real 2-frame MP3 stream so the tag walk must stop exactly at the
    audio. One row per text frame; the oracle regenerates every (frame,
    value) pair from the doc_id arithmetic."""
    import pandas as pd
    from deequ_spark.llm import (encode_id3v2, encode_mp3_frames,
                                 id3_text_frames)

    docs = _load(spark, sf_dir, "documents") \
        .where(F.col("doc_id") % 19 == 0)

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                v4 = i % 2 == 0
                frames = [
                    ("TIT2", f"Title {i}", 3 if v4 else 0),
                    ("TPE1", f"Artist {i % 7}", 1),
                    ("TALB", f"Album {i % 5}", 3 if v4 else 0),
                    ("TDRC" if v4 else "TYER",
                     str(1990 + i % 30), 0)]
                blob = encode_id3v2(frames, version=4 if v4 else 3,
                                    padding=i % 16) \
                    + encode_mp3_frames(2)
                ids.append(i)
                payloads.append(blob)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary")
    return id3_text_frames(media).orderBy("media_id", "frame_id")


_ID3_TAGS_ORACLE_SQL = """
    WITH d AS (SELECT doc_id AS i FROM documents WHERE doc_id % 19 = 0)
    SELECT CAST(i AS BIGINT) AS media_id, frame_id, value FROM (
      SELECT i, 'TIT2' AS frame_id, 'Title ' || i AS value FROM d
      UNION ALL SELECT i, 'TPE1', 'Artist ' || (i % 7) FROM d
      UNION ALL SELECT i, 'TALB', 'Album ' || (i % 5) FROM d
      UNION ALL SELECT i, CASE WHEN i % 2 = 0 THEN 'TDRC' ELSE 'TYER'
        END, CAST(1990 + i % 30 AS VARCHAR) FROM d
    ) ORDER BY media_id, frame_id
"""




def q_warc_cdx(spark, sf_dir):
    """CDX capture index (llm/warc.py warc_cdx_index + surt_key): docs
    grouped into 8 plain WARC files (doc_id % 8, records in doc_id
    order), each doc a response record with a doc_id-arithmetic URL and
    payload. The index walk re-derives every on-disk span from the
    actual bytes; the oracle REBUILDS each record's exact framing as a
    string (same header lines build_warc_record writes) and replays
    offset (window byte sum), length, SURT urlkey, 14-digit timestamp,
    and sha256 digest in SQL — one framing byte off anywhere and the
    whole tail of a file mismatches."""
    import pandas as pd
    from deequ_spark.llm import build_warc_record, warc_cdx_index

    docs = _load(spark, sf_dir, "documents") \
        .select("doc_id", (F.col("doc_id") % 8).alias("g"))

    def build_files(pdf):
        g = int(pdf["g"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        records = []
        for i in pdf["doc_id"]:
            i = int(i)
            payload = (f"payload {i} " * (1 + i % 4)).encode()
            records.append(build_warc_record(
                "response", payload,
                target_uri=f"http://h{i % 7}.example.com/p{i}",
                record_id=f"urn:doc:{i}"))
        return pd.DataFrame({"path": [f"f{g}"],
                             "content": [b"".join(records)]})

    files = docs.groupBy("g").applyInPandas(
        build_files, "path string, content binary")
    return warc_cdx_index(files).orderBy("path", "offset")


_WARC_CDX_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id AS i, doc_id % 8 AS g,
             repeat('payload ' || doc_id || ' ', 1 + doc_id % 4) AS pl
      FROM documents),
    rec AS (
      SELECT i, g, pl,
        'WARC/1.0' || chr(13) || chr(10)
        || 'WARC-Type: response' || chr(13) || chr(10)
        || 'WARC-Date: 2024-01-01T00:00:00Z' || chr(13) || chr(10)
        || 'WARC-Record-ID: <urn:doc:' || i || '>' || chr(13) || chr(10)
        || 'WARC-Target-URI: http://h' || (i % 7) || '.example.com/p'
        || i || chr(13) || chr(10)
        || 'Content-Length: ' || strlen(pl)
        || chr(13) || chr(10) || chr(13) || chr(10)
        || pl || chr(13) || chr(10) || chr(13) || chr(10) AS rec_str
      FROM d)
    SELECT 'f' || g AS path,
           'com,example,h' || (i % 7) || ')/p' || i AS urlkey,
           '20240101000000' AS "timestamp",
           'http://h' || (i % 7) || '.example.com/p' || i AS url,
           'response' AS warc_type,
           CAST(COALESCE(SUM(strlen(rec_str)) OVER (
               PARTITION BY g ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS "offset",
           CAST(strlen(rec_str) AS BIGINT) AS length,
           sha256(pl) AS digest
    FROM rec ORDER BY path, "offset"
"""




def q_wds_index(spark, sf_dir):
    """WebDataset tar member index (llm/shards.py tar_members /
    webdataset_index): documents written as 4 tar shards (shard =
    doc_id % 4 so the assignment is SQL-replayable; two members per
    doc: text as .txt and a derived title as .ttl, members sorted by
    STRING key then column order — exactly write_webdataset's layout),
    then indexed back from the raw tar bytes. The oracle regenerates
    every member's data offset from pure USTAR arithmetic (512-byte
    header + content padded to 512, cumulative within shard) and its
    size from the corpus text lengths — one framing byte off and a
    whole shard's tail mismatches."""
    import shutil
    import tempfile
    from deequ_spark.llm import webdataset_index, write_webdataset

    docs = (_load(spark, sf_dir, "documents")
            .select("doc_id", "text",
                    F.concat(F.lit("Title "), F.col("doc_id"))
                    .alias("title")))
    d = tempfile.mkdtemp(prefix="q_wds_index_")
    try:
        write_webdataset(docs, d, "doc_id",
                         {"text": "txt", "title": "ttl"},
                         shard_expr=F.pmod(F.col("doc_id"), F.lit(4))
                         ).collect()
        files = (spark.read.format("binaryFile").load(f"{d}/*.tar")
                 .select("path", "content"))
        rows = (webdataset_index(files)
                .select(F.regexp_extract("path", r"(shard-\d+\.tar)$", 1)
                        .alias("shard"),
                        "key", "ext", "offset", "size")
                .collect())
    finally:
        shutil.rmtree(d, ignore_errors=True)
    out = spark.createDataFrame(
        rows, "shard string, key string, ext string, offset long, "
              "size long")
    return out.orderBy("shard", "offset")


_WDS_INDEX_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id AS i, CAST(doc_id AS VARCHAR) AS k, doc_id % 4 AS s,
             strlen(text) AS tlen,
             strlen('Title ' || doc_id) AS ulen
      FROM documents),
    m AS (
      SELECT i, k, s, 0 AS ci, 'txt' AS ext, tlen AS sz FROM d
      UNION ALL
      SELECT i, k, s, 1 AS ci, 'ttl' AS ext, ulen AS sz FROM d)
    SELECT 'shard-0000' || s || '.tar' AS shard,
           k AS key, ext,
           CAST(512 + COALESCE(SUM(512 + ((sz + 511) // 512) * 512)
               OVER (PARTITION BY s ORDER BY k, ci
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS "offset",
           CAST(sz AS BIGINT) AS size
    FROM m ORDER BY shard, "offset"
"""




def q_cdx_update(spark, sf_dir):
    """Incremental CDX maintenance end-to-end (llm/warc.py
    update_cdx_index): documents grouped into 4 gzip WARC files; the
    flow runs bootstrap (3 files) -> append (1 new file) -> no-op ->
    ghost drop (1 file deleted), emitting every state-machine counter
    plus the final index row/urlkey counts. All counters are per-group
    document counts, replayed by the oracle from doc_id % 4 arithmetic
    — a wrong known/scanned/removed transition anywhere flips a row."""
    import os
    import shutil
    import tempfile
    from deequ_spark.llm import (build_warc_file, build_warc_record,
                                 update_cdx_index)

    groups = {}
    for r in _load(spark, sf_dir, "documents") \
            .select("doc_id").collect():
        groups.setdefault(int(r["doc_id"]) % 4, []).append(
            int(r["doc_id"]))
    d = tempfile.mkdtemp(prefix="q_cdx_update_")
    idx = f"{d}/cdx"
    arch = f"{d}/arch"
    os.makedirs(arch)

    def write_file(g):
        recs = [build_warc_record(
            "conversion", f"body {i}".encode(),
            target_uri=f"http://g{g}.example.net/p{i}")
            for i in sorted(groups[g])]
        with open(f"{arch}/f{g}.warc.gz", "wb") as fh:
            fh.write(build_warc_file(recs, gzip_members=True))

    try:
        rows = []
        for g in (0, 1, 2):
            write_file(g)
        st = update_cdx_index(spark, idx, f"{arch}/*.warc.gz")
        rows += [("boot_" + k, float(v)) for k, v in st.items()]
        write_file(3)
        st = update_cdx_index(spark, idx, f"{arch}/*.warc.gz")
        rows += [("append_" + k, float(v)) for k, v in st.items()]
        st = update_cdx_index(spark, idx, f"{arch}/*.warc.gz")
        rows += [("noop_" + k, float(v)) for k, v in st.items()]
        os.remove(f"{arch}/f1.warc.gz")
        st = update_cdx_index(spark, idx, f"{arch}/*.warc.gz")
        rows += [("ghost_" + k, float(v)) for k, v in st.items()]
        final = spark.read.parquet(idx)
        rows += [("final_rows", float(final.count())),
                 ("final_urlkeys", float(
                     final.select("urlkey").distinct().count()))]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return _metrics_df(spark, sorted(rows))


_CDX_UPDATE_ORACLE_SQL = """
    WITH g AS (SELECT doc_id % 4 AS grp, COUNT(*) AS n
               FROM documents GROUP BY 1),
    t AS (SELECT SUM(n) AS total,
                 SUM(CASE WHEN grp = 1 THEN n ELSE 0 END) AS n1
          FROM g)
    SELECT metric, value FROM (
      SELECT 'boot_known_files' AS metric, 0.0 AS value
      UNION ALL SELECT 'boot_scanned_files', 3.0
      UNION ALL SELECT 'boot_removed_rows', 0.0
      UNION ALL SELECT 'append_known_files', 3.0
      UNION ALL SELECT 'append_scanned_files', 1.0
      UNION ALL SELECT 'append_removed_rows', 0.0
      UNION ALL SELECT 'noop_known_files', 4.0
      UNION ALL SELECT 'noop_scanned_files', 0.0
      UNION ALL SELECT 'noop_removed_rows', 0.0
      UNION ALL SELECT 'ghost_known_files', 3.0
      UNION ALL SELECT 'ghost_scanned_files', 0.0
      UNION ALL SELECT 'ghost_removed_rows',
        (SELECT CAST(n1 AS DOUBLE) FROM t)
      UNION ALL SELECT 'final_rows',
        (SELECT CAST(total - n1 AS DOUBLE) FROM t)
      UNION ALL SELECT 'final_urlkeys',
        (SELECT CAST(total - n1 AS DOUBLE) FROM t)
    ) ORDER BY metric
"""




def q_keyframe_seek(spark, sf_dir):
    """Keyframe-snapped video seek plan (llm/multimodal.py
    sample_video_keyframes): the q_mp4_profile fixture streams (doc_id
    arithmetic: n=3+i%5 samples, two stts runs, sync where (i+j)%3==0)
    sampled on a 4-point uniform grid — each grid position must emit
    its nearest PRECEDING stss sync sample. The oracle re-derives the
    snap in SQL: per (doc, grid) the max sync sample with dts <=
    duration*(grid+0.5)/4, falling back to the first sync; grid
    timestamps are exact in IEEE doubles on both engines (small-int
    products over a power-of-two divisor), so the <= boundary cannot
    drift. Offsets compared relative to the first sample (contiguous
    chunks — the moov-size base cancels)."""
    import pandas as pd
    from pyspark.sql import Window
    from deequ_spark.llm import encode_mp4_samples, sample_video_keyframes

    docs = _load(spark, sf_dir, "documents") \
        .where(F.col("doc_id") % 17 == 0)

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"].astype("int64"):
                i = int(i)
                n = 3 + i % 5
                sizes = [100 + ((i + 3 * j) % 7) * 10 for j in range(n)]
                deltas = [512 if j < (n + 1) // 2 else 256
                          for j in range(n)]
                sync = [j + 1 for j in range(n) if (i + j) % 3 == 0]
                ids.append(i)
                payloads.append(encode_mp4_samples(
                    sizes, deltas, sync_samples=sync, chunk_size=2))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary")
    kf = sample_video_keyframes(media, n_frames=4)
    # rel offset: subtract each stream's first-sample offset (sample 0
    # is not always emitted, but offset(sample j) - offset(sample 0) =
    # prefix size sum, and offset(sample 0) = min over the FULL sample
    # table = mdat payload start, constant per stream)
    from deequ_spark.llm import mp4_sample_profile
    base = (mp4_sample_profile(media)
            .groupBy("media_id")
            .agg(F.min("byte_offset").alias("__base")))
    return (kf.join(base, "media_id")
            .select("media_id", "grid_index", "sample_index", "ts_ms",
                    (F.col("byte_offset") - F.col("__base"))
                    .cast("long").alias("rel_offset"), "size_bytes")
            .orderBy("media_id", "grid_index"))


_KEYFRAME_SEEK_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id AS i, 3 + doc_id % 5 AS n
      FROM documents WHERE doc_id % 17 = 0),
    s AS (
      SELECT i, n, unnest(range(0, n)) AS j FROM d),
    c AS (
      SELECT i, n, j,
             100 + ((i + 3 * j) % 7) * 10 AS sz,
             CASE WHEN j < (n + 1) // 2 THEN 512 ELSE 256 END AS dl,
             CASE WHEN (i + j) % 3 = 0 THEN 1 ELSE 0 END AS sync
      FROM s),
    w AS (
      SELECT i, j, sz, dl, sync,
             COALESCE(SUM(dl) OVER (PARTITION BY i ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS dts,
             COALESCE(SUM(sz) OVER (PARTITION BY i ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rel,
             SUM(dl) OVER (PARTITION BY i) AS duration
      FROM c),
    grid AS (
      SELECT i, unnest(range(0, 4)) AS g FROM d),
    pick AS (
      SELECT grid.i, grid.g,
             COALESCE(
               MAX(CASE WHEN w.sync = 1 AND w.dts <=
                 CAST(w.duration AS DOUBLE) * (grid.g + 0.5) / 4
                 THEN w.j END),
               MIN(CASE WHEN w.sync = 1 THEN w.j END)) AS bj
      FROM grid JOIN w ON w.i = grid.i
      GROUP BY grid.i, grid.g)
    SELECT CAST(pick.i AS BIGINT) AS media_id,
           CAST(pick.g AS INT) AS grid_index,
           CAST(pick.bj AS INT) AS sample_index,
           CAST(w.dts AS BIGINT) AS ts_ms,
           CAST(w.rel AS BIGINT) AS rel_offset,
           CAST(w.sz AS INT) AS size_bytes
    FROM pick JOIN w ON w.i = pick.i AND w.j = pick.bj
    ORDER BY media_id, grid_index
"""




def q_readability(spark, sf_dir):
    """Flesch / Flesch-Kincaid readability (llm/text.py
    readability_scores): per-doc raw counts (words, sentence-ending
    punctuation runs, vowel-group syllables) plus both calibrated
    scores, quantized floor(v*1e6) — the oracle recomputes the same
    regexp counts and the IDENTICAL double-arithmetic expression in
    DuckDB (same op order, so the quantized values are bit-stable)."""
    from deequ_spark.llm import readability_scores
    docs = _load(spark, sf_dir, "documents") \
        .where(F.col("doc_id") % 23 == 0)
    out = readability_scores(docs, "text")
    return (out.select(
        "doc_id", "r_words", "r_sentences", "r_syllables",
        F.floor(F.col("r_flesch") * 1e6).cast("long").alias("flesch_q"),
        F.floor(F.col("r_fk_grade") * 1e6).cast("long").alias("grade_q"))
        .orderBy("doc_id"))


_READABILITY_ORACLE_SQL = """
    WITH c AS (
      SELECT doc_id,
        GREATEST(len(list_filter(string_split_regex(text, '\\s+'),
                                 x -> x != '')), 1) AS w,
        GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
        GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
          AS y
      FROM documents WHERE doc_id % 23 = 0)
    SELECT doc_id,
           CAST(w AS BIGINT) AS r_words,
           CAST(s AS BIGINT) AS r_sentences,
           CAST(y AS BIGINT) AS r_syllables,
           CAST(FLOOR((206.835 - 1.015 * CAST(w AS DOUBLE)
                 / CAST(s AS DOUBLE)
                 - 84.6 * CAST(y AS DOUBLE) / CAST(w AS DOUBLE)) * 1e6)
             AS BIGINT) AS flesch_q,
           CAST(FLOOR((0.39 * CAST(w AS DOUBLE) / CAST(s AS DOUBLE)
                 + 11.8 * CAST(y AS DOUBLE) / CAST(w AS DOUBLE)
                 - 15.59) * 1e6) AS BIGINT) AS grade_q
    FROM c ORDER BY doc_id
"""




def q_token_mixture(spark, sf_dir):
    """Token-budget domain mixture (llm/packing.py token_mixture_sample):
    weights 5:3:2 over sources src0/src1/src2, total 4000 tokens — more
    than src0 holds, so the availability cap fires while src1/src2
    deliver their budgets as floors (crossing doc included). The oracle
    replays the exact integer largest-remainder apportionment over the
    domains' token TOTALS and the md5-ordered cumulative take in SQL —
    per-source kept counts, token sums, and doc_id checksums pin the
    exact selected sets."""
    from deequ_spark.llm import token_mixture_sample
    docs = _load(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split("text", r"\s+"),
                           lambda t: t != ""))
    out = token_mixture_sample(
        docs, "source", "doc_id", toks,
        {"src0": 5, "src1": 3, "src2": 2}, total_tokens=4000)
    per = (out.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(toks).alias("t"),
                F.sum("doc_id").alias("ck")).collect())
    rows = []
    for r in per:
        rows += [(f"{r['source']}_docs", r["n"]),
                 (f"{r['source']}_tokens", r["t"]),
                 (f"{r['source']}_checksum", r["ck"])]
    return _metrics_df(spark, sorted(rows))


_TOKEN_MIXTURE_ORACLE_SQL = """
    WITH toks AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x != '')) AS t
      FROM documents),
    mixw AS (SELECT * FROM (VALUES ('src0', 5), ('src1', 3),
                                   ('src2', 2)) AS w(source, wt)),
    pres AS (SELECT m.source, m.wt, SUM(k.t) AS c
             FROM mixw m JOIN toks k ON k.source = m.source
             GROUP BY m.source, m.wt),
    app AS (SELECT source, c, (4000 * wt) // den AS base,
                   (4000 * wt) % den AS rem
            FROM pres, (SELECT SUM(wt) AS den FROM pres)),
    ranked AS (SELECT source, c, base,
                      ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                        AS rk
               FROM app),
    quota AS (SELECT source,
                     LEAST(base + CASE WHEN rk <=
                         (SELECT 4000 - SUM(base) FROM app)
                         THEN 1 ELSE 0 END, c) AS q
              FROM ranked),
    ordered AS (
      SELECT k.doc_id, k.source, k.t,
             COALESCE(SUM(k.t) OVER (PARTITION BY k.source
               ORDER BY substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8),
                        k.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev
      FROM toks k JOIN mixw USING (source)),
    kept AS (SELECT o.* FROM ordered o JOIN quota USING (source)
             WHERE o.prev < quota.q)
    SELECT metric, value FROM (
      SELECT source || '_docs' AS metric,
             CAST(COUNT(*) AS DOUBLE) AS value FROM kept GROUP BY source
      UNION ALL SELECT source || '_tokens', CAST(SUM(t) AS DOUBLE)
      FROM kept GROUP BY source
      UNION ALL SELECT source || '_checksum', CAST(SUM(doc_id) AS DOUBLE)
      FROM kept GROUP BY source
    ) ORDER BY metric
"""




def q_url_quality(spark, sf_dir):
    """URL-shape quality gate (llm/urls.py url_quality_flags): every
    29th doc gets a synthetic URL whose SHAPE cycles six classes by
    doc_id%6 — clean article path, hyphen-chained spam host,
    digit-heavy host, 12-deep path trap, blockworded path, bare host.
    Per-URL flags (length, depth, host digit ratio quantized, hyphen
    count, blockword, keep) are replayed by the oracle with the SAME
    string/regexp pipeline in SQL — scheme strip, userinfo/port strip,
    path split — so the flag logic itself is engine-checked, not just
    the per-class outcomes."""
    from deequ_spark.llm import url_quality_flags
    docs = _load(spark, sf_dir, "documents") \
        .where(F.col("doc_id") % 29 == 0)
    m = F.col("doc_id") % 6
    i = F.col("doc_id").cast("string")
    url = (F.when(m == 0, F.concat(F.lit("https://news"), i,
                                   F.lit(".example.org/world/"), i,
                                   F.lit("/story")))
           .when(m == 1, F.concat(F.lit("http://cheap-pills-"), i,
                                  F.lit("-24x7-shop.biz/buy")))
           .when(m == 2, F.concat(F.lit("http://"), i,
                                  F.lit("0123456789.io/x")))
           .when(m == 3, F.concat(
               F.lit("http://a.io/"),
               F.array_join(F.transform(F.sequence(F.lit(0), F.lit(11)),
                                        lambda k: F.concat(F.lit("d"),
                                                           k)),
                            "/")))
           .when(m == 4, F.concat(F.lit("http://ok"), i,
                                  F.lit(".io/casino/page")))
           .otherwise(F.concat(F.lit("https://host"), i, F.lit(".io"))))
    flagged = url_quality_flags(
        docs.select("doc_id", url.alias("url")), "url")
    return (flagged.select(
        "doc_id", "uq_len", "uq_depth",
        F.floor(F.col("uq_host_digit_ratio") * 1e6).cast("long")
        .alias("digit_q"),
        "uq_host_hyphens", "uq_blockword", "uq_keep")
        .orderBy("doc_id"))


_URL_QUALITY_ORACLE_SQL = """
    WITH d AS (
      SELECT doc_id,
        CASE doc_id % 6
          WHEN 0 THEN 'https://news' || doc_id || '.example.org/world/'
                      || doc_id || '/story'
          WHEN 1 THEN 'http://cheap-pills-' || doc_id
                      || '-24x7-shop.biz/buy'
          WHEN 2 THEN 'http://' || doc_id || '0123456789.io/x'
          WHEN 3 THEN 'http://a.io/' || array_to_string(
              list_transform(range(0, 12), k -> 'd' || k), '/')
          WHEN 4 THEN 'http://ok' || doc_id || '.io/casino/page'
          ELSE 'https://host' || doc_id || '.io' END AS url
      FROM documents WHERE doc_id % 29 = 0),
    p AS (
      SELECT doc_id, lower(trim(url)) AS u,
        regexp_replace(lower(trim(url)),
                       '^[a-z][a-z0-9+.\\-]*://', '') AS rest
      FROM d),
    h AS (
      SELECT doc_id, u,
        regexp_replace(regexp_replace(
          regexp_extract(rest, '^([^/?#]*)', 1),
          '^[^@]*@', ''), ':\\d+$', '') AS host,
        regexp_extract(rest, '^[^/?#]*(/[^?#]*)?', 1) AS path
      FROM p),
    f AS (
      SELECT doc_id, u, host,
        len(list_filter(string_split(path, '/'), x -> x != ''))
          AS depth,
        CAST(len(regexp_replace(host, '[^0-9]', '', 'g')) AS DOUBLE)
          / GREATEST(len(host), 1) AS dr,
        len(regexp_replace(host, '[^-]', '', 'g')) AS hy,
        (u LIKE '%porn%' OR u LIKE '%xxx%' OR u LIKE '%casino%'
         OR u LIKE '%viagra%' OR u LIKE '%escort%'
         OR u LIKE '%gambling%') AS blocked
      FROM h)
    SELECT doc_id,
           CAST(len(u) AS INT) AS uq_len,
           CAST(depth AS INT) AS uq_depth,
           CAST(FLOOR(dr * 1e6) AS BIGINT) AS digit_q,
           CAST(hy AS INT) AS uq_host_hyphens,
           blocked AS uq_blockword,
           (len(u) <= 512 AND depth <= 10 AND dr <= 0.4 AND hy <= 3
            AND NOT blocked AND len(host) > 0) AS uq_keep
    FROM f ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict ORDER is load-bearing: the round driver snapshots the FIRST 50
    # entries into CORRECTNESS_r{N}.json.  Driver-green rows accumulate
    # across rounds, so each round rotates the stalest-green queries into
    # the head of the dict.  r13 rotates the r11-graded tail block back
    # into the window — it holds every core-analyzer composite
    # (scan/grouping/histogram/dqdl/profile/suggestions/stream_ops...),
    # exactly the surface the r12 concurrent runner and this round's
    # Histogram shuffle-sharing execute through (r12 verdict item 2) —
    # plus the two r12-graded queries whose operators r13 touched:
    # span_dedup (duplicate_span_removal lost its third scan + re-attach
    # join) and near_dup_ratio (near_duplicate_components releases its
    # superseded label checkpoints).  The r12-graded block moves to the
    # tail; registry = 98 names, full coverage still fits two windows.
    # tools/check_oracle.py always verifies the FULL registry regardless.
    return {
        # --- r13 touched (operators changed this round) ---
        "span_dedup": q_span_dedup,
        "near_dup_ratio": q_near_dup_ratio,
        # --- r11-green block rotated into the window (core analyzer
        # composites execute through the concurrent runner + histogram
        # shuffle-sharing) ---
        "histogram_ops": q_histogram_ops,
        "grouping_core_ops": q_grouping_core_ops,
        "scan_basic_ops": q_scan_basic_ops,
        "scan_stats_ops": q_scan_stats_ops,
        "scan_sketch_ops": q_scan_sketch_ops,
        "dqdl_ops": q_dqdl_ops,
        "row_level_ops": q_row_level_ops,
        "check_flow_ops": q_check_flow_ops,
        "drift_anomaly_ops": q_drift_anomaly_ops,
        "text_filter_ops": q_text_filter_ops,
        "lexical_dedup_ops": q_lexical_dedup_ops,
        "media_feature_ops": q_media_feature_ops,
        "ann_ops": q_ann_ops,
        "stream_ops": q_stream_ops,
        "text_pipeline_ops": q_text_pipeline_ops,
        "satellite_ops": q_satellite_ops,
        "embedding_ops": q_embedding_ops,
        "comparison_ops": q_comparison_ops,
        "decontamination": q_decontamination,
        "language_id": q_language_id_all,
        "near_dedup": q_near_dedup,
        "profile": q_profile,
        "simhash": q_simhash,
        "suggestions": q_suggestions,
        "bloom_join": q_bloom_join,
        "bloom_skipping": q_bloom_skipping,
        "compaction": q_compaction,
        "audio_phash": q_audio_phash,
        "benford": q_benford,
        "c4_filters": q_c4_filters,
        "embedding_quantize": q_embedding_quantize,
        "functional_dependency": q_functional_dependency,
        "fuzzy_join": q_fuzzy_join,
        "grouped_topk": q_grouped_topk,
        "html_extract": q_html_extract,
        "image_phash": q_image_phash,
        "join_cardinality": q_join_cardinality,
        "link_graph": q_link_graph,
        "missingness": q_missingness,
        "ngram_novelty": q_ngram_novelty,
        "robots_filter": q_robots_filter,
        "rolling_stats": q_rolling_stats,
        "sitemap_ops": q_sitemap_ops,
        "sliced_analysis": q_sliced_analysis,
        "table_diff": q_table_diff,
        "token_jaccard": q_token_jaccard,
        "warc_ingest": q_warc_ingest,
        "webdataset": q_webdataset,
        # --- tail: driver-green r12 (next window sweeps these) ---
        "optimize_corpus": q_optimize_corpus,
        "layout_ops": q_layout_ops,
        "incremental_dedup": q_incremental_dedup,
        "bm25_search": q_bm25_search,
        "semantic_dedup": q_semantic_dedup,
        "paragraph_dedup": q_paragraph_dedup,
        "corpus_drift": q_corpus_drift,
        "video_frames": q_video_frames,
        "streaming_drift": q_streaming_drift,
        "dsir_sample": q_dsir_sample,
        "bpe_ops": q_bpe_ops,
        "token_stats": q_token_stats,
        "sequence_packing": q_sequence_packing,
        "corpus_sampling": q_corpus_sampling,
        "text_normalize": q_text_normalize,
        "url_ops": q_url_ops,
        "url_quality": q_url_quality,
        "skew_report": q_skew_report,
        "asof_join": q_asof_join,
        "interval_join": q_interval_join,
        "salted_join": q_salted_join,
        "robust_stats": q_robust_stats,
        "doc_vectors": q_doc_vectors,
        "scale_utils": q_scale_utils,
        "quality_score": q_quality_score,
        "readability": q_readability,
        "semantic_decon": q_semantic_decon,
        "char_dedup": q_char_dedup,
        "heavy_hitters": q_heavy_hitters,
        "streaming_hh": q_streaming_hh,
        "containment": q_containment,
        "anomaly_gate": q_anomaly_gate,
        "token_mixture": q_token_mixture,
        "assign_split": q_assign_split,
        "fetch_schedule": q_fetch_schedule,
        "anchor_text": q_anchor_text,
        "html_metadata": q_html_metadata,
        "wet_export": q_wet_export,
        "feed_ops": q_feed_ops,
        "feed_discovery": q_feed_discovery,
        "mp3_profile": q_mp3_profile,
        "gif_frames": q_gif_frames,
        "mp4_profile": q_mp4_profile,
        "id3_tags": q_id3_tags,
        "warc_cdx": q_warc_cdx,
        "wds_index": q_wds_index,
        "cdx_update": q_cdx_update,
        "keyframe_seek": q_keyframe_seek,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB ANSI SQL on the same parquet views)
# ---------------------------------------------------------------------------

_INTEGRAL_RE = r"^(-|\+)? ?\d+$"
_FRACTIONAL_RE = r"^(-|\+)? ?\d+((\.\d+)|((?:\.\d+)?[Ee][-+]?\d+))$"
_BOOLEAN_RE = r"^(true|false)$"


def _dt_oracle(label: str, expr: str) -> str:
    """5 type-ratio rows for a string expression (no WITH — composable)."""
    counts = f"""(SELECT
        COUNT(*) AS total,
        SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_null,
        SUM(CASE WHEN v IS NOT NULL AND regexp_matches(v, '{_FRACTIONAL_RE}') THEN 1 ELSE 0 END) AS n_frac,
        SUM(CASE WHEN v IS NOT NULL AND regexp_matches(v, '{_INTEGRAL_RE}') THEN 1 ELSE 0 END) AS n_int,
        SUM(CASE WHEN v IS NOT NULL AND regexp_matches(v, '{_BOOLEAN_RE}') THEN 1 ELSE 0 END) AS n_bool
        FROM (SELECT {expr} AS v FROM orders) src)"""
    return f"""
    SELECT 'dt_{label}_Integral' AS metric, CAST(n_int AS DOUBLE)/total AS value FROM {counts} c
    UNION ALL SELECT 'dt_{label}_Fractional', CAST(n_frac AS DOUBLE)/total FROM {counts} c
    UNION ALL SELECT 'dt_{label}_Boolean', CAST(n_bool AS DOUBLE)/total FROM {counts} c
    UNION ALL SELECT 'dt_{label}_String', CAST(total - n_null - n_frac - n_int - n_bool AS DOUBLE)/total FROM {counts} c
    UNION ALL SELECT 'dt_{label}_Unknown', CAST(n_null AS DOUBLE)/total FROM {counts} c
    """


def _union_oracles(*sqls: str) -> str:
    """Compose component oracle SQLs (each possibly carrying its own WITH /
    ORDER BY / LIMIT) into one UNION ALL via subquery wrapping."""
    return "\nUNION ALL\n".join(
        f"SELECT * FROM (\n{s}\n) AS comp{i}" for i, s in enumerate(sqls))


def oracle_sql() -> dict[str, str]:
    fuzz = "FLOOR(({}) * 1e6)"
    d = {
        "size": """
            SELECT 'size_all' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM lineitem
            UNION ALL
            SELECT 'size_filtered', CAST(SUM(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
        """,
        "completeness": """
            SELECT 'completeness_key' AS metric,
                   CAST(COUNT(o_orderkey) AS DOUBLE) / COUNT(*) AS value FROM orders
            UNION ALL
            SELECT 'completeness_priority',
                   CAST(COUNT(o_orderpriority) AS DOUBLE) / COUNT(*) FROM orders
            UNION ALL
            SELECT 'completeness_filtered',
                   CAST(SUM(CASE WHEN o_totalprice > 100000 AND o_totalprice IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) FROM orders
        """,
        "compliance": """
            SELECT 'compliance_qty_pos' AS metric,
                   CAST(SUM(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS value FROM lineitem
            UNION ALL
            SELECT 'compliance_disc_range',
                   CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) FROM lineitem
            UNION ALL
            SELECT 'compliance_price_gt_tax',
                   CAST(SUM(CASE WHEN l_extendedprice > l_tax THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) FROM lineitem
            UNION ALL
            SELECT 'compliance_filtered',
                   CAST(SUM(CASE WHEN l_discount > 0.05 AND l_quantity < 10 THEN 1 ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) FROM lineitem
        """,
        "pattern_match": """
            SELECT 'pattern_priority' AS metric,
                   CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$') THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS value FROM orders
            UNION ALL
            SELECT 'pattern_status',
                   CAST(SUM(CASE WHEN regexp_matches(o_orderstatus, '^[OF]$') THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) FROM orders
        """,
        "min_max": """
            SELECT 'min_price' AS metric, CAST(MIN(l_extendedprice) AS DOUBLE) AS value FROM lineitem
            UNION ALL SELECT 'max_price', CAST(MAX(l_extendedprice) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'min_qty_filtered', CAST(MIN(CASE WHEN l_discount > 0.05 THEN l_quantity END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'max_tax', CAST(MAX(l_tax) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'range_qty', CAST(MAX(l_quantity) AS DOUBLE) - CAST(MIN(l_quantity) AS DOUBLE) FROM lineitem
        """,
        "sum_mean": """
            SELECT 'sum_price' AS metric,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value FROM lineitem
            UNION ALL
            SELECT 'mean_price',
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) FROM lineitem
            UNION ALL
            SELECT 'sum_qty', CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) FROM lineitem
            UNION ALL
            SELECT 'mean_qty',
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) FROM lineitem
            UNION ALL
            SELECT 'sum_qty_flag_a',
                   CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) FROM lineitem
        """,
        "moments": f"""
            WITH s AS (SELECT
                COUNT(l_quantity) AS n,
                AVG(l_quantity) AS mu,
                SUM((l_quantity - (SELECT AVG(l_quantity) FROM lineitem)) ^ 2) AS m2,
                SUM((l_quantity - (SELECT AVG(l_quantity) FROM lineitem)) ^ 3) AS m3,
                SUM((l_quantity - (SELECT AVG(l_quantity) FROM lineitem)) ^ 4) AS m4
                FROM lineitem)
            SELECT 'stddev_qty' AS metric, {fuzz.format("SQRT(m2 / n)")} AS value FROM s
            UNION ALL SELECT 'variance_qty', {fuzz.format("m2 / n")} FROM s
            UNION ALL SELECT 'skewness_qty', {fuzz.format("SQRT(CAST(n AS DOUBLE)) * m3 / (m2 ^ 1.5)")} FROM s
            UNION ALL SELECT 'kurtosis_qty', {fuzz.format("CAST(n AS DOUBLE) * m4 / (m2 * m2) - 3.0")} FROM s
            UNION ALL SELECT 'corr_qty_price', {fuzz.format("corr(l_quantity, l_extendedprice)")} FROM lineitem
        """,
        "quantiles": f"""
            SELECT 'median_qty' AS metric, {fuzz.format("quantile_cont(l_quantity, 0.5)")} AS value FROM lineitem
            UNION ALL SELECT 'p90_qty', {fuzz.format("quantile_cont(l_quantity, 0.9)")} FROM lineitem
            UNION ALL SELECT 'p25_price', {fuzz.format("quantile_cont(l_extendedprice, 0.25)")} FROM lineitem
            UNION ALL SELECT 'iqr_price', {fuzz.format("quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25)")} FROM lineitem
        """,
        "uniqueness": """
            WITH freq AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders
                          WHERE o_custkey IS NOT NULL GROUP BY o_custkey),
            stats AS (SELECT SUM(CASE WHEN cnt = 1 THEN 1.0 ELSE 0.0 END) AS uniq,
                             COUNT(*) AS groups, SUM(cnt) AS n FROM freq)
            SELECT 'uniqueness_custkey' AS metric, uniq / n AS value FROM stats
            UNION ALL SELECT 'uvr_custkey', uniq / groups FROM stats
            UNION ALL SELECT 'distinctness_custkey', CAST(groups AS DOUBLE) / n FROM stats
            UNION ALL SELECT 'count_distinct_custkey', CAST(groups AS DOUBLE) FROM stats
            UNION ALL
            SELECT 'uniqueness_orderkey',
                   (SELECT SUM(CASE WHEN cnt = 1 THEN 1.0 ELSE 0.0 END) / SUM(cnt)
                    FROM (SELECT COUNT(*) AS cnt FROM orders WHERE o_orderkey IS NOT NULL
                          GROUP BY o_orderkey) f)
        """,
        "entropy": f"""
            WITH f1 AS (SELECT COUNT(*) AS cnt FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY o_orderstatus),
            e1 AS (SELECT LN(SUM(cnt)) - SUM(cnt * LN(cnt)) / SUM(cnt) AS v FROM f1),
            f2 AS (SELECT COUNT(*) AS cnt FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority),
            e2 AS (SELECT LN(SUM(cnt)) - SUM(cnt * LN(cnt)) / SUM(cnt) AS v FROM f2)
            SELECT 'entropy_status' AS metric, {fuzz.format("v")} AS value FROM e1
            UNION ALL SELECT 'entropy_priority', {fuzz.format("v")} FROM e2
        """,
        "duplicate_rows": """
            SELECT 'dup_flag_status' AS metric,
                   CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0) AS DOUBLE) AS value
            FROM (SELECT COUNT(*) AS cnt FROM lineitem
                  WHERE l_returnflag IS NOT NULL OR l_linestatus IS NOT NULL
                  GROUP BY l_returnflag, l_linestatus) f
            UNION ALL
            SELECT 'dup_pk', CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0) AS DOUBLE)
            FROM (SELECT COUNT(*) AS cnt FROM lineitem
                  WHERE l_orderkey IS NOT NULL OR l_linenumber IS NOT NULL
                  GROUP BY l_orderkey, l_linenumber) f
        """,
        "datatype": (_dt_oracle("priority", "o_orderpriority")
                     + " UNION ALL "
                     + _dt_oracle("key_str", "CAST(o_orderkey AS VARCHAR)")),
        "histogram": """
            WITH f AS (SELECT l_returnflag AS v, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag),
            t AS (SELECT SUM(cnt) AS total, COUNT(*) AS bins FROM f)
            SELECT 'hist_' || v || '_abs' AS metric, CAST(cnt AS DOUBLE) AS value FROM f
            UNION ALL
            SELECT 'hist_' || v || '_ratio', CAST(cnt AS DOUBLE) / (SELECT total FROM t) FROM f
            UNION ALL
            SELECT 'hist_bins', CAST(bins AS DOUBLE) FROM t
        """,
        "mutual_information": f"""
            WITH joint AS (SELECT l_returnflag AS x, l_linestatus AS y, COUNT(*) AS cnt
                           FROM lineitem
                           WHERE l_returnflag IS NOT NULL OR l_linestatus IS NOT NULL
                           GROUP BY 1, 2),
            n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM joint),
            mx AS (SELECT x, SUM(cnt) AS cx FROM joint GROUP BY x),
            my AS (SELECT y, SUM(cnt) AS cy FROM joint GROUP BY y),
            mi AS (SELECT SUM((j.cnt / n.total) * LN((j.cnt / n.total) /
                       ((mx.cx / n.total) * (my.cy / n.total)))) AS v
                   FROM joint j, n, mx, my WHERE j.x = mx.x AND j.y = my.y)
            SELECT 'mi_flag_status' AS metric, {fuzz.format("v")} AS value FROM mi
        """,
        "approx_count_distinct": """
            SELECT 'acd_custkey_ok' AS metric, CAST(1 AS DOUBLE) AS value
            UNION ALL SELECT 'acd_orderkey_ok', CAST(1 AS DOUBLE)
        """,
        "approx_quantile": """
            SELECT 'aq_median_ok' AS metric, CAST(1 AS DOUBLE) AS value
        """,
        "verification": """
            WITH m AS (SELECT
                COUNT(*) AS n,
                CAST(COUNT(l_orderkey) AS DOUBLE) / COUNT(*) AS compl,
                MIN(l_quantity) AS minq,
                MAX(l_discount) AS maxd,
                CAST(SUM(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS small_ratio
                FROM lineitem),
            u AS (SELECT SUM(CASE WHEN cnt = 1 THEN 1.0 ELSE 0.0 END) / SUM(cnt) AS uniq
                  FROM (SELECT COUNT(*) AS cnt FROM lineitem
                        WHERE l_orderkey IS NOT NULL OR l_linenumber IS NOT NULL
                        GROUP BY l_orderkey, l_linenumber) f)
            SELECT 'check_size' AS metric, CASE WHEN n >= 50000 THEN 1.0 ELSE 0.0 END AS value FROM m
            UNION ALL SELECT 'check_completeness', CASE WHEN compl = 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'check_min', CASE WHEN minq >= 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'check_max', CASE WHEN maxd <= 0.5 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'check_satisfies', CASE WHEN small_ratio > 0.5 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'check_uniqueness', CASE WHEN uniq = 1.0 THEN 1.0 ELSE 0.0 END FROM u
        """,
        "zorder_layout": _zorder_oracle(),
        "feed_discovery": r"""
            SELECT 'http://h' || (doc_id % 37) || '.test/p' || doc_id
                       AS page_url,
                   CASE WHEN doc_id % 2 = 0
                        THEN '/r' || doc_id || '.xml'
                        ELSE '/a' || doc_id || '.xml' END AS feed_url,
                   CASE WHEN doc_id % 2 = 0 THEN 'rss'
                        ELSE 'atom' END AS feed_type
            FROM documents
        """,
        "feed_ops": r"""
            WITH d AS (SELECT doc_id, doc_id % 37 AS h,
                              (doc_id % 9) + 1 AS pd
                       FROM documents)
            SELECT 'http://h' || h || '.test/feed.xml' AS feed_url,
                   'http://h' || h || '.test/p' || doc_id AS entry_url,
                   'Doc ' || doc_id || ' & notes' AS title,
                   '2024-01-0' || pd AS published
            FROM d
            UNION ALL
            SELECT 'http://h' || h || '.test/feed.xml',
                   'http://h' || h || '.test/q' || doc_id,
                   NULL, NULL
            FROM d
        """,
        "wet_export": r"""
            WITH c AS (
              SELECT 'http://h' || (doc_id % 37) || '.test/p' || doc_id
                         AS url,
                     text
              FROM documents
              WHERE text IS NOT NULL),
            r AS (SELECT strlen(url) AS u, strlen(text) AS p
                  FROM c)
            SELECT 'wet_bytes' AS metric,
                   CAST(SUM(204 + u + length(CAST(p AS VARCHAR)) + p)
                        AS DOUBLE) AS value FROM r
            UNION ALL SELECT 'wet_n_shards_derived',
                   CAST(CEIL(SUM(p + u + 220) / 262144.0) AS DOUBLE) FROM r
            UNION ALL SELECT 'wet_records', CAST(COUNT(*) AS DOUBLE) FROM r
            ORDER BY metric
        """,
        "html_metadata": r"""
            SELECT doc_id,
                   'Doc ' || doc_id || ' & friends' AS title,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'about ' || doc_id END AS meta_description,
                   CASE WHEN doc_id % 4 = 0
                        THEN 'http://c.test/p' || (doc_id % 50)
                   END AS canonical_url,
                   CASE WHEN doc_id % 5 = 0 THEN 1.0 ELSE 0.0 END
                       AS noindex,
                   CASE WHEN doc_id % 5 IN (0, 1) THEN 1.0 ELSE 0.0 END
                       AS nofollow
            FROM documents
        """,
        "containment": r"""
            WITH toks AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
                FROM documents) u
              WHERE tok <> ''
            ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
              FROM toks a JOIN toks b
                ON a.tok = b.tok AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
            SELECT ia AS id_a, ib AS id_b,
                   CAST(FLOOR(1e6 * CAST(c AS DOUBLE) / sa.n) AS DOUBLE)
                       AS cont_q
            FROM inter JOIN sizes sa ON sa.doc_id = ia
            WHERE CAST(c AS DOUBLE) / sa.n >= 0.95
        """,
        "anchor_text": r"""
            WITH p AS (
              SELECT doc_id % 37 AS s, (doc_id * 7 + 3) % 37 AS d1,
                     (doc_id * 11 + 5) % 37 AS d2,
                     doc_id % 3 AS m3, doc_id % 5 AS m5
              FROM documents),
            a AS (
              SELECT 'h' || d1 || '.example.com' AS dst_host, t.t AS term
              FROM p, UNNEST(['visit', 'h' || d1, 'page',
                              CAST(m3 AS VARCHAR)]) t(t)
              WHERE d1 <> s
              UNION ALL
              SELECT 'h' || d2 || '.example.com', t.t
              FROM p, UNNEST(['go', 'to', CAST(m5 AS VARCHAR)]) t(t)
              WHERE d2 <> s),
            c AS (SELECT dst_host, term, COUNT(*) AS n
                  FROM a GROUP BY 1, 2),
            r AS (SELECT dst_host, term, n,
                         ROW_NUMBER() OVER (PARTITION BY dst_host
                                            ORDER BY n DESC, term ASC)
                             AS rank
                  FROM c)
            SELECT dst_host, term, CAST(n AS DOUBLE) AS n,
                   CAST(rank AS DOUBLE) AS rank
            FROM r WHERE rank <= 3
        """,
        "fetch_schedule": r"""
            WITH urls AS (
              SELECT 'http://h' || (doc_id % 7) || '.test/p' || doc_id AS url,
                     'h' || (doc_id % 7) || '.test' AS host
              FROM documents),
            ranked AS (
              SELECT host, url,
                     ROW_NUMBER() OVER (PARTITION BY host
                                        ORDER BY url ASC) AS r
              FROM urls)
            SELECT host, url, CAST(r AS DOUBLE) AS fetch_rank,
                   CAST(1000.0 + (r - 1) *
                        (CASE WHEN host IN ('h0.test','h1.test',
                                            'h2.test','h3.test')
                              THEN 1.0 + (CAST(substr(host, 2, 1) AS INT) % 3)
                              ELSE 0.5 END) AS DOUBLE) AS scheduled_at
            FROM ranked WHERE r <= 30
        """,
        "streaming_hh": r"""
            SELECT 'etype_' || event_type AS metric,
                   CAST(COUNT(*) AS DOUBLE) AS value
            FROM events WHERE event_type IS NOT NULL GROUP BY event_type
            HAVING COUNT(*) * 1000000 >= 150000 *
                   (SELECT COUNT(*) FROM events WHERE event_type IS NOT NULL)
            UNION ALL SELECT 'stream_batches', 4.0
            ORDER BY metric
        """,
        "salted_join": r"""
            SELECT c_mktsegment,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS DOUBLE) AS price_c
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "assign_split": "",  # filled below — needs python-built thresholds
        "fuzzy_join": r"""
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                   CAST(levenshtein(a.c_name, b.c_name) AS DOUBLE) AS dist
            FROM customer a JOIN customer b
              ON a.c_custkey < b.c_custkey
             AND abs(length(a.c_name) - length(b.c_name)) <= 1
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        """,
        "token_jaccard": r"""
            WITH toks AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
                FROM documents) u
              WHERE tok <> ''
            ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
              FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT ia AS id_a, ib AS id_b,
                   CAST(FLOOR(1e6 * CAST(c AS DOUBLE) / (sa.n + sb.n - c)) AS DOUBLE) AS jacc_q
            FROM inter
            JOIN sizes sa ON sa.doc_id = ia
            JOIN sizes sb ON sb.doc_id = ib
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
        """,
        "heavy_hitters": r"""
            SELECT 'lang_' || lang AS metric, CAST(COUNT(*) AS DOUBLE) AS value
            FROM documents WHERE lang IS NOT NULL GROUP BY lang
            HAVING COUNT(*) * 1000000 >= 130000 * (SELECT COUNT(*) FROM documents WHERE lang IS NOT NULL)
            UNION ALL
            SELECT 'etype_' || event_type, CAST(COUNT(*) AS DOUBLE)
            FROM events WHERE event_type IS NOT NULL GROUP BY event_type
            HAVING COUNT(*) * 1000000 >= 150000 * (SELECT COUNT(*) FROM events WHERE event_type IS NOT NULL)
        """,
        "exact_dedup": r"""
            SELECT 'docs_total' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM documents
            UNION ALL SELECT 'docs_distinct_text', CAST(COUNT(DISTINCT text) AS DOUBLE) FROM documents
            UNION ALL SELECT 'dup_lang_source_groups',
                CAST(COUNT(*) AS DOUBLE) FROM (
                    SELECT lang, source FROM documents GROUP BY lang, source
                    HAVING COUNT(*) > 1) g
            UNION ALL SELECT 'distinct_fingerprints',
                CAST(COUNT(DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS DOUBLE)
                FROM documents
        """,
        "jaccard_dedup": r"""
            WITH toks AS (SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
                FROM documents),
            sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
                    THEN list_distinct([array_to_string(t[i:i+2], ' ')
                                        for i in generate_series(1, len(t)-2)])
                    ELSE [array_to_string(t, ' ')] END AS s FROM toks),
            w AS (SELECT doc_id, unnest(s) AS s FROM sh),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                      FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            jac AS (SELECT c * 1.0 / (sa.sz + sb.sz - c) AS jv
                    FROM inter JOIN sizes sa ON sa.doc_id = inter.i
                               JOIN sizes sb ON sb.doc_id = inter.j)
            SELECT 'jaccard_pairs_05' AS metric,
                   CAST(SUM(CASE WHEN jv >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM jac
            UNION ALL SELECT 'jaccard_pairs_08',
                   CAST(SUM(CASE WHEN jv >= 0.8 THEN 1 ELSE 0 END) AS DOUBLE) FROM jac
        """,
        "minhash_lsh": r"""
            WITH toks AS (SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
                FROM documents),
            sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
                    THEN list_distinct([array_to_string(t[i:i+2], ' ')
                                        for i in generate_series(1, len(t)-2)])
                    ELSE [array_to_string(t, ' ')] END AS s FROM toks),
            w AS (SELECT doc_id, unnest(s) AS s FROM sh),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
                      FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT 'lsh_pairs_08' AS metric,
                   CAST(SUM(CASE WHEN c * 1.0 / (sa.sz + sb.sz - c) >= 0.8
                            THEN 1 ELSE 0 END) AS DOUBLE) AS value
            FROM inter JOIN sizes sa ON sa.doc_id = inter.i
                       JOIN sizes sb ON sb.doc_id = inter.j
        """,
        "simhash": _simhash_oracle_sql(),
        "near_dedup": _NEAR_DEDUP_ORACLE,
        "pii": _pii_oracle_sql(),
        "text_quality": r"""
            WITH q AS (SELECT
                SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS tok,
                SUM(length(text)) AS chars,
                SUM(len(regexp_extract_all(text, '[^\w\s]'))) AS punct,
                SUM(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS retok,
                SUM(len(list_distinct(list_filter(
                    string_split_regex(lower(text), '\s+'), x -> x <> '')))) AS dtok
                FROM documents)
            SELECT 'sum_ws_tokens' AS metric, CAST(tok AS DOUBLE) AS value FROM q
            UNION ALL SELECT 'sum_chars', CAST(chars AS DOUBLE) FROM q
            UNION ALL SELECT 'sum_regex_tokens', CAST(retok AS DOUBLE) FROM q
            UNION ALL SELECT 'punct_per_char', CAST(punct AS DOUBLE) / chars FROM q
            UNION ALL SELECT 'distinct_token_ratio', CAST(dtok AS DOUBLE) / tok FROM q
        """,
        "language_id": r"""
            WITH scored AS (SELECT lang,
                len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|mit|ein|eine)\b')) AS c_de,
                len(regexp_extract_all(text, '\b(the|and|of|to|is|in|that|it|for)\b')) AS c_en,
                len(regexp_extract_all(text, '\b(el|la|los|las|de|que|y|en|es|un|una)\b')) AS c_es,
                len(regexp_extract_all(text, '\b(le|la|les|et|de|des|que|est|un|une)\b')) AS c_fr,
                len(regexp_extract_all(text, '[一-鿿]')) AS c_zh
                FROM documents),
            pred AS (SELECT lang, CASE
                WHEN greatest(c_de, c_en, c_es, c_fr, c_zh) = 0 THEN 'unknown'
                WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                WHEN c_fr >= c_zh THEN 'fr'
                ELSE 'zh' END AS p FROM scored)
            SELECT 'pred_de' AS metric, CAST(SUM(CASE WHEN p = 'de' THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM pred
            UNION ALL SELECT 'pred_en', CAST(SUM(CASE WHEN p = 'en' THEN 1 ELSE 0 END) AS DOUBLE) FROM pred
            UNION ALL SELECT 'pred_es', CAST(SUM(CASE WHEN p = 'es' THEN 1 ELSE 0 END) AS DOUBLE) FROM pred
            UNION ALL SELECT 'pred_fr', CAST(SUM(CASE WHEN p = 'fr' THEN 1 ELSE 0 END) AS DOUBLE) FROM pred
            UNION ALL SELECT 'pred_zh', CAST(SUM(CASE WHEN p = 'zh' THEN 1 ELSE 0 END) AS DOUBLE) FROM pred
            UNION ALL SELECT 'pred_unknown', CAST(SUM(CASE WHEN p = 'unknown' THEN 1 ELSE 0 END) AS DOUBLE) FROM pred
            UNION ALL SELECT 'label_agreement', CAST(SUM(CASE WHEN p = lang THEN 1 ELSE 0 END) AS DOUBLE) FROM pred
        """,
        "ann_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT CAST(vec_id AS VARCHAR) AS metric,
                   FLOOR(list_dot_product(v, qv) /
                         (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
                         * 1e6) AS value
            FROM e, q WHERE vec_id <> 0
            ORDER BY list_dot_product(v, qv) /
                     (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "hot_bucket_cap": """
            -- closed form of the capped expansion on the constructed
            -- corpus: mega cluster 400 > cap 256 -> star m-1 = 399 pairs;
            -- 19 sub-cap clusters of 30 -> C(30,2) = 435 pairs each;
            -- one representative survives per cluster (20 total)
            SELECT 'candidates_total' AS metric,
                   CAST(399 + 19 * (30 * 29 / 2) AS DOUBLE) AS value
            UNION ALL SELECT 'mega_star_pairs', 399.0
            UNION ALL SELECT 'kept_after_dedup', 20.0
        """,
        "multimodal": """
            SELECT 'total_bytes' AS metric, CAST(SUM(strlen(text)) AS DOUBLE) AS value FROM documents
            UNION ALL SELECT 'distinct_payloads', CAST(COUNT(DISTINCT text) AS DOUBLE) FROM documents
            UNION ALL SELECT 'media_rows', CAST(COUNT(*) AS DOUBLE) FROM documents
            -- real BMP/WAV round-trip: dimensions are doc_id arithmetic,
            -- so the decode sums are exactly recomputable
            UNION ALL SELECT 'decoded_width_sum', CAST(SUM(1 + doc_id % 7) AS DOUBLE) FROM documents
            UNION ALL SELECT 'decoded_height_sum', CAST(SUM(1 + doc_id % 5) AS DOUBLE) FROM documents
            UNION ALL SELECT 'resized_width_sum', CAST(4 * COUNT(*) AS DOUBLE) FROM documents
            UNION ALL SELECT 'resized_height_sum', CAST(3 * COUNT(*) AS DOUBLE) FROM documents
            -- PNG round-trip (zlib codec): dims/channels are doc_id
            -- arithmetic (w = 1+id%8, h = 1+id%6, c = 1+id%4); palette
            -- expansion not used here. Resize target is 5x2, format kept.
            UNION ALL SELECT 'png_width_sum', CAST(SUM(1 + doc_id % 8) AS DOUBLE) FROM documents
            UNION ALL SELECT 'png_height_sum', CAST(SUM(1 + doc_id % 6) AS DOUBLE) FROM documents
            UNION ALL SELECT 'png_channels_sum', CAST(SUM(1 + doc_id % 4) AS DOUBLE) FROM documents
            UNION ALL SELECT 'png_resized_width_sum', CAST(5 * COUNT(*) AS DOUBLE) FROM documents
            -- BASELINE JPEG round-trip (T.81 codec, llm/jpeg.py): dims
            -- are doc_id arithmetic (w = 8+id%11, h = 8+id%9), decode
            -- error bound asserted in-task; resize target 6x4, JPEG out
            UNION ALL SELECT 'jpeg_width_sum', CAST(SUM(8 + doc_id % 11) AS DOUBLE) FROM documents
            UNION ALL SELECT 'jpeg_height_sum', CAST(SUM(8 + doc_id % 9) AS DOUBLE) FROM documents
            UNION ALL SELECT 'jpeg_resized_width_sum', CAST(6 * COUNT(*) AS DOUBLE) FROM documents
            UNION ALL SELECT 'prog_jpeg_width_sum', CAST(SUM(8 + doc_id % 11) AS DOUBLE) FROM documents
            UNION ALL SELECT 'prog_jpeg_exact_count', CAST(COUNT(*) AS DOUBLE) FROM documents
            -- GIF round-trip (LZW codec, llm/gif.py): dims are doc_id
            -- arithmetic (w = 2+id%9, h = 2+id%7), pixel-exact asserted
            -- in-task (alternating interlaced); resize target 5x3, GIF out
            UNION ALL SELECT 'gif_width_sum', CAST(SUM(2 + doc_id % 9) AS DOUBLE) FROM documents
            UNION ALL SELECT 'gif_height_sum', CAST(SUM(2 + doc_id % 7) AS DOUBLE) FROM documents
            UNION ALL SELECT 'gif_resized_width_sum', CAST(5 * COUNT(*) AS DOUBLE) FROM documents
            UNION ALL SELECT 'wav_frames_sum', CAST(SUM(8 + (doc_id % 9) * 4) AS DOUBLE) FROM documents
            UNION ALL SELECT 'wav_duration_ms_sum', CAST(SUM(8 + (doc_id % 9) * 4) AS DOUBLE) / 8.0 FROM documents
            UNION ALL SELECT 'wav_rates_distinct', 1.0
        """,
        "length_zeros_ratio": f"""
            SELECT 'min_len_priority' AS metric, CAST(MIN(LENGTH(o_orderpriority)) AS DOUBLE) AS value FROM orders
            UNION ALL SELECT 'max_len_priority', CAST(MAX(LENGTH(o_orderpriority)) AS DOUBLE) FROM orders
            UNION ALL SELECT 'min_len_status_filtered',
                CAST(MIN(CASE WHEN o_totalprice > 100000 THEN LENGTH(o_orderstatus) END) AS DOUBLE) FROM orders
            UNION ALL SELECT 'ratio_price_key',
                {fuzz.format("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(SUM(CAST(o_orderkey AS DECIMAL(18,2))) AS DOUBLE)")} FROM orders
            UNION ALL SELECT 'zeros_discount',
                CAST(SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
        """,
        "histogram_binned": """
            SELECT 'bin_0' AS metric, CAST(SUM(CASE WHEN l_quantity >= 0.5 AND l_quantity < 10.5 THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM lineitem
            UNION ALL SELECT 'bin_1', CAST(SUM(CASE WHEN l_quantity >= 10.5 AND l_quantity < 20.5 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'bin_2', CAST(SUM(CASE WHEN l_quantity >= 20.5 AND l_quantity < 30.5 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'bin_3', CAST(SUM(CASE WHEN l_quantity >= 30.5 AND l_quantity < 40.5 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'bin_4', CAST(SUM(CASE WHEN l_quantity >= 40.5 AND l_quantity <= 50.5 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'bins', 5.0
            -- overflow variant: edges [10.5, 20.5, 30.5] + ±Inf bins;
            -- last interior upper edge (30.5) inclusive, overflow strictly above
            UNION ALL SELECT 'ovf_bin_0', CAST(SUM(CASE WHEN l_quantity < 10.5 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'ovf_bin_1', CAST(SUM(CASE WHEN l_quantity >= 10.5 AND l_quantity < 20.5 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'ovf_bin_2', CAST(SUM(CASE WHEN l_quantity >= 20.5 AND l_quantity <= 30.5 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'ovf_bin_3', CAST(SUM(CASE WHEN l_quantity > 30.5 THEN 1 ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'ovf_bins', 4.0
            -- Sum aggregate: per-bin SUM of l_extendedprice (long cast)
            UNION ALL SELECT 'sum_bin_0', CAST(SUM(CASE WHEN l_quantity >= 0.5 AND l_quantity < 25.5 THEN CAST(FLOOR(l_extendedprice) AS BIGINT) ELSE 0 END) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'sum_bin_1', CAST(SUM(CASE WHEN l_quantity >= 25.5 AND l_quantity <= 50.5 THEN CAST(FLOOR(l_extendedprice) AS BIGINT) ELSE 0 END) AS DOUBLE) FROM lineitem
        """,
        "referential_integrity": """
            SELECT 'ri_orders_in_customer' AS metric,
                   (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders
                    WHERE o_custkey IN (SELECT c_custkey FROM customer))
                   / (SELECT COUNT(*) FROM orders) AS value
            UNION ALL
            SELECT 'ri_customer_in_orders',
                   (SELECT CAST(COUNT(*) AS DOUBLE) FROM customer
                    WHERE c_custkey IN (SELECT o_custkey FROM orders))
                   / (SELECT COUNT(*) FROM customer)
        """,
        "dataset_match": """
            SELECT 'match_ratio' AS metric,
                   CAST(SUM(CASE WHEN o_orderkey % 3 <> 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS value FROM orders
        """,
        "row_count_match": """
            SELECT 'rowcount_orders_lineitem' AS metric,
                   (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders)
                   / (SELECT COUNT(*) FROM lineitem) AS value
            UNION ALL SELECT 'schema_orders_orders', 1.0
            UNION ALL SELECT 'schema_orders_customer', 0.0
        """,
        "kll": """
            SELECT 'kll_p25_ok' AS metric, 1.0 AS value
            UNION ALL SELECT 'kll_p50_ok', 1.0
            UNION ALL SELECT 'kll_p75_ok', 1.0
            UNION ALL SELECT 'kll_mass', CAST(COUNT(l_extendedprice) AS DOUBLE) FROM lineitem
            UNION ALL SELECT 'kll_buckets', 100.0
        """,
        "embedding_near_dup": """
            WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                   list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
                   FROM n a JOIN n b ON a.vec_id < b.vec_id),
            nd AS (SELECT * FROM pairs WHERE cos >= 0.45)
            SELECT CAST(ia AS VARCHAR) || '_' || CAST(ib AS VARCHAR) AS metric,
                   FLOOR(cos * 1e6) AS value FROM nd
            UNION ALL SELECT 'near_dup_pairs', CAST(COUNT(*) AS DOUBLE) FROM nd
        """,
        "ivf_ann": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT CAST(vec_id AS VARCHAR) AS metric,
                   FLOOR(list_dot_product(v, qv) /
                         (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
                         * 1e6) AS value
            FROM e, q WHERE vec_id <> 0
            ORDER BY list_dot_product(v, qv) /
                     (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "streaming": f"""
            WITH u AS (SELECT SUM(CASE WHEN cnt = 1 THEN 1.0 ELSE 0.0 END) / SUM(cnt) AS uniq
                       FROM (SELECT COUNT(*) AS cnt FROM orders
                             WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey) f)
            SELECT 'stream_batches' AS metric, 4.0 AS value
            UNION ALL SELECT 'stream_size', CAST(COUNT(*) AS DOUBLE) FROM orders
            UNION ALL SELECT 'stream_completeness',
                CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*) FROM orders
            UNION ALL SELECT 'stream_sum_price',
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS DOUBLE) FROM orders
            UNION ALL SELECT 'stream_mean_price',
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS DOUBLE)
                / COUNT(o_totalprice) FROM orders
            UNION ALL SELECT 'stream_uniqueness_key', uniq FROM u
            UNION ALL SELECT 'stream_distinct_status',
                CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) FROM orders
        """,
        "row_level": """
            SELECT 'rows_pass' AS metric,
                   CAST(SUM(CASE WHEN l_orderkey IS NOT NULL
                                 AND l_quantity <= 10
                                 AND l_discount >= 0.02 THEN 1 ELSE 0 END) AS DOUBLE) AS value
            FROM lineitem
            UNION ALL SELECT 'rows_total', CAST(COUNT(*) AS DOUBLE) FROM lineitem
        """,
        "pipeline": """
            WITH f AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS words,
                     string_split_regex(lower(text), '\\s+') AS lwords,
                     string_split(text, chr(10)) AS lines
              FROM documents),
            q AS (
              SELECT doc_id, text FROM f WHERE
                len(words) BETWEEN 20 AND 100000
                AND (CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
                     / greatest(len(words), 1)) BETWEEN 3.0 AND 10.0
                AND (CAST(len(regexp_extract_all(text, '#'))
                          + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE)
                     / greatest(len(words), 1)) <= 0.1
                AND (CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
                     / greatest(len(lines), 1)) <= 0.9
                AND (CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE)
                     / greatest(len(lines), 1)) <= 0.3
                AND (CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                     / greatest(len(words), 1)) >= 0.8
                AND len(list_filter(['the','be','to','of','and','that','have','with'],
                                    s -> list_contains(lwords, s))) >= 1
                AND (1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                     / greatest(len(lines), 1)) <= 0.3),
            ql AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM q),
            b AS (SELECT COALESCE(list(line), []) AS bl FROM
                  (SELECT line FROM ql WHERE length(trim(line)) >= 4
                   GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2) t),
            cl AS (
              SELECT doc_id,
                     array_to_string(list_filter(string_split(q.text, chr(10)),
                                                 ln -> NOT list_contains(b.bl, ln)),
                                     chr(10)) AS text
              FROM q CROSS JOIN b),
            cne AS (SELECT * FROM cl WHERE length(text) > 0),
            e AS (SELECT MIN(doc_id) AS doc_id FROM cne
                  GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
            d AS (SELECT cne.* FROM cne JOIN e USING (doc_id)),
            toks AS (SELECT doc_id,
                            list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS t
                     FROM d),
            sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
            wins AS (SELECT doc_id, t, n,
                            unnest(range(0, greatest((n - 8 + 55) // 56, 1))) AS w
                     FROM sized),
            chunks AS (SELECT doc_id, least(n - w * 56, 64) AS ntok,
                              length(array_to_string(t[w * 56 + 1 : w * 56 + 64], ' ')) AS nchars
                       FROM wins)
            SELECT 'st_input' AS metric, CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS value
            UNION ALL SELECT 'st_quality', CAST((SELECT COUNT(*) FROM q) AS DOUBLE)
            UNION ALL SELECT 'st_boilerplate', CAST((SELECT COUNT(*) FROM cne) AS DOUBLE)
            UNION ALL SELECT 'st_exact', CAST((SELECT COUNT(*) FROM d) AS DOUBLE)
            UNION ALL SELECT 'st_chunks', CAST((SELECT COUNT(*) FROM chunks) AS DOUBLE)
            UNION ALL SELECT 'n_docs_chunked', CAST(COUNT(DISTINCT doc_id) AS DOUBLE) FROM chunks
            UNION ALL SELECT 'sum_chunk_tokens', CAST(SUM(ntok) AS DOUBLE) FROM chunks
            UNION ALL SELECT 'sum_chunk_chars', CAST(SUM(nchars) AS DOUBLE) FROM chunks
        """,
        "decontamination": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                         '\\s+'), w -> w <> '') AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 5
                          THEN list_distinct(list_transform(
                              range(1, len(t) - 3),
                              i -> array_to_string(t[i:i+4], ' ')))
                          ELSE [array_to_string(t, ' ')] END AS g
              FROM toks),
            bg AS (SELECT DISTINCT unnest(g) AS gram FROM grams
                   WHERE doc_id < 3),
            eg AS (SELECT doc_id, unnest(g) AS gram FROM grams),
            cont AS (SELECT DISTINCT doc_id FROM eg
                     WHERE gram IN (SELECT gram FROM bg))
            SELECT 'n_contaminated' AS metric,
                   CAST((SELECT COUNT(*) FROM cont) AS DOUBLE) AS value
            UNION ALL SELECT 'n_clean',
                   CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                   - CAST((SELECT COUNT(*) FROM cont) AS DOUBLE)
            UNION ALL SELECT 'contaminated_id_sum',
                   CAST(COALESCE((SELECT SUM(doc_id) FROM cont), 0) AS DOUBLE)
        """,
        "row_level_filtered": """
            WITH o AS (
              SELECT
                -- c1: Compliance, filtered (incl. where-NULL) -> TRUE
                CASE WHEN NOT (c_mktsegment = 'BUILDING') THEN TRUE
                     ELSE c_acctbal >= 0 END AS c1,
                -- c2: Compliance, FilteredRowOutcome.NULL
                CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal >= 0
                     ELSE NULL END AS c2,
                -- c3: Minimum per-row assertion (v >= 0), filtered -> TRUE
                CASE WHEN c_nationkey < 10 THEN c_acctbal >= 0
                     ELSE TRUE END AS c3,
                -- c4: MaxLength per-row assertion (len <= 17), filtered -> NULL
                CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN length(c_name) <= 17
                     ELSE NULL END AS c4,
                -- c5: windowed uniqueness over the in-scope subset,
                -- filtered -> TRUE
                CASE WHEN NOT (c_custkey <= 100) THEN TRUE
                     WHEN COUNT(CASE WHEN c_custkey <= 100 THEN 1 END)
                          OVER (PARTITION BY c_nationkey) = 1 THEN TRUE
                     ELSE FALSE END AS c5
              FROM customer)
            SELECT 'c1_true_true' AS metric,
                   CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM o
            UNION ALL SELECT 'c1_true_null',
                   CAST(SUM(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM o
            UNION ALL SELECT 'c2_null_true',
                   CAST(SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS DOUBLE) FROM o
            UNION ALL SELECT 'c2_null_null',
                   CAST(SUM(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM o
            UNION ALL SELECT 'c3_min_true',
                   CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS DOUBLE) FROM o
            UNION ALL SELECT 'c3_min_null',
                   CAST(SUM(CASE WHEN c3 IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM o
            UNION ALL SELECT 'c4_len_true',
                   CAST(SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS DOUBLE) FROM o
            UNION ALL SELECT 'c4_len_null',
                   CAST(SUM(CASE WHEN c4 IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM o
            UNION ALL SELECT 'c5_uniq_true',
                   CAST(SUM(CASE WHEN c5 THEN 1 ELSE 0 END) AS DOUBLE) FROM o
            UNION ALL SELECT 'c5_uniq_null',
                   CAST(SUM(CASE WHEN c5 IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM o
        """,
        "anomaly": """
            WITH w AS (SELECT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk,
                              COUNT(*) AS n
                       FROM events GROUP BY 1),
            o AS (SELECT wk, n, ROW_NUMBER() OVER (ORDER BY wk) - 1 AS i,
                         lag(n) OVER (ORDER BY wk) AS prev FROM w),
            mx AS (SELECT MAX(n) AS m FROM o)
            SELECT 'thresh_' || i AS metric,
                   CASE WHEN n < 0.5 * m THEN 1.0 ELSE 0.0 END AS value FROM o, mx
            UNION ALL
            SELECT 'change_' || i,
                   CASE WHEN prev IS NOT NULL AND ABS(n - prev) > 500
                        THEN 1.0 ELSE 0.0 END FROM o
            UNION ALL SELECT 'n_points', CAST(COUNT(*) AS DOUBLE) FROM o
        """,
        "sessionize": """
            WITH o AS (SELECT user_id, ts,
                              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                       FROM events),
            b AS (SELECT user_id, ts,
                         CASE WHEN prev IS NULL
                              OR epoch(ts) - epoch(prev) > 1800 THEN 1 ELSE 0 END AS brk
                  FROM o),
            s AS (SELECT user_id,
                         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) - 1 AS sid
                  FROM b),
            g AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY 1, 2)
            SELECT 'n_sessions' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM g
            UNION ALL SELECT 'max_session_events', CAST(MAX(n) AS DOUBLE) FROM g
            UNION ALL SELECT 'n_singleton_sessions',
                CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) FROM g
            UNION ALL SELECT 'n_users', CAST(COUNT(DISTINCT user_id) AS DOUBLE) FROM g
        """,
        "distance": f"""
            WITH f AS (SELECT (l_discount > 0.05) AS hi, l_returnflag AS k, COUNT(*) AS c
                       FROM lineitem GROUP BY 1, 2),
            tot AS (SELECT SUM(CASE WHEN hi THEN c END) AS na,
                           SUM(CASE WHEN NOT hi THEN c END) AS ne FROM f),
            p AS (SELECT k, SUM(CASE WHEN hi THEN c ELSE 0 END) AS ca,
                         SUM(CASE WHEN NOT hi THEN c ELSE 0 END) AS ce
                  FROM f GROUP BY k),
            m AS (SELECT
                MAX(ABS(CAST(ca AS DOUBLE)/na - CAST(ce AS DOUBLE)/ne)) AS linf,
                SUM((CAST(ca AS DOUBLE)/na - CAST(ce AS DOUBLE)/ne)
                    * LN((CAST(ca AS DOUBLE)/na)/(CAST(ce AS DOUBLE)/ne))) AS psi_v,
                SUM(POWER(ca - CAST(ce AS DOUBLE)/ne*na, 2)
                    / (CAST(ce AS DOUBLE)/ne*na)) AS chi2
              FROM p, tot)
            SELECT 'linf' AS metric, {fuzz.format("linf")} AS value FROM m
            UNION ALL SELECT 'psi', {fuzz.format("psi_v")} FROM m
            UNION ALL SELECT 'chi2', {fuzz.format("chi2")} FROM m
        """,
        "windowed": """
            WITH w AS (SELECT to_timestamp(CAST(floor(epoch(ts) / 604800) AS BIGINT) * 604800) AS ws,
                              user_id, event_type, value FROM events),
            g AS (SELECT ws, COUNT(*) AS n,
                         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
                         CAST(COUNT(user_id) AS DOUBLE) / COUNT(*) AS c,
                         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                             / COUNT(*) AS p
                  FROM w GROUP BY ws)
            SELECT 'Size_*_' || strftime(ws, '%Y-%m-%d') AS metric, CAST(n AS DOUBLE) AS value FROM g
            UNION ALL SELECT 'Sum_value_dec_' || strftime(ws, '%Y-%m-%d'), s FROM g
            UNION ALL SELECT 'Completeness_user_id_' || strftime(ws, '%Y-%m-%d'), c FROM g
            UNION ALL SELECT 'Compliance_purchase_ratio_' || strftime(ws, '%Y-%m-%d'), p FROM g
        """,
        "suggestions": _suggestions_oracle_sql(),
        "dqdl": """
            WITH m AS (SELECT COUNT(*) AS n,
                CAST(COUNT(o_orderkey) AS DOUBLE) / COUNT(*) AS compl_key,
                CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*) AS compl_cust,
                CAST(COUNT(o_totalprice) AS DOUBLE) / COUNT(*) AS compl_price,
                CAST(SUM(CASE WHEN o_orderstatus IN ('O','F') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS status_in,
                CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS price_pos,
                CAST(SUM(CASE WHEN LENGTH(o_orderpriority) BETWEEN 4 AND 16 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS len_ok,
                COUNT(DISTINCT o_orderstatus) AS n_status,
                SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS n_bad_price
                FROM orders),
            u AS (SELECT SUM(CASE WHEN cnt = 1 THEN 1.0 ELSE 0.0 END) / SUM(cnt) AS uniq
                  FROM (SELECT COUNT(*) AS cnt FROM orders
                        WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey) f)
            SELECT 'RowCount > 1000' AS metric, CASE WHEN n > 1000 THEN 1.0 ELSE 0.0 END AS value FROM m
            UNION ALL SELECT 'ColumnCount = 6', 1.0
            UNION ALL SELECT 'IsComplete "o_orderkey"', CASE WHEN compl_key = 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'IsUnique "o_orderkey"', CASE WHEN uniq = 1.0 THEN 1.0 ELSE 0.0 END FROM u
            UNION ALL SELECT 'Completeness "o_custkey" >= 1', CASE WHEN compl_cust >= 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'ColumnValues "o_orderstatus" in ["O", "F"]', CASE WHEN status_in = 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'ColumnValues "o_totalprice" > 0', CASE WHEN price_pos = 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'ColumnLength "o_orderpriority" between 4 and 16', CASE WHEN len_ok = 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'DistinctValuesCount "o_orderstatus" = 2', CASE WHEN n_status = 2 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT '(RowCount < 5) or (IsComplete "o_totalprice")',
                CASE WHEN n < 5 OR compl_price = 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'CustomSql "select count(*) from primary where o_totalprice <= 0" = 0',
                CASE WHEN n_bad_price = 0 THEN 1.0 ELSE 0.0 END FROM m
        """,
        "dqdl_extended": """
            WITH m AS (SELECT COUNT(*) AS n,
                SUM(CASE WHEN o_totalprice = 0 THEN 1 ELSE 0 END) AS zeros,
                MAX(o_totalprice) - MIN(o_totalprice) AS rng,
                quantile_cont(o_totalprice, 0.75) - quantile_cont(o_totalprice, 0.25) AS iqr,
                var_pop(o_totalprice) AS varp,
                skewness(o_totalprice) AS skew,
                kurtosis(o_totalprice) AS kurt,
                corr(o_custkey, o_totalprice) AS correl,
                AVG(o_totalprice) AS avg_tp,
                CAST(SUM(CASE WHEN (TRY_CAST(o_orderstatus AS INTEGER) IS NULL
                                    AND o_orderstatus IS NOT NULL)
                                 OR o_orderstatus IS NULL
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS not_int
                FROM orders),
            u AS (SELECT SUM(CASE WHEN cnt = 1 THEN 1.0 ELSE 0.0 END)
                             / COUNT(*) AS uvr
                  FROM (SELECT COUNT(*) AS cnt FROM orders
                        WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey) f),
            dup AS (SELECT COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0) AS dups
                    FROM (SELECT COUNT(*) AS cnt FROM orders
                          GROUP BY o_orderkey, o_custkey, o_orderstatus,
                                   o_totalprice, o_orderdate, o_orderpriority) f),
            c AS (SELECT COUNT(*) AS cust_n, AVG(c_acctbal) AS avg_bal FROM customer),
            ri AS (SELECT 1.0 - CAST((SELECT COUNT(*) FROM orders o
                                      WHERE NOT EXISTS (SELECT 1 FROM customer c2
                                                        WHERE c2.c_custkey = o.o_custkey))
                                     AS DOUBLE) / (SELECT COUNT(*) FROM orders) AS frac)
            SELECT 'ZerosCount "o_totalprice" = 0' AS metric,
                   CASE WHEN zeros = 0 THEN 1.0 ELSE 0.0 END AS value FROM m
            UNION ALL SELECT 'UniqueValueRatio "o_orderkey" = 1',
                   CASE WHEN uvr = 1.0 THEN 1.0 ELSE 0.0 END FROM u
            UNION ALL SELECT 'Range "o_totalprice" > 0',
                   CASE WHEN rng > 0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'InterquartileRange "o_totalprice" > 0',
                   CASE WHEN iqr > 0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'Variance "o_totalprice" > 1',
                   CASE WHEN varp > 1 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'Skewness "o_totalprice" between -10 and 10',
                   CASE WHEN skew BETWEEN -10 AND 10 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'Kurtosis "o_totalprice" between -10 and 10',
                   CASE WHEN kurt BETWEEN -10 AND 10 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'ColumnCorrelation "o_custkey" "o_totalprice" between -1 and 1',
                   CASE WHEN correl BETWEEN -1 AND 1 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'DuplicateRowCount = 0',
                   CASE WHEN dups = 0 THEN 1.0 ELSE 0.0 END FROM dup
            UNION ALL SELECT 'ColumnDataType "o_orderstatus" != "INTEGER"',
                   CASE WHEN not_int = 1.0 THEN 1.0 ELSE 0.0 END FROM m
            UNION ALL SELECT 'RowCountMatch "customer" > 1',
                   CASE WHEN CAST(n AS DOUBLE) / cust_n > 1 THEN 1.0 ELSE 0.0 END FROM m, c
            UNION ALL SELECT 'ReferentialIntegrity "o_custkey" "customer.{c_custkey}" = 1',
                   CASE WHEN frac = 1.0 THEN 1.0 ELSE 0.0 END FROM ri
            UNION ALL SELECT 'DatasetMatch "ordersref" "o_orderkey->o_orderkey" = 1', 1.0
            UNION ALL SELECT 'AggregateMatch "avg(o_totalprice)" "avg(customer.c_acctbal)" > 1',
                   CASE WHEN avg_tp / avg_bal > 1 THEN 1.0 ELSE 0.0 END FROM m, c
        """,
        "profile": f"""
            WITH s AS (SELECT COUNT(c_acctbal) AS n, AVG(c_acctbal) AS mu,
                       SUM((c_acctbal - (SELECT AVG(c_acctbal) FROM customer)) ^ 2) AS m2
                       FROM customer)
            SELECT 'prof_completeness' AS metric,
                   CAST(COUNT(c_acctbal) AS DOUBLE) / COUNT(*) AS value FROM customer
            UNION ALL SELECT 'prof_min', CAST(MIN(c_acctbal) AS DOUBLE) FROM customer
            UNION ALL SELECT 'prof_max', CAST(MAX(c_acctbal) AS DOUBLE) FROM customer
            UNION ALL SELECT 'prof_mean', {fuzz.format("mu")} FROM s
            UNION ALL SELECT 'prof_stddev', {fuzz.format("SQRT(m2 / n)")} FROM s
            UNION ALL SELECT 'prof_seg_complete',
                CAST(COUNT(c_mktsegment) AS DOUBLE) / COUNT(*) FROM customer
            UNION ALL SELECT 'prof_seg_bins',
                CAST(COUNT(DISTINCT c_mktsegment) AS DOUBLE) FROM customer
        """,
        "language_id_trigram": _language_id_trigram_oracle_sql(),
        "ivf_index_disk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT CAST(vec_id AS VARCHAR) AS metric,
                   FLOOR(list_dot_product(v, qv) /
                         (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
                         * 1e6) AS value
            FROM e, q WHERE vec_id <> 0
            ORDER BY list_dot_product(v, qv) /
                     (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "lsh_ann_contract": """
            SELECT * FROM (VALUES
                ('lsh_bucket_prunes', 1.0),
                ('lsh_cosines_bit_exact', 1.0),
                ('lsh_equals_bucket_bruteforce', 1.0)
            ) AS t(metric, value)
        """,
        "gopher_quality": _GOPHER_ORACLE_SQL,
        "audio_ops": _AUDIO_OPS_ORACLE_SQL,
        "media_probe": _MEDIA_PROBE_ORACLE_SQL,
        "lm_score": _LM_SCORE_ORACLE_SQL,
        "bm25_search": _BM25_ORACLE_SQL,
        "semantic_dedup": _SEMANTIC_DEDUP_ORACLE,
        "paragraph_dedup": _PARAGRAPH_DEDUP_ORACLE,
        "corpus_drift": _CORPUS_DRIFT_ORACLE,
        "span_dedup": _SPAN_DEDUP_ORACLE,
        "video_frames": _VIDEO_FRAMES_ORACLE,
        "streaming_drift": _STREAMING_DRIFT_ORACLE,
        "near_dup_ratio": _NEAR_DUP_RATIO_ORACLE,
        "dsir_sample": _DSIR_ORACLE,
        "bpe_stats": _BPE_STATS_ORACLE,
        "text_normalize": _TEXT_NORMALIZE_ORACLE_SQL,
        "url_ops": _URL_OPS_ORACLE_SQL,
        "skew_report": _SKEW_REPORT_ORACLE_SQL,
        "asof_join": _ASOF_JOIN_ORACLE_SQL,
        "interval_join": _INTERVAL_JOIN_ORACLE_SQL,
        "robust_stats": _ROBUST_STATS_ORACLE_SQL,
        "doc_vectors": _DOC_VECTORS_ORACLE_SQL,
        "scale_utils": _SCALE_UTILS_ORACLE_SQL,
        "quality_score": _QUALITY_SCORE_ORACLE_SQL,
        "semantic_decon": _SEMANTIC_DECON_ORACLE_SQL,
        "char_dedup": _CHAR_DEDUP_ORACLE_SQL,
        "bpe_ids": _BPE_IDS_ORACLE_SQL,
        "bpe_merges": _BPE_MERGES_ORACLE_SQL,
        "bpe_train": _BPE_TRAIN_ORACLE_SQL,
        "anomaly_gate": _ANOMALY_GATE_ORACLE_SQL,
        "mp3_profile": _MP3_PROFILE_ORACLE_SQL,
        "gif_frames": _GIF_FRAMES_ORACLE_SQL,
        "mp4_profile": _MP4_PROFILE_ORACLE_SQL,
        "id3_tags": _ID3_TAGS_ORACLE_SQL,
        "warc_cdx": _WARC_CDX_ORACLE_SQL,
        "wds_index": _WDS_INDEX_ORACLE_SQL,
        "cdx_update": _CDX_UPDATE_ORACLE_SQL,
        "keyframe_seek": _KEYFRAME_SEEK_ORACLE_SQL,
        "readability": _READABILITY_ORACLE_SQL,
        "token_mixture": _TOKEN_MIXTURE_ORACLE_SQL,
        "url_quality": _URL_QUALITY_ORACLE_SQL,
        "embedding_quantize": _EMBEDDING_QUANTIZE_ORACLE_SQL,
        "robots_filter": _ROBOTS_FILTER_ORACLE_SQL,
        "c4_filters": _C4_FILTERS_ORACLE_SQL,
        "webdataset": _WEBDATASET_ORACLE_SQL,
        "html_extract": _HTML_EXTRACT_ORACLE_SQL,
        "link_graph": _LINK_GRAPH_ORACLE_SQL,
        "sitemap_ops": _SITEMAP_OPS_ORACLE_SQL,
        "warc_ingest": _WARC_INGEST_ORACLE_SQL,
        "incremental_dedup": _INCREMENTAL_DEDUP_ORACLE_SQL,
        "rolling_stats": _ROLLING_STATS_ORACLE_SQL,
        "table_diff": _TABLE_DIFF_ORACLE_SQL,
        "missingness": _MISSINGNESS_ORACLE_SQL,
        "join_cardinality": _JOIN_CARDINALITY_ORACLE_SQL,
        "functional_dependency": _FD_ORACLE_SQL,
        "benford": _BENFORD_ORACLE_SQL,
        "sliced_analysis": _SLICED_ANALYSIS_ORACLE_SQL,
        "ngram_novelty": _NGRAM_NOVELTY_ORACLE_SQL,
        "image_phash": _IMAGE_PHASH_ORACLE_SQL,
        "audio_phash": _AUDIO_PHASH_ORACLE_SQL,
        "grouped_topk": _GROUPED_TOPK_ORACLE_SQL,
        "token_stats": _TOKEN_STATS_ORACLE_SQL,
        "sequence_packing": _SEQUENCE_PACKING_ORACLE_SQL,
        "corpus_sampling": _CORPUS_SAMPLING_ORACLE_SQL,
        "repetition": _repetition_oracle_sql(),
        "chunking": _CHUNKING_ORACLE_SQL,
        "embedding_quality": _EMBEDDING_QUALITY_ORACLE_SQL,
        "boilerplate": _BOILERPLATE_ORACLE_SQL,
        "winnowing": _WINNOWING_ORACLE_SQL,
        "custom_aggregator": """
            WITH c AS (SELECT l_returnflag AS f, CAST(COUNT(*) AS DOUBLE) AS n
                       FROM lineitem GROUP BY l_returnflag)
            SELECT 'cnt_' || f AS metric, n AS value FROM c
            UNION ALL SELECT 'merged_cnt_' || f, n FROM c
        """,
        "schema_validation": """
            WITH v AS (SELECT *,
                (o_orderpriority IS NOT NULL
                 AND regexp_matches(o_orderpriority, '^[1-3]-')
                 AND o_custkey IS NOT NULL
                 AND TRY_CAST(o_custkey AS INTEGER) IS NOT NULL
                 AND TRY_CAST(o_custkey AS INTEGER) >= 1
                 AND o_totalprice IS NOT NULL
                 AND TRY_CAST(o_totalprice AS DECIMAL(12,2)) IS NOT NULL
                 AND (o_orderstatus IS NULL OR LENGTH(o_orderstatus) <= 1))
                AS ok FROM orders)
            SELECT 'num_valid' AS metric,
                   CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM v
            UNION ALL SELECT 'num_invalid',
                   CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS DOUBLE) FROM v
            UNION ALL SELECT 'valid_ncols', 4.0
            UNION ALL SELECT 'valid_custkey_sum',
                   CAST(SUM(CASE WHEN ok THEN TRY_CAST(o_custkey AS INTEGER) END) AS DOUBLE) FROM v
            UNION ALL SELECT 'valid_totalprice_sum',
                   CAST(SUM(CASE WHEN ok THEN TRY_CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) FROM v
        """,
        "applicability": """
            SELECT * FROM (VALUES
                ('Completeness_name', 1.0),
                ('Mean_qty', 1.0),
                ('Mean_name_string', 0.0),
                ('Minimum_price', 1.0),
                ('Maximum_missing_col', 0.0),
                ('Compliance_qty', 1.0),
                ('check_failed_assertion_still_applicable', 1.0),
                ('check_mean_on_string_inapplicable', 0.0)
            ) AS t(metric, value)
        """,
        "repository": """
            WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
                              CAST(COUNT(n_name) AS DOUBLE) / COUNT(*) AS c
                       FROM nation),
                 r AS (SELECT CAST(COUNT(*) AS DOUBLE) AS rn FROM region)
            SELECT 'k1_size' AS metric, nn AS value FROM n
            UNION ALL SELECT 'k1_completeness_n_name', c FROM n
            UNION ALL SELECT 'k2_size', rn FROM r
            UNION ALL SELECT 'n_entries_after_1500', 1.0
            UNION ALL SELECT 'after_entry_size', rn FROM r
            UNION ALL SELECT 'n_entries_tag_env_test', 1.0
            UNION ALL SELECT 'tagged_entry_date', 1000.0
        """,
    }
    # fold component oracles into the composite driver-gate queries
    # (mirrors the q_*_ops composites above — metric names stay disjoint)
    d["text_pipeline_ops"] = _union_oracles(
        d.pop("gopher_quality"), d.pop("repetition"), d.pop("chunking"),
        d.pop("boilerplate"), d.pop("winnowing"))
    d["satellite_ops"] = _union_oracles(
        d.pop("schema_validation"), d.pop("applicability"),
        d.pop("repository"), d.pop("custom_aggregator"))
    from deequ_spark.llm.packing import _fraction_threshold
    _t_train = _fraction_threshold(0.8)
    _t_val = _fraction_threshold(0.8 + 0.1)
    d["assign_split"] = f"""
        SELECT CASE WHEN substr(md5(source || ''), 1, 8) < '{_t_train}'
                        THEN 'train'
                    WHEN substr(md5(source || ''), 1, 8) < '{_t_val}'
                        THEN 'val'
                    ELSE 'test' END AS split,
               CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_groups
        FROM documents GROUP BY 1
    """
    d["embedding_ops"] = _union_oracles(
        d.pop("embedding_quality"), d.pop("lsh_ann_contract"))
    d["comparison_ops"] = _union_oracles(
        d.pop("referential_integrity"), d.pop("dataset_match"),
        d.pop("row_count_match"))
    d["language_id"] = _union_oracles(
        d["language_id"],
        "SELECT 'tg_' || metric AS metric, value FROM (\n"
        f"{d.pop('language_id_trigram')}\n) AS tg")
    d["ivf_ann"] = _union_oracles(
        d["ivf_ann"],
        "SELECT 'disk_' || metric AS metric, value FROM (\n"
        f"{d.pop('ivf_index_disk')}\n) AS dk")
    d["bloom_join"] = """
        WITH urgent AS (SELECT o_orderkey FROM orders
                        WHERE o_orderpriority = '1-URGENT'),
        matched AS (SELECT * FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM urgent))
        SELECT 'bj_semi_' || l_returnflag || '_n' AS metric,
               CAST(COUNT(*) AS DOUBLE) AS value FROM matched
        GROUP BY l_returnflag
        UNION ALL
        SELECT 'bj_semi_' || l_returnflag || '_qty',
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) FROM matched
        GROUP BY l_returnflag
        UNION ALL
        SELECT 'bj_anti_n', CAST(COUNT(*) AS DOUBLE) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM urgent)
        UNION ALL
        SELECT 'bj_no_false_negatives', CAST(1 AS DOUBLE)
    """
    d["bloom_skipping"] = """
        SELECT metric, value FROM (
          SELECT 'bs_k' || k || '_rows' AS metric,
                 CAST(COUNT(o_orderkey) AS DOUBLE) AS value
          FROM (VALUES (7), (451), (1202)) keys(k)
          LEFT JOIN orders ON o_custkey = k GROUP BY k
          UNION ALL
          SELECT 'bs_k' || k || '_cents',
                 CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                        AS BIGINT)), 0) AS DOUBLE)
          FROM (VALUES (7), (451), (1202)) keys(k)
          LEFT JOIN orders ON o_custkey = k GROUP BY k
          UNION ALL SELECT 'bs_minmax_useless', CAST(1 AS DOUBLE)
          UNION ALL SELECT 'bs_bloom_prunes', CAST(1 AS DOUBLE)
        ) ORDER BY metric
    """
    d["optimize_corpus"] = """
        SELECT metric, value FROM (
          SELECT 'oc_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
          FROM orders
          UNION ALL SELECT 'oc_cents',
            CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS DOUBLE) FROM orders
          UNION ALL SELECT 'oc_keys',
            CAST(SUM(o_orderkey) AS DOUBLE) FROM orders
          UNION ALL SELECT 'oc_pruned_rows',
            CAST(SUM(CASE WHEN o_custkey BETWEEN 100 AND 300
                     THEN 1 ELSE 0 END) AS DOUBLE) FROM orders
          UNION ALL SELECT 'oc_eq_rows',
            CAST(SUM(CASE WHEN o_custkey = 451 THEN 1 ELSE 0 END)
                 AS DOUBLE) FROM orders
          UNION ALL SELECT 'oc_files_reduced', CAST(1 AS DOUBLE)
          UNION ALL SELECT 'oc_all_clustered', CAST(1 AS DOUBLE)
          UNION ALL SELECT 'oc_skipping_works', CAST(1 AS DOUBLE)
          UNION ALL SELECT 'oc_converges_to_noop', CAST(1 AS DOUBLE)
        ) ORDER BY metric
    """
    d["compaction"] = """
        SELECT metric, value FROM (
          SELECT 'cp_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
          FROM orders
          UNION ALL SELECT 'cp_cents',
            CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS DOUBLE) FROM orders
          UNION ALL SELECT 'cp_keys',
            CAST(SUM(o_orderkey) AS DOUBLE) FROM orders
          UNION ALL SELECT 'cp_pruned_rows',
            CAST(SUM(CASE WHEN o_custkey BETWEEN 100 AND 300
                     THEN 1 ELSE 0 END) AS DOUBLE) FROM orders
          UNION ALL SELECT 'cp_files_reduced', CAST(1 AS DOUBLE)
          UNION ALL SELECT 'cp_idempotent', CAST(1 AS DOUBLE)
        ) ORDER BY metric
    """
    _HILBERT_SQL = """
        WITH RECURSIVE bnds AS (SELECT
            MIN(CAST(o_custkey AS DOUBLE)) AS mnx,
            MAX(CAST(o_custkey AS DOUBLE)) AS mxx,
            MIN(CAST(o_totalprice AS DOUBLE)) AS mny,
            MAX(CAST(o_totalprice AS DOUBLE)) AS mxy
            FROM orders),
        grid AS (SELECT o_orderkey,
            LEAST(GREATEST(CAST(FLOOR((CAST(o_custkey AS DOUBLE) - mnx)
                / (mxx - mnx) * 255.0) AS BIGINT), 0), 255) AS x,
            LEAST(GREATEST(CAST(FLOOR((CAST(o_totalprice AS DOUBLE) - mny)
                / (mxy - mny) * 255.0) AS BIGINT), 0), 255) AS y
            FROM orders, bnds),
        walk AS (
            SELECT o_orderkey, x, y, CAST(0 AS BIGINT) AS d, 7 AS lvl
            FROM grid
            UNION ALL
            SELECT o_orderkey,
                   CASE WHEN ry = 0 THEN yf ELSE xf END,
                   CASE WHEN ry = 0 THEN xf ELSE yf END,
                   d + s * s * xor(3 * rx, ry),
                   lvl - 1
            FROM (
                SELECT o_orderkey, d, lvl, s, rx, ry,
                       CASE WHEN ry = 0 AND rx = 1
                            THEN 255 - x ELSE x END AS xf,
                       CASE WHEN ry = 0 AND rx = 1
                            THEN 255 - y ELSE y END AS yf
                FROM (
                    SELECT o_orderkey, x, y, d, lvl,
                           (CAST(1 AS BIGINT) << lvl) AS s,
                           CASE WHEN (x & (CAST(1 AS BIGINT) << lvl)) > 0
                                THEN 1 ELSE 0 END AS rx,
                           CASE WHEN (y & (CAST(1 AS BIGINT) << lvl)) > 0
                                THEN 1 ELSE 0 END AS ry
                    FROM walk WHERE lvl >= 0
                ) raw
            ) rot
        )
        SELECT o_orderkey, 'h' AS curve, CAST(d AS DOUBLE) AS key
        FROM walk WHERE lvl = -1
    """
    # 3D Skilling transpose walk (layout.hilbert_key_nd, bits=6):
    # inverse-undo levels lvl=5..1 as a recursive CTE whose step nests
    # the SEQUENTIAL i=0,1,2 coordinate updates as subqueries (i=0
    # simplifies: t=(x0^x0)&P=0, only the x0&Q branch acts), then
    # Gray-encode + rotation-correction + bit-interleave closed-form.
    _B3 = 6
    _interleave3 = " + ".join(
        f"((((f{i} >> {q}) & 1)) << {q * 3 + (2 - i)})"
        for q in range(_B3) for i in range(3))
    _rot_t3 = "0"
    for lvl in range(_B3 - 1, 0, -1):
        _rot_t3 = (f"xor(CAST({_rot_t3} AS BIGINT), "
                   f"CASE WHEN (g2 & {1 << lvl}) > 0 "
                   f"THEN CAST({(1 << lvl) - 1} AS BIGINT) "
                   f"ELSE CAST(0 AS BIGINT) END)")
    _top3 = float((1 << _B3) - 1)
    _HILBERT3_SQL = f"""
        WITH RECURSIVE bnds3 AS (SELECT
            MIN(CAST(o_custkey AS DOUBLE)) AS mn0,
            MAX(CAST(o_custkey AS DOUBLE)) AS mx0,
            MIN(CAST(o_totalprice AS DOUBLE)) AS mn1,
            MAX(CAST(o_totalprice AS DOUBLE)) AS mx1,
            MIN(CAST(o_orderkey AS DOUBLE)) AS mn2,
            MAX(CAST(o_orderkey AS DOUBLE)) AS mx2
            FROM orders),
        grid3 AS (SELECT o_orderkey,
            LEAST(GREATEST(CAST(FLOOR((CAST(o_custkey AS DOUBLE) - mn0)
                / (mx0 - mn0) * {_top3}) AS BIGINT), 0),
                {(1 << _B3) - 1}) AS x0,
            LEAST(GREATEST(CAST(FLOOR((CAST(o_totalprice AS DOUBLE) - mn1)
                / (mx1 - mn1) * {_top3}) AS BIGINT), 0),
                {(1 << _B3) - 1}) AS x1,
            LEAST(GREATEST(CAST(FLOOR((CAST(o_orderkey AS DOUBLE) - mn2)
                / (mx2 - mn2) * {_top3}) AS BIGINT), 0),
                {(1 << _B3) - 1}) AS x2
            FROM orders, bnds3),
        undo3 AS (
            SELECT o_orderkey, x0, x1, x2, {_B3 - 1} AS lvl FROM grid3
            UNION ALL
            SELECT o_orderkey,
                CASE WHEN (x2 & q) > 0 THEN xor(a0, q - 1)
                     ELSE xor(a0, xor(a0, x2) & (q - 1)) END,
                b1,
                CASE WHEN (x2 & q) > 0 THEN x2
                     ELSE xor(x2, xor(a0, x2) & (q - 1)) END,
                lvl - 1
            FROM (
                SELECT o_orderkey, lvl, q, x2,
                    CASE WHEN (x1 & q) > 0 THEN xor(p0, q - 1)
                         ELSE xor(p0, xor(p0, x1) & (q - 1)) END AS a0,
                    CASE WHEN (x1 & q) > 0 THEN x1
                         ELSE xor(x1, xor(p0, x1) & (q - 1)) END AS b1
                FROM (
                    SELECT o_orderkey, lvl, q,
                        CASE WHEN (x0 & q) > 0 THEN xor(x0, q - 1)
                             ELSE x0 END AS p0,
                        x1, x2
                    FROM (SELECT o_orderkey, x0, x1, x2, lvl,
                                 (CAST(1 AS BIGINT) << lvl) AS q
                          FROM undo3 WHERE lvl >= 1) raw3
                ) s0
            ) s1
        ),
        fin3 AS (
            SELECT o_orderkey, g0, g1, g2, {_rot_t3} AS t
            FROM (SELECT o_orderkey, x0 AS g0, xor(x0, x1) AS g1,
                         xor(xor(x0, x1), x2) AS g2
                  FROM undo3 WHERE lvl = 0) gr
        )
        SELECT o_orderkey, 'h3' AS curve,
               CAST({_interleave3} AS DOUBLE) AS key
        FROM (SELECT o_orderkey, xor(g0, t) AS f0, xor(g1, t) AS f1,
                     xor(g2, t) AS f2 FROM fin3) ff
    """
    d["layout_ops"] = _union_oracles(
        "SELECT o_orderkey, 'z' AS curve, z AS key FROM (\n"
        + d.pop("zorder_layout") + "\n) AS zz",
        _HILBERT_SQL, _HILBERT3_SQL)
    # r11 registry consolidation: compose the folded families' oracles
    # from the SAME parts the Spark composites union — part metric
    # names are disjoint within each composite, so attribution survives
    for comp, parts in {**_R11_FOLDS, **_R12_FOLDS}.items():
        sqls = []
        for part in parts:
            sql = d.pop(part)
            pfx = {**_R11_PART_PREFIX,
                   **_R12_PART_PREFIX}.get((comp, part))
            if pfx:
                sql = (f"SELECT '{pfx}' || metric AS metric, value "
                       f"FROM (\n{sql}\n) AS pfx_{part}")
            sqls.append(sql)
        d[comp] = _union_oracles(*sqls)
    return d


# r11 composite -> folded part queries (order matches the q_*_ops
# _union_metrics order; both sides are order-insensitive under the
# driver's sorted-hash compare)
# parts whose metric names would collide with a sibling get a prefix,
# applied identically on the Spark (_prefix_metrics) and oracle sides
_R11_PART_PREFIX = {
    ("ann_ops", "ivf_ann"): "ivf_",
    ("media_feature_ops", "audio_ops"): "au_",
}

# r12 fold: the four BPE queries (driver-green r10) collapse into one
# family composite so the rotated-in r10 window plus this round's new
# queries still fit one 50-slot driver window
_R12_FOLDS = {
    "bpe_ops": ["bpe_stats", "bpe_train", "bpe_merges", "bpe_ids"],
}
_R12_PART_PREFIX = {
    ("bpe_ops", "bpe_train"): "tr_",
    ("bpe_ops", "bpe_merges"): "mg_",
    ("bpe_ops", "bpe_ids"): "id_",
}

_R11_FOLDS = {
    "scan_basic_ops": ["size", "completeness", "compliance",
                       "pattern_match"],
    "scan_stats_ops": ["min_max", "sum_mean", "moments", "quantiles"],
    "scan_sketch_ops": ["approx_count_distinct", "approx_quantile",
                        "kll", "datatype"],
    "grouping_core_ops": ["uniqueness", "entropy", "duplicate_rows",
                          "mutual_information"],
    "histogram_ops": ["histogram", "histogram_binned",
                      "length_zeros_ratio"],
    "dqdl_ops": ["dqdl", "dqdl_extended"],
    "row_level_ops": ["row_level", "row_level_filtered"],
    "check_flow_ops": ["verification", "windowed", "pipeline"],
    "drift_anomaly_ops": ["distance", "anomaly"],
    "text_filter_ops": ["text_quality", "pii", "lm_score"],
    "lexical_dedup_ops": ["exact_dedup", "jaccard_dedup", "minhash_lsh",
                          "hot_bucket_cap"],
    "media_feature_ops": ["multimodal", "media_probe", "audio_ops"],
    "ann_ops": ["ann_topk", "ivf_ann", "embedding_near_dup"],
    "stream_ops": ["streaming", "sessionize"],
}
