"""Regression tests pinning the round-3 fixes.

Each test guards a specific fix that shipped without coverage:
* deduplicate_near no longer forces a broadcast of the loser set
  (a web-scale corpus has corpus-sized losers — forced broadcast OOMs).
* knn_join survives zero-norm query AND corpus vectors (NaN, not crash).
* suggestions._round2 keeps BigDecimal(repr) semantics (0.30 stays 0.30).
* minhash_lsh_pairs releases its candidate cache — repeated calls must
  not grow the persistent-RDD registry.
"""

import contextlib

import pytest
from pyspark.sql import functions as F

from deequ_spark.llm.dedup import deduplicate_near, minhash_lsh_pairs
from deequ_spark.llm.similarity import knn_join
from deequ_spark.suggestions import _round2


@contextlib.contextmanager
def spark_conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_deduplicate_near_does_not_force_broadcast(spark):
    """With autoBroadcastJoinThreshold=-1 the planner never broadcasts on
    its own, so a BroadcastHashJoin in the plan could only come from a
    forced F.broadcast hint — the r2 scale-killer this pins as removed."""
    docs = spark.range(0, 5000).select(
        F.col("id"), F.concat(F.lit("doc"), F.col("id")).alias("text"))
    # every odd id is a near-dup of the preceding even id → 2500 losers
    pairs = (spark.range(0, 5000, 2)
             .select(F.col("id").alias("id_a"),
                     (F.col("id") + 1).alias("id_b")))
    with spark_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), \
            spark_conf(spark, "spark.sql.adaptive.enabled", "false"):
        kept = deduplicate_near(docs, "id", pairs)
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, (
            "deduplicate_near must not force-broadcast the loser set")
        assert kept.count() == 2500


def test_knn_join_zero_norm_vectors_yield_nan(spark):
    """Zero-norm vectors on either side must produce NaN cosines (the JVM
    x/0.0 semantics), never a ZeroDivisionError inside the Arrow UDF."""
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])],           # q2 is zero-norm
        "qid long, vec array<double>")
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.0, 0.0])],
        "cid long, vec array<double>")
    rows = knn_join(queries, corpus, "qid", "cid", "vec", k=3).collect()
    assert len(rows) == 6                              # 2 queries × 3 rows
    import math

    def undefined(c):       # NaN crosses Arrow as NULL; accept either
        return c is None or math.isnan(c)

    zero_cosines = [r["cosine"] for r in rows if r["qid"] == 2]
    assert zero_cosines and all(undefined(c) for c in zero_cosines)
    q1 = {r["cid"]: r["cosine"] for r in rows if r["qid"] == 1}
    assert q1[10] == pytest.approx(1.0)
    assert q1[11] == pytest.approx(0.0)
    assert undefined(q1[12])                           # zero-norm corpus row


def test_round2_bigdecimal_repr_parity():
    """Decimal(repr(v)) parity: 0.30 is 0.29999… in binary — naive
    Decimal(float) would truncate DOWN to 0.29."""
    assert _round2(0.30, up=False) == 0.30
    assert _round2(0.30, up=True) == 0.30
    assert _round2(0.299, up=False) == 0.29
    assert _round2(0.291, up=True) == 0.30
    assert _round2(0.1 + 0.2, up=False) == 0.30


def test_minhash_lsh_pairs_releases_candidate_cache(spark):
    """Two sequential minhash_lsh_pairs calls (results fully consumed)
    must not accumulate CacheManager entries: the candidate persist is
    explicitly unpersisted before return, so only ContextCleaner-managed
    localCheckpoint blocks remain."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog number %d" % (i % 5))
         for i in range(40)],
        "id long, text string")

    def cached_rdd_count():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    def cache_manager_empty():
        return spark._jsparkSession.sharedState().cacheManager().isEmpty()

    # other tests may legitimately leave session-scoped caches behind
    # (e.g. prepare_training_corpus returns its final frame persisted);
    # this test asserts minhash adds NOTHING, so start from a clean slate
    spark.catalog.clearCache()

    minhash_lsh_pairs(docs, "id", "text", threshold=0.5).collect()
    after_first = cached_rdd_count()
    assert cache_manager_empty(), (
        "minhash_lsh_pairs left its candidate DataFrame in the CacheManager")
    minhash_lsh_pairs(docs, "id", "text", threshold=0.5).collect()
    after_second = cached_rdd_count()
    assert cache_manager_empty()
    # localCheckpoint blocks are ContextCleaner-reclaimed (async), so allow
    # at most the second call's own checkpoint to still be registered
    assert after_second <= after_first + 1, (
        f"persistent RDDs grew {after_first} -> {after_second}")
