"""SemDeDup-style semantic dedup (deequ_spark/llm/semdedup.py).

Pattern from Abbas et al., arXiv:2303.09540 — cluster-scoped exact
pair search + keep-the-outlier rule. No reference-engine counterpart;
extends the LLM-pipeline dedup family.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deequ_spark.llm import (assign_clusters, near_duplicate_components,
                             semantic_deduplicate, semantic_duplicate_pairs)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def two_cluster_df(spark):
    """ids 0-2: near-identical (cosine ≈ 0.999) around base0; ids 3-9:
    scattered around base1 (pairwise cosine well under 0.95)."""
    rng = np.random.default_rng(7)
    base0, base1 = _unit(rng.standard_normal(8)), None
    base1 = _unit(-base0 + 0.1 * rng.standard_normal(8))
    rows = [(i, [float(x) for x in base0 + 0.01 * rng.standard_normal(8)])
            for i in range(3)]
    rows += [(i, [float(x) for x in base1 + 0.6 * rng.standard_normal(8)])
             for i in range(3, 10)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    cents = [[float(x) for x in base0], [float(x) for x in base1]]
    return df, cents


class TestAssignClusters:
    def test_assignment_and_similarity(self, spark, two_cluster_df):
        df, cents = two_cluster_df
        out = {r["id"]: (r["cluster"], r["centroid_sim"])
               for r in assign_clusters(df, "vec", cents).collect()}
        for i in range(3):
            assert out[i][0] == 0
            assert out[i][1] > 0.99
        # independent recomputation of one similarity
        row = df.where("id = 0").collect()[0]["vec"]
        exp = float(_unit(row) @ _unit(cents[0]))
        assert out[0][1] == pytest.approx(exp, rel=1e-12)

    def test_drops_null_and_wrong_dims(self, spark):
        rows = [(0, [1.0] * 4), (1, None), (2, [1.0] * 3)]
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        out = assign_clusters(df, "vec", [[1.0, 0.0, 0.0, 0.0]])
        assert [r["id"] for r in out.collect()] == [0]


class TestSemanticPairs:
    def test_finds_within_cluster_dups(self, two_cluster_df):
        df, cents = two_cluster_df
        pairs = semantic_duplicate_pairs(df, "id", "vec", threshold=0.95,
                                         centroids=cents)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == {(0, 1), (0, 2), (1, 2)}

    def test_cosines_are_exact(self, two_cluster_df):
        df, cents = two_cluster_df
        vecs = {r["id"]: r["vec"] for r in df.collect()}
        pairs = semantic_duplicate_pairs(df, "id", "vec", threshold=0.95,
                                         centroids=cents).collect()
        for r in pairs:
            exp = float(_unit(vecs[r["id_a"]]) @ _unit(vecs[r["id_b"]]))
            assert r["cosine"] == pytest.approx(exp, rel=1e-12)

    def test_block_size_invariance(self, two_cluster_df):
        df, cents = two_cluster_df
        a = semantic_duplicate_pairs(df, "id", "vec", 0.95, cents,
                                     block_rows=2).collect()
        b = semantic_duplicate_pairs(df, "id", "vec", 0.95, cents,
                                     block_rows=1024).collect()
        key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
        assert sorted(map(key, a)) == sorted(map(key, b))

    def test_refinement_keeps_planted_dups(self, spark):
        """A hot cluster of DISTINCT vectors is split by signature
        refinement, but planted near-identical pairs share signatures,
        so they survive the split."""
        rng = np.random.default_rng(11)
        base = _unit(rng.standard_normal(16))
        rows = [(i, [float(x) for x in
                     _unit(base + 0.4 * rng.standard_normal(16))])
                for i in range(600)]
        # plant 3 dups of row 600 at the end
        dup = _unit(base + 0.4 * rng.standard_normal(16))
        for i in range(600, 603):
            rows.append((i, [float(x) for x in
                             _unit(dup + 1e-4 * rng.standard_normal(16))]))
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        pairs = semantic_duplicate_pairs(
            df, "id", "vec", threshold=0.999,
            centroids=[[float(x) for x in base]],
            max_cluster_rows=128, n_bands=2).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert {(600, 601), (600, 602), (601, 602)} <= got

    def test_mega_cluster_min_partner_bound(self, spark):
        """A group refinement cannot split (near-identical vectors share
        every signature) emits O(m) min-partner edges whose components
        equal the full graph's: m copies -> exactly m-1 edges after the
        cross-band dedup, one component covering all m ids."""
        rng = np.random.default_rng(5)
        base = _unit(rng.standard_normal(8))
        m = 600
        rows = [(i, [float(x) for x in
                     _unit(base + 1e-5 * rng.standard_normal(8))])
                for i in range(m)]
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        pairs = semantic_duplicate_pairs(
            df, "id", "vec", threshold=0.999,
            centroids=[[float(x) for x in base]],
            max_cluster_rows=128, hot_group_cap=128, n_bands=2)
        n = pairs.count()
        assert n == m - 1, f"min-partner edges {n} != {m - 1}"
        comp = near_duplicate_components(pairs)
        assert comp.select("component").distinct().count() == 1
        assert comp.count() == m

    def test_pairs_stay_within_clusters(self, spark):
        """Cluster-scoping is the SemDeDup contract: a cross-cluster
        high-cosine pair is NOT emitted (the global LSH operator covers
        that regime)."""
        # two vectors with cosine ~0.98 but assigned to different
        # centroids (each centroid IS one of the vectors)
        a = _unit(np.ones(4))
        b = _unit(np.array([1.0, 1.0, 1.0, 0.8]))
        df = spark.createDataFrame(
            [(0, [float(x) for x in a]), (1, [float(x) for x in b])],
            "id long, vec array<double>")
        cents = [[float(x) for x in a], [float(x) for x in b]]
        pairs = semantic_duplicate_pairs(df, "id", "vec", threshold=0.9,
                                         centroids=cents)
        assert float(a @ b) > 0.9          # would pair globally
        assert pairs.count() == 0          # but lives in two clusters


class TestSemanticDeduplicate:
    def test_keeps_least_central_member(self, two_cluster_df):
        df, cents = two_cluster_df
        sims = {r["id"]: r["centroid_sim"]
                for r in assign_clusters(df, "vec", cents).collect()
                if r["id"] < 3}
        expected_keep = min(sims, key=lambda i: (sims[i], i))
        kept = {r["id"] for r in semantic_deduplicate(
            df, "id", "vec", threshold=0.95, centroids=cents).collect()}
        assert kept == {expected_keep} | set(range(3, 10))

    def test_untouched_rows_pass_through(self, spark):
        rng = np.random.default_rng(13)
        rows = [(i, [float(x) for x in _unit(rng.standard_normal(8))])
                for i in range(20)]
        df = spark.createDataFrame(rows, "id long, vec array<double>")
        kept = semantic_deduplicate(df, "id", "vec", threshold=0.9999,
                                    n_clusters=2, seed=1)
        assert kept.count() == 20
