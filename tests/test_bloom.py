"""Bloom-filter join pruning (deequ_spark/bloom.py): exactness against
plain semi/anti joins, the no-false-negative guarantee, fpp sanity,
ANSI overflow safety, and the plan shape that makes it worth having —
the big side is filtered BEFORE its exchange, with zero Python nodes."""

import pytest
from pyspark.sql import functions as F

from deequ_spark import (bloom_anti_join, bloom_might_contain,
                         bloom_semi_join, bloom_shape, build_bloom)


@pytest.fixture(scope="module")
def sides(spark):
    small = spark.createDataFrame([(i * 7,) for i in range(3000)], "k long")
    big = spark.createDataFrame(
        [(i, i % 50000) for i in range(100000)], "row_id long, k long")
    return big, small


class TestExactness:
    def test_semi_join_row_set_identical(self, spark, sides):
        big, small = sides
        got = bloom_semi_join(big, small, "k").select("row_id")
        want = big.join(small.distinct(), "k", "left_semi").select("row_id")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_anti_join_row_set_identical(self, spark, sides):
        big, small = sides
        got = bloom_anti_join(big, small, "k").select("row_id")
        want = big.join(small, "k", "left_anti").select("row_id")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_semi_anti_partition_the_table(self, spark, sides):
        big, small = sides
        n_semi = bloom_semi_join(big, small, "k").count()
        n_anti = bloom_anti_join(big, small, "k").count()
        assert n_semi + n_anti == big.count()

    def test_string_keys_and_distinct_small_on(self, spark):
        small = spark.createDataFrame(
            [(f"host-{i}.example.com",) for i in range(500)], "h string")
        big = spark.createDataFrame(
            [(i, f"host-{i % 2000}.example.com") for i in range(8000)],
            "row_id long, url_host string")
        got = bloom_semi_join(big, small, "url_host", small_on="h")
        want = big.join(small.select(F.col("h").alias("url_host")),
                        "url_host", "left_semi")
        assert got.count() == want.count() == 2000

    def test_null_keys_follow_join_semantics(self, spark):
        small = spark.createDataFrame([(7,), (13,)], "k long")
        big = spark.createDataFrame(
            [(1, None), (2, 7), (3, 99)], "row_id long, k long")
        assert [r.row_id for r in bloom_semi_join(big, small, "k")
                .collect()] == [2]
        assert sorted(r.row_id for r in bloom_anti_join(big, small, "k")
                      .collect()) == [1, 3]


class TestBuildSinglePass:
    def test_auto_count_bloom_identical_and_cache_released(self, spark):
        """r12 wave 3: with expected_items unknown, build_bloom persists
        the projected keys across the sizing count + word build (one
        source execution instead of two). The resulting bloom must be
        bit-identical to an explicit-n build, and the persist must be
        released before returning."""
        df = spark.createDataFrame([(i * 3,) for i in range(500)]
                                   + [(None,)], "k long")
        jsc = spark.sparkContext._jsc.sc()
        n_cached_before = jsc.getPersistentRDDs().size()
        auto = build_bloom(df, "k")
        explicit = build_bloom(df, "k", expected_items=500)
        assert auto == explicit
        assert auto["n"] == 500
        assert jsc.getPersistentRDDs().size() == n_cached_before


class TestFilterProperties:
    def test_no_false_negatives(self, spark):
        members = spark.createDataFrame(
            [(i * 31 + 5,) for i in range(4000)], "k long")
        bloom = build_bloom(members, "k", fpp=0.05)
        missed = members.where(
            ~bloom_might_contain(bloom, F.col("k"))).count()
        assert missed == 0

    def test_fpp_within_sane_band(self, spark):
        members = spark.createDataFrame(
            [(i * 7,) for i in range(5000)], "k long")
        bloom = build_bloom(members, "k", fpp=0.01)
        non_members = spark.range(10_000_000, 10_050_000) \
            .select(F.col("id").alias("k"))
        fp = non_members.where(
            bloom_might_contain(bloom, F.col("k"))).count() / 50000
        assert fp < 0.05, f"fp rate {fp} vs nominal 0.01"

    def test_shape_math(self):
        m, k = bloom_shape(1000, 0.01)
        # classic m (~9600) +30% split-block penalty, whole 56-bit blocks
        assert m % 56 == 0 and 12000 < m < 13200 and 5 <= k <= 9
        m_cap, _ = bloom_shape(10**9, 0.01, max_bits=1 << 20)
        assert m_cap == ((1 << 20) // 56) * 56   # capped, fpp degrades
        with pytest.raises(ValueError):
            bloom_shape(10, max_bits=1 << 30)

    def test_ansi_safe_on_extreme_hashes(self, spark):
        # keys whose xxhash64 lands near +/-2^63: residue-space double
        # hashing must never overflow under ANSI
        import random
        rng = random.Random(9)
        keys = [(rng.randrange(-2**63, 2**63 - 1),) for _ in range(2000)]
        df = spark.createDataFrame(keys, "k long")
        bloom = build_bloom(df, "k", fpp=0.01)
        assert df.where(~bloom_might_contain(bloom, F.col("k"))).count() == 0


class TestPlanShape:
    def test_big_side_filtered_before_exchange_no_python(self, spark, sides):
        from deequ_spark.diagnostics import plan_report
        big, small = sides
        rep = plan_report(bloom_semi_join(big, small, "k"), execute=True)
        assert rep["python_row_udfs"] == 0 and rep["arrow_python"] == 0
        assert rep["cartesian"] == 0 and rep["nested_loop_joins"] == 0
        # the bloom probe must sit under the big side's scan/filter,
        # i.e. appear BEFORE (deeper than) any exchange in the plan text
        plan = bloom_semi_join(big, small, "k") \
            ._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "might_contain" not in plan      # no JVM bloom node: ours
        assert "conv(hex(substring(" in plan.replace(" ", ""), \
            "split-block probe expression not in plan"
