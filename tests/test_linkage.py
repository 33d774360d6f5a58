"""Similarity joins (deequ_spark/linkage.py) + exact heavy hitters.

Every assertion compares against a brute-force model computed in
Python — the operators' claim is EXACTNESS despite pruned candidate
generation, so the tests enumerate all pairs naively and demand set
equality, including the edge geometries the pruning must not lose
(short strings, empty strings, length-boundary pairs).
"""

import pytest
from pyspark.sql import functions as F

from deequ_spark.linkage import (edit_distance_join, token_jaccard_join,
                                 tokenize_set)
from deequ_spark.diagnostics import exact_heavy_hitters


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(rows, k):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            d = _lev(sa, sb)
            if d <= k:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                out.add((lo, hi, d))
    return out


WORDS = ["kitten", "sitten", "sitting", "mitten", "", "a", "ab", "abc",
         "kittens", "smitten", "flag", "flap", "flaps", "xyzzy",
         "mittens", "bitten", "bittern", "kitte", "itten", "kit"]


@pytest.mark.parametrize("method", ["deletions", "segments"])
@pytest.mark.parametrize("k", [0, 1, 2])
def test_edit_distance_join_exact_vs_brute_force(spark, k, method):
    rows = [(i, w) for i, w in enumerate(WORDS)]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {tuple(r) for r in
           edit_distance_join(df, "s", k, "id", method=method).collect()}
    assert got == _brute_pairs(rows, k)


def test_edit_distance_join_segments_k3(spark):
    # k=3 exercises the segments path (deletions is k<=2 only)
    rows = [(i, w) for i, w in enumerate(WORDS)]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {tuple(r) for r in
           edit_distance_join(df, "s", 3, "id").collect()}
    assert got == _brute_pairs(rows, 3)


def test_edit_distance_join_shared_prefix_corpus(spark):
    # the skew wedge that melts fixed-position segments: every string
    # shares a long constant prefix — both methods must stay EXACT
    rows = [(i, f"Customer#{i:09d}") for i in range(0, 400, 3)]
    df = spark.createDataFrame(rows, "id int, s string")
    expected = _brute_pairs(rows, 1)
    for method in ("deletions", "segments", "auto"):
        got = {tuple(r) for r in
               edit_distance_join(df, "s", 1, "id",
                                  method=method).collect()}
        assert got == expected, method


@pytest.mark.parametrize("method", ["deletions", "segments"])
def test_edit_distance_join_short_and_empty_strings(spark, method):
    # all strings shorter than k+1 — the short-string key path only
    rows = [(1, ""), (2, "a"), (3, "b"), (4, "ab"), (5, "")]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {tuple(r) for r in
           edit_distance_join(df, "s", 2, "id", method=method).collect()}
    assert got == _brute_pairs(rows, 2)
    assert (1, 5, 0) in got  # two empties match at distance 0


def test_edit_distance_join_nulls_never_match(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (3, None)],
                               "id int, s string")
    got = edit_distance_join(df, "s", 2, "id").collect()
    assert got == []


def test_edit_distance_join_two_table_mode(spark):
    left = spark.createDataFrame([(1, "flag"), (2, "kitten")],
                                 "lid int, ls string")
    right = spark.createDataFrame([(10, "flap"), (11, "flag"),
                                   (12, "mitten"), (13, "zzz")],
                                  "rid int, rs string")
    got = {tuple(r) for r in
           edit_distance_join(left, "ls", 1, "lid", right=right,
                              right_string_col="rs",
                              right_id_col="rid").collect()}
    assert got == {(1, 10, 1), (1, 11, 0), (2, 12, 1)}


def test_edit_distance_join_no_cross_join_in_plan(spark):
    df = spark.createDataFrame([(i, f"w{i}") for i in range(10)],
                               "id int, s string")
    plan = edit_distance_join(df, "s", 1, "id")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _brute_jaccard(rows, t):
    import re
    toks = {i: set(x for x in re.split(r"[^a-z0-9]+", s.lower()) if x)
            for i, s in rows}
    out = set()
    ids = sorted(toks)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = toks[ids[i]], toks[ids[j]]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= t:
                out.add((ids[i], ids[j], round(jac, 9)))
    return out


TEXTS = [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumped over the lazy dog"),
         (3, "the quick brown fox jumps over a lazy dog"),
         (4, "completely different words entirely here"),
         (5, "Completely different WORDS entirely here!"),
         (6, "quick brown fox"),
         (7, ""),            # empty token set — dropped
         (8, "架构 中文"),    # non-latin — empty token set
         (9, "the quick brown fox jumps over the lazy dog")]


@pytest.mark.parametrize("t", [0.5, 0.8, 1.0])
def test_token_jaccard_join_exact_vs_brute_force(spark, t):
    df = spark.createDataFrame(TEXTS, "id int, text string")
    got = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
           for r in token_jaccard_join(df, "id", "text", t).collect()}
    assert got == _brute_jaccard(TEXTS, t)


def test_token_jaccard_join_two_table_mode(spark):
    left = spark.createDataFrame(TEXTS[:5], "id int, text string")
    right = spark.createDataFrame(
        [(100 + i, t) for i, t in TEXTS[4:]], "rid int, rtext string")
    got = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
           for r in token_jaccard_join(
               left, "id", "text", 0.5, right=right,
               right_id_col="rid", right_text_col="rtext").collect()}
    import re

    def toks(s):
        return set(x for x in re.split(r"[^a-z0-9]+", s.lower()) if x)
    expected = set()
    for i, ta in TEXTS[:5]:
        for j, tb in TEXTS[4:]:
            a, b = toks(ta), toks(tb)
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= 0.5:
                expected.add((i, 100 + j, round(jac, 9)))
    assert got == expected
    assert expected  # the fixture must actually produce matches


def test_token_jaccard_join_threshold_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    with pytest.raises(ValueError):
        token_jaccard_join(df, "id", "text", 0.0)
    with pytest.raises(ValueError):
        token_jaccard_join(df, "id", "text", 1.5)


def test_tokenize_set_portable_semantics(spark):
    df = spark.createDataFrame([("A b, C! a 7x",)], "t string")
    [row] = df.select(tokenize_set(F.col("t")).alias("s")).collect()
    assert sorted(row["s"]) == ["7x", "a", "b", "c"]


def test_exact_heavy_hitters_skewed_synthetic(spark):
    # 'hot' ~30%, 'warm' ~7%, long uniform tail — MG candidates must be
    # a superset of the true hitters across any partitioning
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(7)
    n = 50000
    vals = np.where(rng.random(n) < 0.3, "hot",
                    np.where(rng.random(n) < 0.1, "warm",
                             rng.integers(0, 20000, n).astype(str)))
    pdf = pd.DataFrame({"v": vals})
    df = spark.createDataFrame(pdf).repartition(13)
    got = {r["value"]: r["count"]
           for r in exact_heavy_hitters(df, "v", 0.05).collect()}
    exp = {k: int(c) for k, c in pdf["v"].value_counts().items()
           if c >= 0.05 * n}
    assert got == exp
    fr = {r["value"]: r["fraction"]
          for r in exact_heavy_hitters(df, "v", 0.05).collect()}
    for v, c in exp.items():
        assert fr[v] == pytest.approx(c / n)


def test_exact_heavy_hitters_ignores_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,), (None,), (None,)], "v string")
    got = {r["value"]: r["count"]
           for r in exact_heavy_hitters(df, "v", 0.5).collect()}
    assert got == {"a": 2}  # 2/3 of non-null rows; NULLs not counted
    empty = spark.createDataFrame([], "v string")
    assert exact_heavy_hitters(empty, "v", 0.5).collect() == []


def test_exact_heavy_hitters_numeric_column(spark):
    rows = [(1,)] * 60 + [(2,)] * 25 + [(i,) for i in range(100, 115)]
    df = spark.createDataFrame(rows, "v int").repartition(7)
    got = {r["value"]: r["count"]
           for r in exact_heavy_hitters(df, "v", 0.2).collect()}
    assert got == {1: 60, 2: 25}


def test_exact_heavy_hitters_validation(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError):
        exact_heavy_hitters(df, "v", 0.0)
    with pytest.raises(ValueError):
        exact_heavy_hitters(df, "v", 1.1)
    # an explicit capacity too small to guarantee exactness must raise,
    # not silently drop hitters
    with pytest.raises(ValueError):
        exact_heavy_hitters(df, "v", 0.01, capacity=4)


def test_exact_heavy_hitters_counts_nan_as_a_value(spark):
    # NaN is NOT null in Spark: a mostly-NaN double column must surface
    # NaN as a heavy hitter (superset guarantee over the full groupBy
    # domain), not silently drop it in the candidate pass
    rows = [(float("nan"),)] * 80 + [(float(i),) for i in range(20)]
    df = spark.createDataFrame(rows, "v double").repartition(6)
    got = {("NaN" if r["value"] != r["value"] else r["value"]): r["count"]
           for r in exact_heavy_hitters(df, "v", 0.3).collect()}
    assert got == {"NaN": 80}
    # and a mixed case: NaN plus a real hitter, both kept
    rows2 = [(float("nan"),)] * 40 + [(7.0,)] * 40 \
        + [(float(i),) for i in range(100, 120)]
    df2 = spark.createDataFrame(rows2, "v double").repartition(5)
    got2 = {("NaN" if r["value"] != r["value"] else r["value"]): r["count"]
            for r in exact_heavy_hitters(df2, "v", 0.3).collect()}
    assert got2 == {"NaN": 40, 7.0: 40}


def test_exact_heavy_hitters_boundary_count_is_kept(spark):
    # a value at EXACTLY min_fraction*total must be kept — the integer
    # micro-unit comparison, immune to double(0.13)*total rounding up
    rows = [("x",)] * 650 + [(f"t{i}",) for i in range(4350)]
    df = spark.createDataFrame(rows, "v string").repartition(5)
    got = {r["value"]: r["count"]
           for r in exact_heavy_hitters(df, "v", 0.13).collect()}
    assert got == {"x": 650}  # 650 == 0.13 * 5000 exactly


def test_assign_split_null_groups_hash_as_one_group(spark):
    from deequ_spark.llm.packing import assign_split
    rows = [(i, None if i % 3 == 0 else f"g{i % 7}") for i in range(300)]
    df = spark.createDataFrame(rows, "id int, grp string")
    out = assign_split(df, "grp", {"train": 0.5, "test": 0.5})
    null_splits = {r["split"] for r in
                   out.where("grp IS NULL").select("split").collect()}
    assert len(null_splits) == 1  # all NULLs together, deterministically


def _brute_containment(rows, t):
    import re
    toks = {i: set(x for x in re.split(r"[^a-z0-9]+", s.lower()) if x)
            for i, s in rows}
    out = set()
    for ia, a in toks.items():
        for ib, b in toks.items():
            if ia == ib or not a or not b:
                continue
            c = len(a & b) / len(a)
            if c >= t:
                out.add((ia, ib, round(c, 9)))
    return out


@pytest.mark.parametrize("t", [0.5, 0.9, 1.0])
def test_token_containment_join_exact_vs_brute_force(spark, t):
    from deequ_spark.linkage import token_containment_join
    rows = TEXTS + [(20, "quick fox"),  # contained in 1/2/3/6/9
                    (21, "the quick brown fox jumps over the lazy dog "
                         "plus a very long tail of extra words here")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {(r["id_a"], r["id_b"], round(r["containment"], 9))
           for r in token_containment_join(df, "id", "text", t).collect()}
    assert got == _brute_containment(rows, t)


def test_token_containment_is_asymmetric(spark):
    from deequ_spark.linkage import token_containment_join
    df = spark.createDataFrame(
        [(1, "alpha beta"),
         (2, "alpha beta gamma delta epsilon zeta eta theta")],
        "id int, text string")
    got = {(r["id_a"], r["id_b"]): r["containment"]
           for r in token_containment_join(df, "id", "text", 0.9)
           .collect()}
    assert got == {(1, 2): 1.0}  # small doc contained; reverse is not


def test_exact_heavy_hitters_float32_nan(spark):
    # float columns arrive in pandas as float32 — whose NaN keys are
    # np.float32, NOT Python-float instances; the NaN canonicalization
    # must still fold them into one counter
    rows = [(float("nan"),)] * 60 + [(float(i),) for i in range(30)]
    df = spark.createDataFrame(rows, "v float").repartition(4)
    got = {("NaN" if r["value"] != r["value"] else r["value"]): r["count"]
           for r in exact_heavy_hitters(df, "v", 0.3).collect()}
    assert got == {"NaN": 60}
