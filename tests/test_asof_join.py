"""As-of join (deequ_spark/joins.py) — keyed window path and keyless
broadcast path, checked against an independent pandas.merge_asof model
and hand-derived fixtures."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deequ_spark import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [("A", _ts(0), 10.0), ("A", _ts(10), 11.0), ("A", _ts(20), 12.0),
            ("B", _ts(5), 100.0), ("B", _ts(15), 101.0)]
    return spark.createDataFrame(rows, "sym string, ts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [("A", _ts(4), 1), ("A", _ts(10), 2), ("A", _ts(25), 3),
            ("B", _ts(4), 4), ("B", _ts(30), 5), ("C", _ts(9), 6)]
    return spark.createDataFrame(rows, "sym string, ts timestamp, qty int")


class TestAsofWindowed:
    def test_backward_matches_pandas(self, spark, trades, quotes):
        got = {r["qty"]: (r["ts_r"], r["px_r"])
               for r in asof_join(trades, quotes, on="ts",
                                  by="sym").collect()}
        tp = trades.toPandas().sort_values("ts")
        qp = quotes.toPandas().sort_values("ts")
        exp = pd.merge_asof(tp, qp, on="ts", by="sym",
                            direction="backward", suffixes=("", "_r"))
        for _, row in exp.iterrows():
            ts_r, px_r = got[row["qty"]]
            if pd.isna(row["px"]):
                assert px_r is None and ts_r is None
            else:
                assert px_r == row["px"]

    def test_backward_equal_ts_inclusive(self, spark, trades, quotes):
        got = {r["qty"]: r["px_r"]
               for r in asof_join(trades, quotes, "ts", by="sym").collect()}
        assert got[2] == 11.0           # trade at t=10 sees quote AT t=10
        assert got[1] == 10.0           # t=4 sees t=0
        assert got[6] is None           # sym C has no quotes

    def test_forward_direction(self, spark, trades, quotes):
        got = {r["qty"]: r["px_r"]
               for r in asof_join(trades, quotes, "ts", by="sym",
                                  direction="forward").collect()}
        assert got[1] == 11.0           # t=4 → next quote t=10
        assert got[2] == 11.0           # equal ts inclusive forward
        assert got[3] is None           # t=25: no later A quote
        assert got[4] == 100.0          # B t=4 → t=5

    def test_tolerance_nulls_far_matches(self, spark, trades, quotes):
        got = {r["qty"]: r["px_r"]
               for r in asof_join(trades, quotes, "ts", by="sym",
                                  tolerance=5.0).collect()}
        assert got[1] == 10.0           # lag 4s ≤ 5s
        assert got[3] == 12.0           # t=25 → t=20, lag exactly 5.0: kept
        assert got[5] is None           # B t=30 → t=15, lag 15s > 5

    def test_row_count_and_left_columns_preserved(self, trades, quotes):
        out = asof_join(trades, quotes, "ts", by="sym")
        assert out.count() == trades.count()
        assert [c for c in out.columns[:3]] == ["sym", "ts", "qty"]
        assert set(out.columns) == {"sym", "ts", "qty", "ts_r", "px_r"}

    def test_numeric_on_column(self, spark):
        left = spark.createDataFrame([(1, 5), (1, 11)], "k int, t int")
        right = spark.createDataFrame([(1, 4, "x"), (1, 10, "y")],
                                      "k int, t int, v string")
        got = {r["t"]: r["v_r"]
               for r in asof_join(left, right, "t", by="k").collect()}
        assert got == {5: "x", 11: "y"}

    def test_bad_direction(self, trades, quotes):
        with pytest.raises(ValueError, match="direction"):
            asof_join(trades, quotes, "ts", by="sym", direction="sideways")


class TestAsofBroadcast:
    def test_keyless_matches_pandas(self, spark, trades, quotes):
        # global as-of: ignore sym, nearest-before quote of ANY symbol
        got = {r["qty"]: r["px_r"]
               for r in asof_join(trades.drop("sym"), quotes.drop("sym"),
                                  on="ts").collect()}
        tp = trades.toPandas().sort_values("ts")
        qp = quotes.toPandas().sort_values("ts")
        exp = pd.merge_asof(tp, qp, on="ts", direction="backward",
                            suffixes=("", "_r"))
        for _, row in exp.iterrows():
            assert got[row["qty"]] == row["px"]

    def test_keyless_forward(self, spark):
        left = spark.createDataFrame([(1.0, "a"), (9.5, "b"), (99.0, "c")],
                                     "t double, tag string")
        right = spark.createDataFrame([(2.0, 20), (9.5, 95)],
                                      "t double, v int")
        got = {r["tag"]: r["v_r"]
               for r in asof_join(left, right, "t",
                                  direction="forward").collect()}
        assert got == {"a": 20, "b": 95, "c": None}

    def test_broadcast_limit_guard(self, spark):
        left = spark.createDataFrame([(1.0,)], "t double")
        right = spark.range(100).select(F.col("id").cast("double").alias("t"))
        with pytest.raises(ValueError, match="broadcast_limit"):
            asof_join(left, right, "t", broadcast_limit=10)


class TestAsofPlanShape:
    def test_windowed_path_single_exchange(self, trades, quotes):
        out = asof_join(trades, quotes, "ts", by="sym")
        plan = out._jdf.queryExecution().explainString(
            out.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        # one hash-partitioned exchange for the window; union feeds it
        # (formatted mode: the node prints "Exchange", its partitioning
        # prints as "Arguments: hashpartitioning(...)")
        assert plan.count("Arguments: hashpartitioning") == 1
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_broadcast_path_no_shuffle_on_left(self, spark):
        left = spark.createDataFrame([(1.0,)], "t double")
        right = spark.createDataFrame([(1.0, 1)], "t double, v int")
        out = asof_join(left, right, "t")
        plan = out._jdf.queryExecution().explainString(
            out.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        assert "Arguments: hashpartitioning" not in plan
        assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------

from deequ_spark import interval_join  # noqa: E402


@pytest.fixture(scope="module")
def intervals(spark):
    # (sym, start, end, label); overlapping on purpose
    rows = [("A", 0.0, 10.0, "a1"), ("A", 5.0, 15.0, "a2"),
            ("B", 2.0, 4.0, "b1")]
    return spark.createDataFrame(rows,
                                 "sym string, s double, e double, lab string")


@pytest.fixture(scope="module")
def points(spark):
    rows = [("A", 7.0, 1), ("A", 12.0, 2), ("A", 20.0, 3),
            ("B", 3.0, 4), ("B", 9.0, 5)]
    return spark.createDataFrame(rows, "sym string, t double, pid int")


def _naive_interval(points_rows, interval_rows, by=True):
    out = []
    for sym_p, t, pid in points_rows:
        for sym_i, s, e, lab in interval_rows:
            if (not by or sym_p == sym_i) and s <= t <= e:
                out.append((pid, lab))
    return sorted(out)


PTS = [("A", 7.0, 1), ("A", 12.0, 2), ("A", 20.0, 3),
       ("B", 3.0, 4), ("B", 9.0, 5)]
IVS = [("A", 0.0, 10.0, "a1"), ("A", 5.0, 15.0, "a2"), ("B", 2.0, 4.0, "b1")]


class TestIntervalJoin:
    def test_inner_matches_naive(self, points, intervals):
        got = sorted((r["pid"], r["lab"]) for r in
                     interval_join(points, intervals, on="t", start="s",
                                   end="e", by="sym").collect())
        assert got == _naive_interval(PTS, IVS)

    def test_overlaps_produce_multiple_matches(self, points, intervals):
        got = [r["lab"] for r in
               interval_join(points, intervals, "t", "s", "e", by="sym")
               .where(F.col("pid") == 1).collect()]
        assert sorted(got) == ["a1", "a2"]    # t=7 inside both A intervals

    def test_left_keeps_unmatched(self, points, intervals):
        out = interval_join(points, intervals, "t", "s", "e", by="sym",
                            how="left")
        rows = {(r["pid"], r["lab"]) for r in out.collect()}
        assert (3, None) in rows              # t=20 outside all intervals
        assert (5, None) in rows              # B t=9 outside b1
        assert out.where(F.col("pid") == 1).count() == 2

    def test_keyless(self, spark, points, intervals):
        got = sorted((r["pid"], r["lab"]) for r in
                     interval_join(points.drop("sym"),
                                   intervals.drop("sym"),
                                   "t", "s", "e").collect())
        assert got == _naive_interval(PTS, IVS, by=False)

    def test_boundaries_inclusive(self, spark):
        pts = spark.createDataFrame([(0.0, 1), (10.0, 2)], "t double, p int")
        ivs = spark.createDataFrame([(0.0, 10.0, "x")],
                                    "s double, e double, lab string")
        got = sorted(r["p"] for r in
                     interval_join(pts, ivs, "t", "s", "e").collect())
        assert got == [1, 2]

    def test_bin_width_override_same_result(self, points, intervals):
        base = sorted((r["pid"], r["lab"]) for r in
                      interval_join(points, intervals, "t", "s", "e",
                                    by="sym").collect())
        for width in (0.5, 3.0, 100.0):
            got = sorted((r["pid"], r["lab"]) for r in
                         interval_join(points, intervals, "t", "s", "e",
                                       by="sym", bin_width=width).collect())
            assert got == base, f"bin_width={width} changed the result"

    def test_giant_interval_guard(self, spark):
        pts = spark.createDataFrame([(1.0, 1)], "t double, p int")
        ivs = spark.createDataFrame([(0.0, 1e6, "x")],
                                    "s double, e double, lab string")
        with pytest.raises(ValueError, match="max_bins_per_interval"):
            interval_join(pts, ivs, "t", "s", "e", bin_width=1.0,
                          max_bins_per_interval=100)

    def test_timestamp_axis(self, spark):
        import datetime as dt
        base = dt.datetime(2024, 1, 1)
        pts = spark.createDataFrame(
            [(base + dt.timedelta(seconds=5), 1)], "t timestamp, p int")
        ivs = spark.createDataFrame(
            [(base, base + dt.timedelta(seconds=10), "x")],
            "s timestamp, e timestamp, lab string")
        got = interval_join(pts, ivs, "t", "s", "e").collect()
        assert len(got) == 1 and got[0]["lab"] == "x"

    def test_no_nested_loop_join_in_plan(self, points, intervals):
        out = interval_join(points, intervals, "t", "s", "e", by="sym")
        plan = out._jdf.queryExecution().explainString(
            out.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestAsofNearest:
    def test_keyed_nearest_matches_pandas(self, spark, trades, quotes):
        got = {r["qty"]: r["px_r"]
               for r in asof_join(trades, quotes, "ts", by="sym",
                                  direction="nearest").collect()}
        tp = trades.toPandas().sort_values("ts")
        qp = quotes.toPandas().sort_values("ts")
        exp = pd.merge_asof(tp, qp, on="ts", by="sym",
                            direction="nearest", suffixes=("", "_r"))
        for _, row in exp.iterrows():
            if pd.isna(row["px"]):
                assert got[row["qty"]] is None
            else:
                assert got[row["qty"]] == row["px"]

    def test_nearest_tie_prefers_backward(self, spark):
        left = spark.createDataFrame([(1, 10)], "k int, t int")
        right = spark.createDataFrame([(1, 5, "before"), (1, 15, "after")],
                                      "k int, t int, v string")
        [r] = asof_join(left, right, "t", by="k",
                        direction="nearest").collect()
        assert r["v_r"] == "before"          # |Δ|=5 both ways → backward

    def test_keyless_nearest_matches_pandas(self, spark, trades, quotes):
        got = {r["qty"]: r["px_r"]
               for r in asof_join(trades.drop("sym"), quotes.drop("sym"),
                                  "ts", direction="nearest").collect()}
        tp = trades.toPandas().sort_values("ts")
        qp = quotes.toPandas().sort_values("ts")
        exp = pd.merge_asof(tp, qp, on="ts", direction="nearest",
                            suffixes=("", "_r"))
        for _, row in exp.iterrows():
            assert got[row["qty"]] == row["px"]

    def test_nearest_with_tolerance(self, spark):
        left = spark.createDataFrame([(1, 10.0), (1, 100.0)],
                                     "k int, t double")
        right = spark.createDataFrame([(1, 12.0, "x")],
                                      "k int, t double, v string")
        got = {r["t"]: r["v_r"]
               for r in asof_join(left, right, "t", by="k",
                                  direction="nearest",
                                  tolerance=5.0).collect()}
        assert got[10.0] == "x"              # |Δ|=2 ≤ 5
        assert got[100.0] is None            # |Δ|=88 > 5


def test_interval_join_name_clash_rejected(spark):
    pts = spark.createDataFrame([(1.0, "x")], "t double, lab string")
    ivs = spark.createDataFrame([(0.0, 2.0, "y")],
                                "s double, e double, lab string")
    with pytest.raises(ValueError, match="share non-key column"):
        interval_join(pts, ivs, "t", "s", "e")


# ---------------------------------------------------------------------------
# rolling trailing-window stats
# ---------------------------------------------------------------------------

from deequ_spark.joins import rolling_stats  # noqa: E402


class TestRollingStats:
    def test_matches_naive_model(self, spark):
        rows = [("u", _ts(0), 10.0), ("u", _ts(30), 20.0),
                ("u", _ts(60), 30.0), ("u", _ts(200), 40.0),
                ("v", _ts(10), 5.0)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = rolling_stats(df, "ts", "v", window_seconds=60.0, by="k",
                            stats=("avg", "count", "min", "max", "sum"))
        got = {(r["k"], r["ts"]): r for r in out.collect()}
        for k, ts, _v in rows:
            window = [vv for kk, tt, vv in rows
                      if kk == k and 0 <= (ts - tt).total_seconds() <= 60]
            r = got[(k, ts)]
            assert r["v_roll_count"] == len(window)
            assert r["v_roll_avg"] == pytest.approx(
                sum(window) / len(window))
            assert r["v_roll_min"] == min(window)
            assert r["v_roll_max"] == max(window)
            assert r["v_roll_sum"] == pytest.approx(sum(window))

    def test_numeric_axis_and_single_exchange(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0, 1.0), (1, 5.0, 2.0), (1, 20.0, 3.0)],
            "k int, t double, v double")
        out = rolling_stats(df, "t", "v", window_seconds=10, by="k",
                            stats=("sum",))
        # explain BEFORE any action: after collect, AQE prints final +
        # initial plans and every node would count twice
        plan = out._jdf.queryExecution().explainString(
            out.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        assert plan.count("Arguments: hashpartitioning") == 1
        assert "Join" not in plan      # never a range self-join
        got = {r["t"]: r["v_roll_sum"] for r in out.collect()}
        assert got == {0.0: 1.0, 5.0: 3.0, 20.0: 3.0}

    def test_bad_stat_rejected(self, spark):
        df = spark.createDataFrame([(1, 1.0, 1.0)],
                                   "k int, t double, v double")
        with pytest.raises(ValueError, match="unsupported stats"):
            rolling_stats(df, "t", "v", 10, by="k", stats=("median",))


# ---------------------------------------------------------------------------
# property test: asof_join ≡ pandas.merge_asof on random keyed series
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_series = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=0, max_value=1000)),
    min_size=1, max_size=25)


class TestAsofProperty:
    @settings(max_examples=7, deadline=None)
    @given(left=_series, right=_series,
           direction=st.sampled_from(["backward", "forward", "nearest"]))
    def test_equals_pandas_merge_asof(self, spark, left, right, direction):
        # distinct (key, t) per side — merge_asof tie behavior among
        # duplicate right rows is positional, ours is unspecified
        left = list({(k, t): None for k, t in left})
        right = list({(k, t): None for k, t in right})
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            "k string, t int, lid int")
        rdf = spark.createDataFrame(
            [(k, t, float(i)) for i, (k, t) in enumerate(right)],
            "k string, t int, rv double")
        got = {r["lid"]: r["rv_r"]
               for r in asof_join(ldf, rdf, on="t", by="k",
                                  direction=direction).collect()}
        lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left)],
                          columns=["k", "t", "lid"]).sort_values("t")
        rp = pd.DataFrame([(k, t, float(i))
                           for i, (k, t) in enumerate(right)],
                          columns=["k", "t", "rv"]).sort_values("t")
        exp = pd.merge_asof(lp, rp, on="t", by="k", direction=direction,
                            suffixes=("", "_r"))
        for _, row in exp.iterrows():
            if pd.isna(row["rv"]):
                assert got[row["lid"]] is None
            else:
                assert got[row["lid"]] == row["rv"], (
                    f"lid={row['lid']} direction={direction}")


class TestIntervalProperty:
    @settings(max_examples=6, deadline=None)
    @given(pts=st.lists(st.tuples(st.sampled_from(["a", "b"]),
                                  st.integers(0, 100)),
                        min_size=1, max_size=15),
           ivs=st.lists(st.tuples(st.sampled_from(["a", "b"]),
                                  st.integers(0, 100),
                                  st.integers(0, 40)),
                        min_size=1, max_size=10),
           width=st.sampled_from([1.0, 7.0, 50.0]))
    def test_equals_naive_quadratic(self, spark, pts, ivs, width):
        pts = [(k, t, i) for i, (k, t) in enumerate(pts)]
        ivs = [(k, s, s + d, i) for i, (k, s, d) in enumerate(ivs)]
        pdf = spark.createDataFrame(pts, "k string, t int, pid int")
        idf = spark.createDataFrame(ivs, "k string, s int, e int, iid int")
        got = sorted((r["pid"], r["iid"]) for r in
                     interval_join(pdf, idf, "t", "s", "e", by="k",
                                   bin_width=width).collect())
        naive = sorted((p[2], v[3]) for p in pts for v in ivs
                       if p[0] == v[0] and v[1] <= p[1] <= v[2])
        assert got == naive


class TestRollingProperty:
    @settings(max_examples=6, deadline=None)
    @given(rows=st.lists(st.tuples(st.sampled_from(["a", "b"]),
                                   st.integers(0, 50),
                                   st.integers(-5, 5)),
                         min_size=1, max_size=20),
           win=st.sampled_from([0, 3, 10]))
    def test_equals_naive_trailing_window(self, spark, rows, win):
        # distinct (k, t): ties within a RANGE frame are all included
        # anyway, but distinct keys make the naive model unambiguous
        rows = [(k, t, float(v)) for (k, t), v in
                {(k, t): v for k, t, v in rows}.items()]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = rolling_stats(df, "t", "v", window_seconds=win, by="k",
                            stats=("sum", "count"))
        got = {(r["k"], r["t"]): (r["v_roll_sum"], r["v_roll_count"])
               for r in out.collect()}
        for k, t, _v in rows:
            w = [v for kk, tt, v in rows
                 if kk == k and t - win <= tt <= t]
            assert got[(k, t)][1] == len(w)
            assert got[(k, t)][0] == pytest.approx(sum(w))


class TestTableDiffProperty:
    @settings(max_examples=6, deadline=None)
    @given(old=st.dictionaries(st.integers(0, 30),
                               st.integers(0, 3), max_size=20),
           new=st.dictionaries(st.integers(0, 30),
                               st.integers(0, 3), max_size=20))
    def test_counts_partition_the_key_space(self, spark, old, new):
        from deequ_spark import table_diff
        odf = spark.createDataFrame(list(old.items()) or [(None, None)],
                                    "id int, v int").where("id is not null")
        ndf = spark.createDataFrame(list(new.items()) or [(None, None)],
                                    "id int, v int").where("id is not null")
        d = table_diff(odf, ndf, "id")
        assert d["added"] == len(set(new) - set(old))
        assert d["removed"] == len(set(old) - set(new))
        both = set(old) & set(new)
        assert d["changed"] == sum(1 for k in both if old[k] != new[k])
        assert d["unchanged"] == sum(1 for k in both if old[k] == new[k])


class TestAsofNullTimestamps:
    """ADVICE r7: NULL `on` rows must not corrupt either path."""

    def test_broadcast_null_right_ts_excluded(self, spark):
        left = spark.createDataFrame(
            [(10.0, "a"), (20.0, "b")], "t double, lv string")
        right = spark.createDataFrame(
            [(None, "BAD"), (9.0, "x"), (19.0, "y")], "t double, rv string")
        out = {r["lv"]: r["rv_r"]
               for r in asof_join(left, right, on="t").collect()}
        assert out == {"a": "x", "b": "y"}

    def test_windowed_null_right_ts_excluded(self, spark):
        left = spark.createDataFrame(
            [("k", 10.0, "a")], "k string, t double, lv string")
        right = spark.createDataFrame(
            [("k", None, "BAD"), ("k", 9.0, "x")],
            "k string, t double, rv string")
        rows = asof_join(left, right, on="t", by="k").collect()
        assert rows[0]["rv_r"] == "x"

    def test_windowed_null_left_ts_no_match(self, spark):
        left = spark.createDataFrame(
            [("k", None, "a"), ("k", 10.0, "b")],
            "k string, t double, lv string")
        right = spark.createDataFrame(
            [("k", 5.0, "x")], "k string, t double, rv string")
        for direction in ("backward", "forward", "nearest"):
            out = {r["lv"]: r["rv_r"]
                   for r in asof_join(left, right, on="t", by="k",
                                      direction=direction).collect()}
            assert out["a"] is None, direction
        assert out["b"] == "x"
