"""Z-order layout (deequ_spark/layout.py), salted_join, assign_split."""

import pytest
from pyspark.sql import functions as F

from deequ_spark.layout import cluster_by_zorder, skipping_report, zorder_key
from deequ_spark.joins import salted_join
from deequ_spark.llm.packing import assign_split


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_morton(spark):
    rows = [(i, float(i % 17), float((i * 7) % 23)) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, a double, b double")
    bits = 8
    got = dict((r["id"], r["z"]) for r in df.select(
        "id", zorder_key(["a", "b"], [0.0, 0.0], [16.0, 22.0], bits)
        .alias("z")).collect())
    top = (1 << bits) - 1
    import math
    for i, a, b in rows:
        ba = min(max(int(math.floor((a - 0.0) / 16.0 * top)), 0), top)
        bb = min(max(int(math.floor((b - 0.0) / 22.0 * top)), 0), top)
        assert got[i] == _morton2(ba, bb, bits), (i, a, b)


def test_zorder_key_nulls_and_degenerate_range(spark):
    df = spark.createDataFrame([(1, None, 5.0), (2, 3.0, 5.0)],
                               "id int, a double, b double")
    # b's range is degenerate (min == max) -> bucket 0; NULL a -> bucket 0
    got = {r["id"]: r["z"] for r in df.select(
        "id", zorder_key(["a", "b"], [0.0, 5.0], [10.0, 5.0], 4)
        .alias("z")).collect()}
    assert got[1] == 0
    assert got[2] == _morton2(int(3.0 / 10.0 * 15), 0, 4)


def test_zorder_key_validation(spark):
    with pytest.raises(ValueError):
        zorder_key([], [], [])
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], [0] * 4, [1] * 4, bits=16)


def test_cluster_by_zorder_improves_file_skipping(spark, tmp_path):
    from deequ_spark.sources import write_manifest
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 1000).cast("double").alias("x"),
        F.pmod(F.col("id") * 37, 1000).cast("double").alias("y"))
    clustered = cluster_by_zorder(df, ["x", "y"], bits=10,
                                  num_partitions=16)
    assert "_zorder" not in clustered.columns  # key dropped by default
    p = str(tmp_path / "c")
    clustered.write.parquet(p)
    write_manifest(spark, p, ["x", "y"])
    rep = skipping_report(spark, p, {"x": (0.0, 100.0),
                                     "y": (0.0, 100.0)})
    # a 10% range on each of two z-ordered columns must skip most files
    assert rep["files_total"] == 16
    assert rep["skip_ratio_x"] >= 0.5
    assert rep["skip_ratio_y"] >= 0.5
    # row counts survive the re-layout
    assert spark.read.parquet(p).count() == n


def test_hilbert_key_matches_reference_walk(spark):
    """hilbert_key must equal the canonical xy2d walk on every cell of
    a 16x16 grid, be bijective, and take only unit steps — the
    locality property that separates Hilbert from Z-order (whose curve
    jumps across the plane at power-of-two boundaries)."""
    from deequ_spark.layout import hilbert_key

    def xy2d(order_n, x, y):
        d, s = 0, order_n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = order_n - 1 - x, order_n - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 4, 16
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long")
    got = {(r["x"], r["y"]): r["h"] for r in df.select(
        "x", "y", hilbert_key(["x", "y"], [0, 0], [n - 1, n - 1],
                              bits).alias("h")).collect()}
    assert all(h == xy2d(n, x, y) for (x, y), h in got.items())
    assert len(set(got.values())) == n * n          # bijective
    inv = {h: xy for xy, h in got.items()}
    assert all(abs(inv[i][0] - inv[i + 1][0])
               + abs(inv[i][1] - inv[i + 1][1]) == 1
               for i in range(n * n - 1))           # unit steps only


def test_hilbert_validation(spark):
    from deequ_spark.layout import hilbert_key
    import pytest as _pytest
    with _pytest.raises(ValueError, match="2D"):
        hilbert_key(["a"], [0], [1], 8)
    with _pytest.raises(ValueError, match="overflows"):
        hilbert_key(["a", "b"], [0, 0], [1, 1], bits=32)


def test_cluster_by_hilbert_skips_at_least_as_well_as_zorder(
        spark, tmp_path):
    """Same corpus, same predicates, same file count: the Hilbert
    layout's range skipping must match-or-beat the Z-order layout's
    (its curve has no long diagonal jumps, so per-file boxes are
    tighter or equal)."""
    from deequ_spark.layout import cluster_by_hilbert
    from deequ_spark.sources import write_manifest
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 1000).cast("double").alias("x"),
        F.pmod(F.col("id") * 37, 1000).cast("double").alias("y"))
    preds = {"x": (0.0, 100.0), "y": (0.0, 100.0)}
    ratios = {}
    for name, fn in (("z", cluster_by_zorder), ("h", cluster_by_hilbert)):
        p = str(tmp_path / name)
        fn(df, ["x", "y"], bits=10, num_partitions=16).write.parquet(p)
        write_manifest(spark, p, ["x", "y"])
        rep = skipping_report(spark, p, preds)
        ratios[name] = (rep["skip_ratio_x"], rep["skip_ratio_y"])
        assert spark.read.parquet(p).count() == n
    assert ratios["h"][0] >= ratios["z"][0] - 1e-9
    assert ratios["h"][1] >= ratios["z"][1] - 1e-9


def _skilling_py(coords, bits):
    """Pure-Python Skilling transpose encode — the reference
    hilbert_key_nd must reproduce bit-for-bit."""
    X = list(coords)
    n = len(X)
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t, Q = 0, 1 << (bits - 1)
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    X = [x ^ t for x in X]
    h = 0
    for q in range(bits):
        for i in range(n):
            h |= ((X[i] >> q) & 1) << (q * n + (n - 1 - i))
    return h


def test_hilbert_nd_matches_reference_and_is_a_hilbert_curve(spark):
    """hilbert_key_nd(3 cols) must equal the Python Skilling walk on
    every cell of an 8x8x8 cube, be bijective, and take only unit
    steps — the defining Hilbert property, in 3 dimensions."""
    from deequ_spark.layout import hilbert_key_nd
    bits, n = 3, 8
    df = spark.createDataFrame(
        [(x, y, z) for x in range(n) for y in range(n)
         for z in range(n)], "x long, y long, z long")
    got = {(r["x"], r["y"], r["z"]): r["h"] for r in df.select(
        "x", "y", "z",
        hilbert_key_nd(["x", "y", "z"], [0, 0, 0],
                       [n - 1, n - 1, n - 1], bits).alias("h"))
        .collect()}
    assert all(h == _skilling_py(c, bits) for c, h in got.items())
    assert len(set(got.values())) == n ** 3          # bijective
    inv = {h: c for c, h in got.items()}
    assert all(sum(abs(a - b) for a, b in zip(inv[i], inv[i + 1])) == 1
               for i in range(n ** 3 - 1))           # unit steps only


def test_hilbert_nd_4d_smoke_and_validation(spark):
    from deequ_spark.layout import hilbert_key_nd
    import pytest as _pytest
    bits, n = 2, 4
    df = spark.createDataFrame(
        [(a, b, c, d) for a in range(n) for b in range(n)
         for c in range(n) for d in range(n)],
        "a long, b long, c long, d long")
    hs = [r["h"] for r in df.select(hilbert_key_nd(
        ["a", "b", "c", "d"], [0] * 4, [n - 1] * 4, bits).alias("h"))
        .collect()]
    assert sorted(hs) == list(range(n ** 4))         # bijective
    with _pytest.raises(ValueError, match="at least two"):
        hilbert_key_nd(["a"], [0], [1], 8)
    with _pytest.raises(ValueError, match="overflows"):
        hilbert_key_nd(["a", "b", "c"], [0] * 3, [1] * 3, bits=21)


def test_cluster_by_hilbert_three_columns(spark, tmp_path):
    """3-col clustering routes through hilbert_key_nd and gives every
    participating column usable per-file skipping."""
    from deequ_spark.layout import cluster_by_hilbert
    from deequ_spark.sources import write_manifest
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 500).cast("double").alias("x"),
        F.pmod(F.col("id") * 37, 500).cast("double").alias("y"),
        F.pmod(F.col("id") * 101, 500).cast("double").alias("t"))
    p = str(tmp_path / "h3")
    cluster_by_hilbert(df, ["x", "y", "t"], bits=8,
                       num_partitions=16).write.parquet(p)
    write_manifest(spark, p, ["x", "y", "t"])
    rep = skipping_report(
        spark, p, {"x": (0.0, 50.0), "y": (0.0, 50.0),
                   "t": (0.0, 50.0)})
    assert spark.read.parquet(p).count() == n
    # every dimension skips a solid share of files (unclustered ~0)
    for c in ("x", "y", "t"):
        assert rep[f"skip_ratio_{c}"] >= 0.3, rep


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 5, i) for i in range(1000)], "k int, v int")
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(4)], "k int, name string")
    for how in ("inner", "left"):
        plain = sorted(tuple(r) for r in left.join(right, "k", how)
                       .select("k", "v", "name").collect())
        salted = sorted(tuple(r) for r in
                        salted_join(left, right, "k", num_salts=7, how=how)
                        .select("k", "v", "name").collect())
        assert salted == plain, how


def test_salted_join_validation(spark):
    df = spark.createDataFrame([(1, 2)], "k int, v int")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", num_salts=0)
    # a pre-existing '__salt' column would be silently overwritten then
    # dropped — must error, not corrupt the user's column
    salted = spark.createDataFrame([(1, 9)], "k int, __salt int")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(salted, df, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(df, salted, "k")


def test_assign_split_group_atomic_and_weighted(spark):
    rows = [(i, f"group{i % 200}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id int, grp string")
    out = assign_split(df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1})
    # no group straddles two splits
    straddle = (out.groupBy("grp")
                .agg(F.countDistinct("split").alias("ns"))
                .where("ns > 1").count())
    assert straddle == 0
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    assert sum(counts.values()) == 5000
    # deterministic across invocations
    again = {r["id"]: r["split"] for r in assign_split(
        df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r["id"]: r["split"] for r in out.collect()}
    assert again == first
    # salt re-rolls at least some assignments
    salted = assign_split(df, "grp", {"train": 0.8, "val": 0.1,
                                      "test": 0.1}, salt="epoch2")
    resalted = {r["id"]: r["split"] for r in salted.collect()}
    assert resalted != first


def test_assign_split_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id int, grp string")
    with pytest.raises(ValueError):
        assign_split(df, "grp", {})
    with pytest.raises(ValueError):
        assign_split(df, "grp", {"train": 0.5, "val": 0.1})


def test_update_manifest_scans_only_new_files(spark, tmp_path):
    from deequ_spark.sources import (read_corpus, update_manifest,
                                     write_manifest)
    p = str(tmp_path / "corpus")
    spark.range(1000).select(F.col("id").cast("double").alias("x")) \
        .repartition(4).write.parquet(p)
    first = update_manifest(spark, p, ["x"])  # no manifest yet -> full
    assert first["known"] == 0 and first["scanned"] == 4
    # append 2 more files
    spark.range(1000, 1500).select(
        F.col("id").cast("double").alias("x")) \
        .repartition(2).write.mode("append").parquet(p)
    second = update_manifest(spark, p, ["x"])
    assert second == {"known": 4, "scanned": 2, "removed": 0}
    # pruned read over the updated manifest stays exact
    got = read_corpus(spark, p, prune={"x": (1200.0, None)}).count()
    assert got == 300
    # idempotent when nothing changed
    third = update_manifest(spark, p, ["x"])
    assert third == {"known": 6, "scanned": 0, "removed": 0}


def test_update_manifest_drops_deleted_files(spark, tmp_path):
    import glob
    import os
    from deequ_spark.sources import update_manifest
    p = str(tmp_path / "corpus2")
    spark.range(100).select(F.col("id").cast("double").alias("x")) \
        .repartition(3).write.parquet(p)
    update_manifest(spark, p, ["x"])
    os.remove(sorted(glob.glob(f"{p}/part-*.parquet"))[0])
    rep = update_manifest(spark, p, ["x"])
    assert rep["removed"] == 1 and rep["scanned"] == 0
    from deequ_spark.sources import MANIFEST_DIR
    assert spark.read.parquet(f"{p}/{MANIFEST_DIR}").count() == 2


def test_plan_report_flags_the_right_nodes(spark):
    from deequ_spark.diagnostics import plan_report
    big = spark.range(10000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))

    agg = plan_report(big.groupBy("k").count())
    assert agg["exchanges"] >= 1
    assert agg["python_row_udfs"] == 0

    # under AQE codegen spans only exist in the FINAL plan
    final = plan_report(big.groupBy("k").count(), execute=True)
    assert final["adaptive_final"]
    assert final["wholestage_codegen_spans"] >= 1

    bj = plan_report(big.join(F.broadcast(small), "k"))
    assert bj["broadcast_joins"] == 1
    assert bj["cartesian"] == 0

    cross = plan_report(big.limit(10).crossJoin(small.limit(10)))
    assert cross["cartesian"] + cross["nested_loop_joins"] >= 1

    from pyspark.sql.types import LongType
    slow = F.udf(lambda x: x + 1, LongType())
    udf_plan = plan_report(big.select(slow("v").alias("v2")))
    assert udf_plan["python_row_udfs"] == 1


def test_plan_report_broadcast_plan_has_zero_shuffles(spark):
    from deequ_spark.diagnostics import plan_report
    big = spark.range(10000).select((F.col("id") % 100).alias("k"))
    small = spark.range(20).select(F.col("id").alias("k"))
    rep = plan_report(big.join(F.broadcast(small), "k"), execute=True)
    assert rep["broadcast_joins"] == 1
    assert rep["broadcast_exchanges"] >= 1
    assert rep["exchanges"] == 0  # broadcast plan shuffles nothing


def test_update_manifest_rejects_mismatched_columns(spark, tmp_path):
    import pytest as _pytest
    from deequ_spark.sources import update_manifest, write_manifest
    p = str(tmp_path / "corpus3")
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"))
    df.repartition(2).write.parquet(p)
    write_manifest(spark, p, ["x", "y"])
    # different order is fine (the manifest's own order is used) ...
    rep = update_manifest(spark, p, ["y", "x"])
    assert rep["scanned"] == 0
    # ... a different SET is not
    with _pytest.raises(ValueError):
        update_manifest(spark, p, ["x"])


def test_verify_heavy_hitters_validation(spark):
    import pytest as _pytest
    from deequ_spark.streaming import verify_heavy_hitters
    df = spark.createDataFrame([("a",)], "v string")
    cand = spark.createDataFrame([("a",)], "value string")
    with _pytest.raises(ValueError):
        verify_heavy_hitters(df, "v", cand, 0.0)
    with _pytest.raises(ValueError):
        verify_heavy_hitters(df, "v", cand, 4e-7)  # below 1e-6 resolution


def test_cluster_by_zorder_append_with_pinned_bounds(spark, tmp_path):
    from deequ_spark.sources import write_manifest, update_manifest
    from deequ_spark.layout import skipping_report
    p = str(tmp_path / "zc")
    base = spark.range(10000).select(
        (F.col("id") % 500).cast("double").alias("x"),
        F.pmod(F.col("id") * 13, 500).cast("double").alias("y"))
    cluster_by_zorder(base, ["x", "y"], bits=10,
                      num_partitions=16).write.parquet(p)
    write_manifest(spark, p, ["x", "y"])
    # append a new batch clustered with the SAME bounds (the manifest's
    # global min/max) — no rescan of the existing corpus
    bounds = {"x": (0.0, 499.0), "y": (0.0, 499.0)}
    extra = spark.range(10000, 14000).select(
        (F.col("id") % 500).cast("double").alias("x"),
        F.pmod(F.col("id") * 13, 500).cast("double").alias("y"))
    clustered_extra = cluster_by_zorder(extra, ["x", "y"], bits=10,
                                        num_partitions=8, bounds=bounds)
    clustered_extra.write.mode("append").parquet(p)
    rep = update_manifest(spark, p, ["x", "y"])
    assert rep["scanned"] == 8
    skip = skipping_report(spark, p, {"x": (0.0, 50.0)})
    # appended files keep tight ranges on the same curve: most of the
    # 24 files still miss a 10% slice
    assert skip["files_total"] == 24
    assert skip["skip_ratio_x"] >= 0.5
    # out-of-range values clamp instead of erroring
    odd = spark.createDataFrame([(-5.0, 900.0)], "x double, y double")
    assert cluster_by_zorder(odd, ["x", "y"], bits=10,
                             bounds=bounds).count() == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cluster_by_zorder(odd, ["x", "y"], bounds={"x": (0, 1)})
