"""Streaming heavy hitters (deequ_spark/streaming/frequent.py)."""

import pandas as pd

from pyspark.sql import functions as F

from deequ_spark.streaming import (streaming_heavy_hitters,
                                   verify_heavy_hitters)


def _make_source(spark, tmp_path, n_files=4):
    """Skewed value stream split into n_files parquet files: 'hot' ~40%,
    'warm' ~12%, a 500-value uniform tail."""
    import numpy as np
    rng = np.random.default_rng(11)
    n = 20000
    vals = np.where(rng.random(n) < 0.4, "hot",
                    np.where(rng.random(n) < 0.2, "warm",
                             rng.integers(0, 500, n).astype(str)))
    pdf = pd.DataFrame({"v": vals})
    src = str(tmp_path / "src")
    static = spark.createDataFrame(pdf)
    static.repartition(n_files).write.parquet(src)
    return src, static


def test_streaming_candidates_verify_to_exact_hitters(spark, tmp_path):
    src, static = _make_source(spark, tmp_path)
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    hh = streaming_heavy_hitters(stream, "v", capacity=16, num_buckets=4)

    emitted = []

    def collect(batch_df, _bid):
        emitted.extend(batch_df.collect())

    q = (hh.writeStream.outputMode("update").foreachBatch(collect)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(emitted) > 0

    # bounded state: no bucket ever carries more than `capacity` values
    per_batch_bucket = {}
    for r in emitted:
        per_batch_bucket.setdefault(r["bucket"], set()).add(r["value"])
    # (union over batches is a superset of any instant's state; still
    # a weak bound check on survivor churn)
    for bucket, vals in per_batch_bucket.items():
        assert len(vals) <= 16 + 32  # capacity + bounded churn

    # the emitted candidate set must contain every true heavy hitter,
    # and the exact verify pass must equal the plain GROUP BY answer
    cand = spark.createDataFrame(
        [(v,) for v in {r["value"] for r in emitted}], "value string")
    got = {r["value"]: r["count"]
           for r in verify_heavy_hitters(static, "v", cand, 0.1).collect()}
    exact = {r["v"]: r["n"] for r in
             static.groupBy("v").agg(F.count("*").alias("n"))
             .where(F.col("n") >= 0.1 * static.count()).collect()}
    assert got == exact
    assert "hot" in got and "warm" in got

    # mg_count is a LOWER bound on the true running count
    final_mg = {}
    for r in emitted:  # last emission per value wins
        final_mg[r["value"]] = r["mg_count"]
    true_counts = {r["v"]: r["n"] for r in
                   static.groupBy("v").agg(F.count("*").alias("n"))
                   .collect()}
    for v, mg in final_mg.items():
        assert mg <= true_counts[v]


def test_streaming_state_survives_batches(spark, tmp_path):
    # a value spread THINLY across batches must still be a candidate at
    # the end if its total mass is heavy — state carries across batches
    rows = []
    for b in range(4):
        rows += [("carried",)] * 300 + [(f"junk{b}_{i}",) for i in range(50)]
    static = spark.createDataFrame(rows, "v string")
    src = str(tmp_path / "src2")
    # one file per "batch" worth of rows
    for b in range(4):
        chunk = spark.createDataFrame(rows[b * 350:(b + 1) * 350],
                                      "v string")
        chunk.coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    hh = streaming_heavy_hitters(stream, "v", capacity=8, num_buckets=2)
    emitted = []
    q = (hh.writeStream.outputMode("update")
         .foreachBatch(lambda d, _b: emitted.extend(d.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert any(r["value"] == "carried" and r["mg_count"] > 300
               for r in emitted)


def test_streaming_heavy_hitters_validation(spark):
    df = spark.createDataFrame([("x",)], "v string")
    import pytest
    with pytest.raises(ValueError):
        streaming_heavy_hitters(df, "v", capacity=0)
