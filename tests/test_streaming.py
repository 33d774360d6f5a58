"""Streaming verification tests — incremental state merge over
foreachBatch must equal batch computation over the union of all data."""

import os

import pytest

from deequ_spark import (Check, CheckLevel, CheckStatus, Completeness,
                        CountDistinct, Mean, Size, Sum, Uniqueness,
                        do_analysis_run)
from deequ_spark.streaming import StreamingVerification, verify_stream


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Three single-file parquet 'arrivals' of 100 rows each."""
    base = tmp_path_factory.mktemp("stream_src")
    for i in range(3):
        rows = [(i * 100 + j, float(j), "grp%d" % (j % 7)) for j in range(100)]
        (spark.createDataFrame(rows, "id long, v double, g string")
         .coalesce(1).write.parquet(str(base / f"chunk{i}")))
    # flatten the part files into one source dir
    src = tmp_path_factory.mktemp("stream_flat")
    n = 0
    for i in range(3):
        d = base / f"chunk{i}"
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.rename(d / f, src / f"part{n}.parquet")
                n += 1
    return str(src)


def test_streaming_kll_state_merges(spark, stream_dir):
    from deequ_spark import KLLSketch
    analyzers = [KLLSketch("v")]
    stream = (spark.readStream
              .schema("id long, v double, g string")
              .option("maxFilesPerTrigger", 1)
              .parquet(stream_dir))
    sv = verify_stream(stream, [], analyzers=analyzers)
    dist = sv.latest_metrics()[analyzers[0]]
    # 300 rows of v in [0, 99] ×3 files
    assert sum(b.count for b in dist.buckets) == 300
    assert dist.min_value == 0.0 and dist.max_value == 99.0


def test_streaming_cumulative_equals_batch(spark, stream_dir):
    analyzers = [Size(), Completeness("v"), Mean("v"), Sum("v"),
                 Uniqueness(("id",)), CountDistinct(("g",))]
    stream = (spark.readStream
              .schema("id long, v double, g string")
              .option("maxFilesPerTrigger", 1)
              .parquet(stream_dir))
    sv = StreamingVerification(analyzers=analyzers)
    q = (stream.writeStream.foreachBatch(sv.foreach_batch)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    assert len(sv.results) == 3          # one batch per file
    static = spark.read.parquet(stream_dir)
    expected = do_analysis_run(static, analyzers)
    got = sv.results[-1].context
    for a in analyzers:
        assert got.metric(a).value == pytest.approx(
            expected.metric(a).value, rel=1e-9), str(a)


def test_streaming_checks_and_batch_mode(spark, stream_dir):
    check = (Check(CheckLevel.ERROR, "stream")
             .has_size(lambda n: n == 100)      # per-batch size
             .is_complete("id"))
    stream = (spark.readStream
              .schema("id long, v double, g string")
              .option("maxFilesPerTrigger", 1)
              .parquet(stream_dir))
    sv = verify_stream(stream, [check], mode="batch")
    assert len(sv.results) == 3
    assert all(r.status == CheckStatus.SUCCESS for r in sv.results)
    assert all(r.rows_in_batch == 100 for r in sv.results)


def test_streaming_cumulative_check_transitions(spark, stream_dir):
    # fails once cumulative rows exceed 150 — first batch OK, later ERROR
    check = Check(CheckLevel.ERROR, "cap").has_size(lambda n: n <= 150)
    stream = (spark.readStream
              .schema("id long, v double, g string")
              .option("maxFilesPerTrigger", 1)
              .parquet(stream_dir))
    sv = verify_stream(stream, [check])
    statuses = [r.status for r in sv.results]
    assert statuses[0] == CheckStatus.SUCCESS
    assert statuses[-1] == CheckStatus.ERROR


class TestStreamingDedup:
    def _drain(self, spark, stream, tmp_path):
        out = []

        def sink(batch_df, _bid):
            out.extend(batch_df.collect())

        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return out

    def test_watermarked_dedup_bounded_state(self, spark, tmp_path):
        import shutil
        from deequ_spark.streaming import streaming_deduplicate
        src = str(tmp_path / "src")
        rows = [(1, "a", "2024-01-01 00:00:00"),
                (1, "a", "2024-01-01 00:00:30"),   # dup within window
                (2, "b", "2024-01-01 00:01:00"),
                (1, "a", "2024-01-01 00:02:00")]   # dup within window
        df = (spark.createDataFrame(rows, "k int, v string, ts string")
              .withColumn("ts", spark_col_ts()))
        df.write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        deduped = streaming_deduplicate(stream, ["k"], "ts",
                                        delay="10 minutes")
        out = self._drain(spark, deduped, tmp_path)
        assert sorted(r["k"] for r in out) == [1, 2]

    def test_fingerprint_dedup_drops_same_content(self, spark, tmp_path):
        from deequ_spark.streaming import streaming_fingerprint_deduplicate
        src = str(tmp_path / "srcfp")
        rows = [(1, "Same   Doc", "2024-01-01 00:00:00"),
                (2, "same doc", "2024-01-01 00:00:10"),    # normalized dup
                (3, "different doc", "2024-01-01 00:00:20")]
        df = (spark.createDataFrame(rows, "id int, text string, ts string")
              .withColumn("ts", spark_col_ts()))
        df.write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(df.schema).parquet(src))
        deduped = streaming_fingerprint_deduplicate(stream, "text", "ts")
        out = self._drain(spark, deduped, tmp_path)
        ids = sorted(r["id"] for r in out)
        assert len(ids) == 2 and 3 in ids
        assert "__fp" not in df.columns


def spark_col_ts():
    from pyspark.sql import functions as F
    return F.to_timestamp(F.col("ts"))


def test_streaming_embedding_quality_merges_exactly(spark, tmp_path):
    """EmbeddingQuality's integer micro-unit state is a semigroup, so
    StreamingVerification merges it across micro-batches EXACTLY (==,
    not approx) to the full-table values — vector-table data quality
    over a stream, no new code paths."""
    import os

    from deequ_spark import EmbeddingQuality, do_analysis_run
    from deequ_spark.streaming import StreamingVerification

    src = tmp_path / "vecs"
    os.makedirs(src)
    for i in range(3):
        rows = [(i * 50 + j,
                 None if j % 17 == 0 else [float(j % 9), float(i + 1)])
                for j in range(50)]
        (spark.createDataFrame(rows, "id long, vec array<double>")
         .coalesce(1).write.parquet(str(tmp_path / f"c{i}")))
        for f in os.listdir(tmp_path / f"c{i}"):
            if f.endswith(".parquet"):
                os.rename(tmp_path / f"c{i}" / f, src / f"part{i}.parquet")

    analyzers = [EmbeddingQuality("vec", 2)]
    stream = (spark.readStream.schema("id long, vec array<double>")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    sv = StreamingVerification(analyzers=analyzers)
    q = (stream.writeStream.foreachBatch(sv.foreach_batch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(sv.results) == 3

    static = spark.read.parquet(str(src))
    expected = do_analysis_run(static, analyzers).metric(analyzers[0]).value
    got = sv.results[-1].context.metric(analyzers[0]).value
    assert got == expected               # exact, including mean_norm
    assert got["n_rows"] == 150 and got["n_null"] == 9


class TestBatchSizeKnob:
    """VERDICT r6 #7: the per-batch fixed cost (~0.2-0.35 s, AB_B12_NOTE)
    amortizes with batch size — verify_file_stream surfaces
    maxFilesPerTrigger / maxBytesPerTrigger so scale users control the
    micro-batch shape instead of inheriting a one-file-per-trigger one."""

    def test_max_files_per_trigger_controls_batch_count(self, spark,
                                                        stream_dir):
        from deequ_spark.streaming import verify_file_stream
        sv = verify_file_stream(spark, stream_dir, analyzers=[Size()],
                                max_files_per_trigger=1)
        assert len(sv.results) == 3          # 3 files → 3 micro-batches
        assert sv.results[-1].context.metric(Size()).value == 300.0

        sv_big = verify_file_stream(spark, stream_dir, analyzers=[Size()])
        # no trigger bound + AvailableNow → ONE batch drains everything:
        # the amortized shape a backfill should use
        assert len(sv_big.results) == 1
        assert sv_big.results[-1].context.metric(Size()).value == 300.0

    def test_max_bytes_per_trigger_accepted(self, spark, stream_dir):
        from deequ_spark.streaming import verify_file_stream
        sv = verify_file_stream(spark, stream_dir, analyzers=[Size()],
                                max_bytes_per_trigger="1")
        # 1-byte budget still admits ≥1 file per batch → 3 batches
        assert len(sv.results) == 3
        assert sv.results[-1].context.metric(Size()).value == 300.0
