"""Streaming token-distribution drift (deequ_spark/streaming/drift.py).

File-source micro-batches (maxFilesPerTrigger=1 + availableNow) give a
deterministic batch sequence; batch 0 repeats the baseline language,
batch 1 switches vocabulary entirely — PSI must separate them, and the
streaming scores must equal the BATCH corpus_drift math on the same
rows (consistency between the two surfaces).
"""

import os

import pytest

from deequ_spark.streaming import StreamingDriftMonitor


@pytest.fixture(scope="module")
def drift_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("drift_src")
    baseline_rows = [(i, "alpha beta gamma delta common words")
                     for i in range(30)]
    same_rows = [(i, "alpha beta gamma delta common words")
                 for i in range(10)]
    shifted_rows = [(i, "zulu yankee xray whisky victor uniform")
                    for i in range(10)]
    bdir = tmp_path_factory.mktemp("drift_baseline")
    (spark.createDataFrame(baseline_rows, "id long, text string")
     .coalesce(1).write.mode("overwrite").parquet(str(bdir / "b")))
    for name, rows in (("chunk0", same_rows), ("chunk1", shifted_rows)):
        (spark.createDataFrame(rows, "id long, text string")
         .coalesce(1).write.parquet(str(base / name)))
    src = tmp_path_factory.mktemp("drift_flat")
    n = 0
    for name in ("chunk0", "chunk1"):   # rename order fixes batch order
        d = base / name
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.rename(d / f, src / f"part{n}.parquet")
                n += 1
    return str(bdir / "b"), str(src)


def _run(spark, drift_dirs, **kw):
    baseline_path, src = drift_dirs
    baseline = spark.read.parquet(baseline_path)
    mon = StreamingDriftMonitor(baseline, "text", top_n=10, **kw)
    stream = (spark.readStream.schema("id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(mon)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return mon


def test_psi_separates_same_from_shifted(spark, drift_dirs):
    mon = _run(spark, drift_dirs, psi_threshold=0.25)
    assert len(mon.results) == 2
    same, shifted = mon.results
    # batch 0 IS the baseline distribution -> zero drift, no alert
    assert same.psi == pytest.approx(0.0, abs=1e-12)
    assert same.l_infinity == pytest.approx(0.0, abs=1e-12)
    assert not same.alert
    # batch 1 shares no vocabulary -> massive drift, alert
    assert shifted.psi > 1.0
    assert shifted.alert
    # cumulative view sits between the two batch extremes
    assert 0.0 < shifted.cumulative_psi < shifted.psi
    assert mon.latest is shifted


def test_streaming_matches_batch_corpus_drift(spark, drift_dirs):
    """The per-batch PSI must equal corpus_drift's on the same rows
    when the comparison vocabulary coincides (the baseline's head
    covers both sides here, so union-of-heads == reference head)."""
    from deequ_spark.llm import corpus_drift
    baseline_path, src = drift_dirs
    baseline = spark.read.parquet(baseline_path)
    mon = _run(spark, drift_dirs)
    batch0 = spark.read.parquet(os.path.join(src, "part0.parquet"))
    ref = corpus_drift(baseline, batch0, "text", top_n=10)
    assert mon.results[0].psi == pytest.approx(ref["psi"], rel=1e-12)


def test_empty_baseline_rejected(spark):
    df = spark.createDataFrame([(1, "")], "id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        StreamingDriftMonitor(df, "text")
