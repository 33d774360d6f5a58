"""Driver-side helpers over Spark 3.5+ DataSketches HLL built-ins.

Replaces the reference's hand-rolled HLL++ word-array state
(/root/reference/src/main/scala/com/amazon/deequ/analyzers/catalyst/
StatefulHyperloglogPlus.scala, HLLConstants.scala) with the engine-native
mergeable binary sketches: ``hll_sketch_agg`` / ``hll_union`` /
``hll_sketch_estimate``. These helpers run one tiny local job on a
single-row DataFrame — only used on the incremental state-merge path;
the fused-scan path estimates inside the same aggregation.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _spark() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("No active SparkSession for HLL sketch evaluation")
    return spark


def estimate_hll(sketch: bytes) -> int:
    spark = _spark()
    df = spark.createDataFrame([(bytearray(sketch),)], "sketch binary")
    return df.select(F.hll_sketch_estimate("sketch").alias("est")).collect()[0][0]


def merge_hll_sketches(a: bytes, b: bytes) -> bytes:
    spark = _spark()
    df = spark.createDataFrame([(bytearray(a), bytearray(b))], "a binary, b binary")
    out = df.select(F.hll_union("a", "b").alias("u")).collect()[0][0]
    return bytes(out)
