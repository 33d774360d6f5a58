"""Feature-hashed document vectors — the hashing trick (Weinberger et al.
2009, arXiv:0902.2206) over word tokens.

Gives text-only corpora a dense vector column WITHOUT any model: each
token hashes to one of ``dim`` buckets with a ±1 sign hash (unbiased
inner products), counts accumulate, and the result L2-normalizes into
exactly the ``array<double>`` shape the embedding operators consume —
``semantic_deduplicate``, ``brute_force_topk``, ``ivf_topk``,
``embedding_near_duplicates`` all run unchanged on top of this.

Spark shape: one explode + TWO map-side-combined groupBys
((id, bucket) sum, then (id) assemble) — both linear, no UDF anywhere,
the vector assembly is ``map_from_entries`` + a ``transform`` over the
bucket range. Hashing uses the same engine-portable 31-bit polynomial
as simhash (``portable_shingle_hash``), so an ANSI-SQL oracle rebuilds
identical vectors.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_shingle_hash
from .search import word_tokens

__all__ = ["hashed_doc_vectors", "quantize_embeddings",
           "dequantize_embedding", "cosine_quantized"]


def hashed_doc_vectors(df: DataFrame, id_col: str, text_col: str,
                       dim: int = 128, signed: bool = True,
                       normalize: bool = True,
                       output_col: str = "vector") -> DataFrame:
    """(id, text) → (id, vector: array<double> of length ``dim``).

    ``signed`` applies the ±1 sign hash (recommended: hash collisions
    then cancel in expectation instead of biasing counts upward).
    ``normalize`` L2-normalizes, making dot products cosine similarities;
    all-zero vectors (empty/whitespace docs) stay all-zero rather than
    dividing by zero.
    """
    if dim <= 0:
        raise ValueError("dim must be positive")
    h = portable_shingle_hash(F.col("__tok"))
    bucket = F.pmod(h, F.lit(dim))
    # independent sign bit: reuse the hash above dim so bucket and sign
    # aren't correlated for small dims
    sign = F.when((h / F.lit(dim)).cast("long") % 2 == 0,
                  F.lit(1.0)).otherwise(F.lit(-1.0)) if signed else F.lit(1.0)

    toks = df.select(F.col(id_col), F.explode(
        word_tokens(F.col(text_col))).alias("__tok"))
    sums = (toks.select(id_col, bucket.alias("__b"), sign.alias("__s"))
            .groupBy(id_col, "__b").agg(F.sum("__s").alias("__v")))
    assembled = (sums.groupBy(id_col)
                 .agg(F.map_from_entries(
                     F.collect_list(F.struct("__b", "__v"))).alias("__m"))
                 .select(id_col, F.transform(
                     F.sequence(F.lit(0), F.lit(dim - 1)),
                     lambda i: F.coalesce(F.col("__m")[i], F.lit(0.0)))
                     .alias(output_col)))
    if normalize:
        norm = F.sqrt(F.aggregate(
            F.col(output_col), F.lit(0.0), lambda acc, x: acc + x * x))
        assembled = assembled.withColumn(
            output_col,
            F.when(norm > 0, F.transform(F.col(output_col),
                                         lambda x: x / norm))
            .otherwise(F.col(output_col)))
    # docs with zero tokens produce no rows in `sums`; reattach as zeros
    zeros = (df.select(id_col).join(assembled.select(id_col), id_col,
                                    "left_anti")
             .withColumn(output_col, F.array_repeat(F.lit(0.0), dim)))
    return assembled.unionByName(zeros)


def quantize_embeddings(df: DataFrame, vec_col: str,
                        out_col: Optional[str] = None,
                        scale_col: Optional[str] = None) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|v|/127``,
    ``q[i] = round(v[i]/scale)`` ∈ [−127, 127] (an all-zero vector gets
    scale 0 and stays zero). Adds ``<vec>_q8`` (array<tinyint>) and
    ``<vec>_scale`` (float).

    The 100 TB lever: an embedding table is usually the second-largest
    artifact after the text itself; int8 cuts its storage, shuffle and
    scan bytes ~4× versus float32 (~8× versus float64), and COSINE is
    scale-invariant — the per-vector scales cancel, so quantized cosine
    differs from exact only by rounding (≲1e-2 per pair, pinned in
    tests). Pure expressions, map-only."""
    out_col = out_col or f"{vec_col}_q8"
    scale_col = scale_col or f"{vec_col}_scale"
    v = F.col(vec_col)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (mx / F.lit(127.0)).cast("float")
    q = F.when(mx == 0, F.transform(v, lambda x: F.lit(0).cast("byte"))) \
        .otherwise(F.transform(
            v, lambda x: F.round(x / (mx / F.lit(127.0)))
            .cast("int").cast("byte")))
    return df.withColumn(out_col, q).withColumn(scale_col, scale)


def dequantize_embedding(q_col, scale_col) -> Column:
    """array<float> reconstruction: ``q[i] * scale``."""
    q = q_col if isinstance(q_col, Column) else F.col(q_col)
    sc = scale_col if isinstance(scale_col, Column) else F.col(scale_col)
    return F.transform(q, lambda x: (x.cast("float") * sc))


def cosine_quantized(qa, qb) -> Column:
    """Cosine of two int8-quantized vectors — the scales cancel, so only
    the integer arrays are needed. All arithmetic stays in longs
    (127²·dims ≪ 2⁶³), ANSI-safe."""
    a = qa if isinstance(qa, Column) else F.col(qa)
    b = qb if isinstance(qb, Column) else F.col(qb)

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y,
                       lambda p, r: p.cast("long") * r.cast("long")),
            F.lit(0).cast("long"), lambda acc, t: acc + t)

    denom = F.sqrt(dot(a, a).cast("double")) * \
        F.sqrt(dot(b, b).cast("double"))
    return F.when(denom == 0, F.lit(0.0)) \
        .otherwise(dot(a, b).cast("double") / denom)
