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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_shingle_hash
from .search import word_tokens

__all__ = ["hashed_doc_vectors"]


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
