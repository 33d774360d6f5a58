"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exactness baseline; random-hyperplane LSH
bucketing is the scale path (prunes the candidate set before scoring).
Dot products are pure ``zip_with``/``aggregate`` expressions — JVM-side,
no Python. Vectors are cast to double before multiplication so results
are deterministic and match a DOUBLE[] oracle bit-for-bit.

Scale notes (100 TB): brute-force against a single query is a scan +
top-k (no shuffle — TakeOrdered). knn_join broadcasts the (small) query
side. LSH top-k shuffles once on bucket signature.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(df: DataFrame, id_col: str, vec_col: str,
                     query_vector: Sequence[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine against one literal query vector.
    Plan: scan → projection → TakeOrdered(k) — no shuffle."""
    q = F.array(*[F.lit(float(v)) for v in query_vector])
    return (df.select(F.col(id_col).alias("id"),
                      cosine_similarity_expr(F.col(vec_col), q).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))


def knn_join(queries: DataFrame, corpus: DataFrame, query_id: str,
             corpus_id: str, vec_col: str, k: int = 10) -> DataFrame:
    """Exact k-NN of every query against the corpus: broadcast the query
    side, rank per query with a window. Returns (query, neighbor, cosine,
    rank)."""
    q = queries.select(F.col(query_id).alias("qid"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(corpus_id).alias("cid"),
                      F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .select("qid", "cid",
                      cosine_similarity_expr(F.col("qv"), F.col("cv"))
                      .alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def kmeans_centroids(df: DataFrame, vec_col: str, n_centroids: int = 16,
                     sample_rows: int = 20000, iters: int = 10,
                     seed: int = 42) -> List[List[float]]:
    """Driver-side k-means over a bounded sample (Lloyd's, numpy).
    The sample is O(sample_rows·dims) — constant wrt table size; the
    centroids are tiny and shipped as literals/broadcast."""
    import numpy as np
    sample = df.select(vec_col).limit(sample_rows).collect()
    X = np.array([row[0] for row in sample], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T                    # cosine on normalized rows
        assign = sims.argmax(axis=1)
        for c in range(cent.shape[0]):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(float(np.linalg.norm(m)), 1e-12)
    return [[float(v) for v in c] for c in cent]


def ivf_assign(df: DataFrame, vec_col: str,
               centroids: Sequence[Sequence[float]],
               list_col: str = "ivf_list") -> DataFrame:
    """Assign every vector to its nearest (cosine) centroid with ONE
    vectorized Arrow-batched pandas UDF — the IVF build step. At scale,
    write the result partitioned by ``list_col`` so probes prune files."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cent = np.array(centroids, dtype=np.float64)

    @pandas_udf("int")
    def nearest(vecs: "pandas.Series") -> "pandas.Series":
        import pandas as pd
        X = np.array(vecs.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series((X @ cent.T).argmax(axis=1).astype("int32"))

    return df.withColumn(list_col, nearest(F.col(vec_col)))


def ivf_topk(df: DataFrame, id_col: str, vec_col: str,
             query_vector: Sequence[float], k: int = 10,
             centroids: Optional[Sequence[Sequence[float]]] = None,
             n_centroids: int = 16, nprobe: int = 4,
             list_col: str = "ivf_list", seed: int = 42) -> DataFrame:
    """IVF approximate top-k: score only the ``nprobe`` inverted lists
    whose centroids are closest to the query. If ``df`` already carries
    ``list_col`` (pre-built index, ideally a table partitioned by it, so
    the filter becomes partition pruning), the build step is skipped."""
    import numpy as np

    if list_col in df.columns and centroids is None:
        raise ValueError(
            f"df already carries '{list_col}' but no centroids were given — "
            "fresh k-means centroids would not match the stored list "
            "assignments; pass the centroids the index was built with")
    if centroids is None:
        centroids = kmeans_centroids(df, vec_col, n_centroids, seed=seed)
    if list_col not in df.columns:
        df = ivf_assign(df, vec_col, centroids, list_col)

    cent = np.array(centroids, dtype=np.float64)
    q = np.array(query_vector, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    sims = cent @ qn
    probe = [int(i) for i in np.argsort(-sims)[:nprobe]]

    qlit = F.array(*[F.lit(float(v)) for v in query_vector])
    return (df.where(F.col(list_col).isin(probe))
            .select(F.col(id_col).alias("id"),
                    cosine_similarity_expr(F.col(vec_col), qlit).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))


def _hyperplane_signature(vec: Column, dims: int, planes: int,
                          seed: int = 42) -> Column:
    bits = []
    for p in range(planes):
        signs = [1.0 if hash((seed, p, i)) % 2 else -1.0 for i in range(dims)]
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(s) for s in signs]),
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def hyperplane_lsh_topk(df: DataFrame, id_col: str, vec_col: str,
                        query_vector: Sequence[float], k: int = 10,
                        planes: int = 8, seed: int = 42,
                        dims: Optional[int] = None) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane signature
    matches the query's (expected candidate fraction ≈ 2^-planes +
    near-boundary neighbors). The scale path: the signature predicate
    prunes the scan before any scoring."""
    if dims is None:
        dims = len(query_vector)
    sig = _hyperplane_signature(F.col(vec_col), dims, planes, seed)
    # query signature computed driver-side with the same sign pattern
    qsig = ""
    for p in range(planes):
        signs = [1.0 if hash((seed, p, i)) % 2 else -1.0 for i in range(dims)]
        dot = sum(s * float(v) for s, v in zip(signs, query_vector))
        qsig += "1" if dot >= 0 else "0"
    q = F.array(*[F.lit(float(v)) for v in query_vector])
    return (df.where(sig == F.lit(qsig))
            .select(F.col(id_col).alias("id"),
                    cosine_similarity_expr(F.col(vec_col), q).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))
