"""Quality classifier over feature-hashed document vectors — the
fastText-style binary quality filter (CCNet §4.4 / GPT-3 appendix A use
exactly this shape: hashed bag-of-words features + a linear model,
scores used to filter or importance-sample a crawl against a trusted
corpus).

Split by cost, the way a 100 TB pipeline needs it:

- **Training** (:func:`train_quality_classifier`) runs once on a small
  labeled sample (positives = trusted corpus, negatives = random crawl):
  ``pyspark.ml`` logistic regression over :func:`hashed_doc_vectors`
  features. The learned model is returned as a PLAIN dict of floats —
  no ml objects to ship.
- **Scoring** (:func:`score_quality`) is the hot path: hashed vector +
  dot product + sigmoid as pure Column expressions — map-only,
  whole-stage codegen, no pyspark.ml (and no Python) anywhere at
  inference time, so scoring 100 TB is one projection pass.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .vectors import hashed_doc_vectors

__all__ = ["train_quality_classifier", "score_quality"]


def train_quality_classifier(positives: DataFrame, negatives: DataFrame,
                             text_col: str, dim: int = 256,
                             reg_param: float = 0.01,
                             max_iter: int = 50) -> dict:
    """Fit a logistic-regression quality model; returns
    ``{"weights": [dim floats], "intercept": float, "dim": int}``.

    Training data should be a SAMPLE (both sides fit one executor's
    worth of work comfortably — the classic setup is ~100k docs/side);
    the returned payload is what you persist/broadcast, not the model
    object."""
    try:
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.functions import array_to_vector
    except ImportError as exc:  # pragma: no cover — ml ships with pyspark
        raise ImportError(
            "train_quality_classifier needs pyspark.ml; score_quality "
            "works without it given an externally trained model") from exc

    def prep(df: DataFrame, label: int) -> DataFrame:
        ided = df.select(F.monotonically_increasing_id().alias("__id"),
                         F.col(text_col))
        vecs = hashed_doc_vectors(ided, "__id", text_col, dim=dim)
        return vecs.select(array_to_vector("vector").alias("features"),
                           F.lit(label).alias("label"))

    train = prep(positives, 1).unionByName(prep(negatives, 0))
    model = LogisticRegression(regParam=reg_param, maxIter=max_iter) \
        .fit(train)
    return {"weights": [float(w) for w in model.coefficients],
            "intercept": float(model.intercept), "dim": dim}


def score_quality(df: DataFrame, id_col: str, text_col: str,
                  model: dict, output_col: str = "quality_score"
                  ) -> DataFrame:
    """Sigmoid(w·v + b) per document over the same hashed-vector space
    the model was trained on. Adds ``output_col`` ∈ (0, 1); higher =
    more like the positive (trusted) corpus.

    Plan: the :func:`hashed_doc_vectors` explode/groupBys to build the
    vector, then ONE ``zip_with``-fold dot product against the literal
    weight array + sigmoid — the weights live in the plan as one
    array literal of ``dim`` floats (bounded; a 256-dim model is 2 KB),
    so scoring adds zero joins and zero Python."""
    dim = int(model["dim"])
    weights = model["weights"]
    if len(weights) != dim:
        raise ValueError(f"model has {len(weights)} weights, dim={dim}")
    vecs = hashed_doc_vectors(df, id_col, text_col, dim=dim)
    w = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(F.zip_with("vector", w, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    z = dot + F.lit(float(model["intercept"]))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (df.join(vecs.select(id_col, "vector"), id_col, "left")
            .withColumn(output_col, score)
            .drop("vector"))
