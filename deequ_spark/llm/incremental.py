"""Incremental deduplication against a persisted index — the production
shape: a daily crawl batch dedupes against the WHOLE historical corpus
without recomputing (or even storing) the history's text.

The index holds one row per historical document: ``(id, fingerprint,
signature)`` — an 8-byte exact-content hash plus the MinHash signature
(num_hashes longs). At 100 TB of history that is a few hundred GB of
index vs the corpus itself; both lookup paths are hash-joins on
fixed-width keys:

- **exact**: new-batch fingerprints anti-join the index (one shuffle on
  8-byte keys);
- **near**: banded signature match — both sides band their STORED
  signatures (a projection, no text), candidates come from one
  equi-join on (band, bandhash) with a per-bucket partner cap (a
  duplicate mega-cluster in history needs only ONE partner to witness
  a new doc's duplication), then similarity is estimated as the
  fraction of agreeing signature positions (an unbiased Jaccard
  estimator, ±1/√k) — again no text needed.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_signatures
from .text import fingerprint

__all__ = ["write_dedup_index", "dedup_against_index", "band_hashes"]


def band_hashes(signature: Column, bands: int) -> Column:
    """array<long> of ``bands`` hashes, each over one contiguous
    signature slice — the LSH banding, computed from a STORED signature
    (no text required)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(F.slice(
            signature,
            b * (F.size(signature) / bands).cast("int") + 1,
            (F.size(signature) / bands).cast("int")), b))


def write_dedup_index(df: DataFrame, id_col: str, text_col: str,
                      path: str, num_hashes: int = 64, shingle_n: int = 3,
                      mode: str = "overwrite") -> None:
    """Persist the dedup index for ``df``: (id, fingerprint, signature).

    ``mode='append'`` grows the index batch-over-batch — the write path
    of the incremental loop (classify against the index, then append
    the batch's OWN fresh rows)."""
    sigs = minhash_signatures(df, id_col, text_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
    fps = df.select(F.col(id_col).alias("id"),
                    fingerprint(F.col(text_col)).alias("fingerprint"))
    (fps.join(sigs, "id")
        .select("id", "fingerprint", "signature")
        .write.mode(mode).parquet(path))


def dedup_against_index(new_df: DataFrame, id_col: str, text_col: str,
                        index_path: str, threshold: float = 0.8,
                        num_hashes: int = 64, bands: int = 32,
                        shingle_n: int = 3,
                        partner_cap: int = 8
                        ) -> Tuple[DataFrame, DataFrame]:
    """Classify a new batch against a persisted index.

    Returns ``(fresh, duplicates)``: ``fresh`` = new rows with no exact
    or near match in history (the rows to keep and append to the
    index); ``duplicates`` = ``(id, match_kind, matched_id,
    similarity)`` with ``match_kind ∈ {'exact', 'near'}`` (exact wins
    when both hold; similarity is 1.0 for exact, the signature-agreement
    Jaccard estimate for near).

    ``partner_cap`` bounds the per-(band,bucket) index partners joined
    per candidate bucket — a 10⁶-copy boilerplate cluster in history
    would otherwise fan every colliding new doc out 10⁶ ways, and ONE
    partner suffices to witness duplication.
    """
    if bands > num_hashes:
        raise ValueError(
            f"bands={bands} > num_hashes={num_hashes}: band slices would "
            "be empty and EVERY document would collide in every band")
    spark = new_df.sparkSession
    index = spark.read.parquet(index_path)

    new_fp = new_df.select(F.col(id_col).alias("id"),
                           fingerprint(F.col(text_col)).alias("fingerprint"))
    # pre-aggregate the index to ONE row per fingerprint before joining:
    # a 10⁶-copy exact cluster in history would otherwise fan every
    # matching new doc out 10⁶ ways onto one shuffle key
    fp_index = index.groupBy("fingerprint").agg(
        F.min("id").alias("matched_id"))
    exact = (new_fp.join(fp_index, "fingerprint")
             .select("id", F.lit("exact").alias("match_kind"),
                     "matched_id", F.lit(1.0).alias("similarity")))

    new_sigs = minhash_signatures(new_df, id_col, text_col,
                                  num_hashes=num_hashes,
                                  shingle_n=shingle_n)
    # candidates only needed for docs not already exact-matched
    remaining = new_sigs.join(exact.select("id"), "id", "left_anti")
    nb = remaining.select(
        "id", "signature",
        F.posexplode(band_hashes(F.col("signature"), bands))
        .alias("band", "bh"))
    # index side: band + CAP partner IDS per bucket (sorted →
    # deterministic). Collect ONLY the 8-byte ids — collecting the full
    # (id, signature) structs would hold m·(8 + 8·num_hashes) bytes in
    # one task for an m-copy mega-cluster bucket (~0.5 GB at m=10⁶)
    # before the slice could drop them; signatures re-join afterwards
    # for the (bounded, ≤ buckets·cap) surviving partners only.
    ib = (index.select(F.col("id").alias("matched_id"),
                       F.posexplode(band_hashes(F.col("signature"), bands))
                       .alias("band", "bh"))
          .groupBy("band", "bh")
          .agg(F.slice(F.sort_array(F.collect_list("matched_id")),
                       1, partner_cap).alias("partner_ids")))
    isigs = index.select(F.col("id").alias("matched_id"),
                         F.col("signature").alias("isig"))
    cand = (nb.join(ib, ["band", "bh"])
            .select("id", "signature",
                    F.explode("partner_ids").alias("matched_id"))
            .distinct()
            .join(isigs, "matched_id"))
    agree = (F.aggregate(
        F.zip_with("signature", "isig",
                   lambda a, b: (a == b).cast("int")),
        F.lit(0), lambda acc, x: acc + x) / F.lit(float(num_hashes)))
    near = (cand.withColumn("similarity", agree)
            .where(F.col("similarity") >= F.lit(float(threshold)))
            .groupBy("id")
            .agg(F.max(F.struct("similarity", "matched_id")).alias("m"))
            .select("id", F.lit("near").alias("match_kind"),
                    F.col("m.matched_id").alias("matched_id"),
                    F.col("m.similarity").alias("similarity")))

    duplicates = exact.unionByName(near)
    fresh = new_df.join(
        duplicates.select(F.col("id").alias(id_col)), id_col, "left_anti")
    return fresh, duplicates
