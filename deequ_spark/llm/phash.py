"""Perceptual image hashing — near-duplicate detection for image
columns, on top of the pure-stdlib decoders (BMP/PNG/baseline JPEG/GIF)
and the same pigeonhole Hamming-block join text simhash uses.

Two classic 64-bit hashes (aHash/dHash survive re-encoding, mild
resizing, and small edits — exactly what crawl-duplicate images look
like):

- ``ahash``: downscale to 8×8 grayscale, bit = pixel > mean;
- ``dhash``: downscale to 9×8, bit = horizontal gradient sign
  (more robust to global brightness shifts).

Spark shape: hashing is one ``mapInPandas`` over the binary payloads
(Arrow batches; decode + numpy per blob — bounded memory, no shuffle);
pair search reuses :func:`deequ_spark.llm.dedup.hamming_pairs` — one
groupBy shuffle with hot-bucket star capping, never all-pairs.
Undecodable payloads hash to NULL and never pair.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas  # noqa: F401 — pandas_udf type hints resolve at module scope
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hamming_pairs
from .multimodal import decode_image

__all__ = ["average_hash_bytes", "dhash_bytes", "image_hashes",
           "image_near_duplicates"]


def _gray_grid(data: bytes, gh: int, gw: int) -> np.ndarray:
    """Decode → grayscale → nearest-neighbor downsample to (gh, gw),
    float64. Deterministic: floor-index sampling, equal-weight channel
    mean (the documented convention the oracle can replay)."""
    h, w, c, px = decode_image(data)
    gray = px.astype(np.float64).mean(axis=2) if c > 1 \
        else px[:, :, 0].astype(np.float64)
    ys = (np.arange(gh) * h) // gh
    xs = (np.arange(gw) * w) // gw
    return gray[np.ix_(ys, xs)]


def average_hash_bytes(data: bytes, hash_size: int = 8) -> int:
    """64-bit aHash: 8×8 grid, bit_i = cell_i > grid mean (strict).
    Bit order: row-major, MSB first."""
    g = _gray_grid(data, hash_size, hash_size)
    bits = (g > g.mean()).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def dhash_bytes(data: bytes, hash_size: int = 8) -> int:
    """64-bit dHash: 8×9 grid, bit = cell[r, c] > cell[r, c+1]
    (horizontal gradient sign), row-major MSB first."""
    g = _gray_grid(data, hash_size, hash_size + 1)
    bits = (g[:, :-1] > g[:, 1:]).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def image_hashes(df: DataFrame, id_col: str, payload_col: str,
                 method: str = "ahash") -> DataFrame:
    """(id, fp, decoded) — perceptual hash per binary payload; blobs the
    stdlib decoders can't read get ``fp NULL, decoded false`` (the
    never-raise contract of the media operators)."""
    if method not in ("ahash", "dhash"):
        raise ValueError("method must be 'ahash' or 'dhash'")
    fn = average_hash_bytes if method == "ahash" else dhash_bytes

    def batches(it):
        for pdf in it:
            fps, ok = [], []
            for blob in pdf[payload_col]:
                try:
                    h = fn(bytes(blob))
                    # store as SIGNED 64-bit (Spark LongType)
                    fps.append(h - (1 << 64) if h >= (1 << 63) else h)
                    ok.append(True)
                except Exception:  # noqa: BLE001 — undecodable blob
                    fps.append(None)
                    ok.append(False)
            yield pandas.DataFrame({"id": pdf[id_col], "fp": fps,
                                    "decoded": ok})

    return df.select(id_col, payload_col).mapInPandas(
        batches, "id long, fp long, decoded boolean")


def image_near_duplicates(df: DataFrame, id_col: str, payload_col: str,
                          max_hamming: int = 5, method: str = "ahash",
                          hot_bucket_cap: int = 256) -> DataFrame:
    """(id_a, id_b, hamming) pairs of near-duplicate images — hash via
    one map-only Arrow pass, pair via the pigeonhole block join (one
    shuffle, star-capped hot buckets)."""
    hashes = image_hashes(df, id_col, payload_col, method) \
        .where(F.col("fp").isNotNull()).select("id", "fp")
    return hamming_pairs(hashes, bits=64, max_hamming=max_hamming,
                         hot_bucket_cap=hot_bucket_cap)
