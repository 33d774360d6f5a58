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


# ---------------------------------------------------------------------------
# audio fingerprinting — the audio member of the modality triplet
# (text simhash / image aHash / audio band-energy fingerprint)
# ---------------------------------------------------------------------------

def audio_fingerprint_bytes(data: bytes, n_frames: int = 16,
                            n_bands: int = 4) -> int:
    """64-bit audio fingerprint: split the PCM signal into ``n_frames``
    equal windows, measure energy in ``n_bands`` log-spaced frequency
    bands per window (rFFT), bit = band energy > the window's MEAN band
    energy — the spectral analogue of the image aHash. Relative
    band-vs-frame comparison makes it volume-invariant AND stable on
    stationary signals (the classic Haitsma–Kalker delta-sign bits
    hover at zero for steady tones, where quantization noise flips
    them); content with a different spectral shape lands far away."""
    from .multimodal import decode_audio
    rate, samples = decode_audio(data)
    mono = samples.astype(np.float64).mean(axis=1)
    if len(mono) < n_frames * 2:
        raise ValueError("audio too short to fingerprint")
    win = len(mono) // n_frames
    energies = np.empty((n_frames, n_bands))
    for f in range(n_frames):
        spec = np.abs(np.fft.rfft(mono[f * win:(f + 1) * win])) ** 2
        # log-spaced band edges over (1, len(spec)) — skip DC
        edges = np.unique(np.geomspace(1, len(spec), n_bands + 1)
                          .astype(int))
        while len(edges) < n_bands + 1:          # tiny windows: pad
            edges = np.append(edges, edges[-1] + 1)
        for b in range(n_bands):
            energies[f, b] = spec[edges[b]:edges[b + 1]].sum()
    bits = energies > energies.mean(axis=1, keepdims=True)
    out = 0
    for bit in bits.flatten():
        out = (out << 1) | int(bit)
    return out


def audio_fingerprints(df: DataFrame, id_col: str, payload_col: str
                       ) -> DataFrame:
    """(id, fp, decoded) per binary audio payload — one mapInPandas
    Arrow pass; non-PCM/short blobs get ``fp NULL, decoded false``."""
    def batches(it):
        for pdf in it:
            fps, ok = [], []
            for blob in pdf[payload_col]:
                try:
                    h = audio_fingerprint_bytes(bytes(blob))
                    fps.append(h - (1 << 64) if h >= (1 << 63) else h)
                    ok.append(True)
                except Exception:  # noqa: BLE001 — undecodable blob
                    fps.append(None)
                    ok.append(False)
            yield pandas.DataFrame({"id": pdf[id_col], "fp": fps,
                                    "decoded": ok})
    return df.select(id_col, payload_col).mapInPandas(
        batches, "id long, fp long, decoded boolean")


def audio_near_duplicates(df: DataFrame, id_col: str, payload_col: str,
                          max_hamming: int = 5,
                          hot_bucket_cap: int = 256) -> DataFrame:
    """(id_a, id_b, hamming) near-duplicate audio pairs — fingerprint in
    one map-only pass, pair via the shared pigeonhole block join."""
    fps = audio_fingerprints(df, id_col, payload_col) \
        .where(F.col("fp").isNotNull()).select("id", "fp")
    return hamming_pairs(fps, bits=64, max_hamming=max_hamming,
                         hot_bucket_cap=hot_bucket_cap)
