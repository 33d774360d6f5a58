"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract / chunk-sample as
Arrow-batched ``mapInPandas`` stages.

The actual media decoding libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode step is STUBBED — ``decode_image``/``decode_audio``
raise NotImplementedError with the integration point documented, and a
deterministic fake decoder exercises the full Spark-side plumbing
(schema, batching, partitioning, UDF signature) which IS real and tested.

Scale notes: mapInPandas streams Arrow record batches — memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``; set it low (e.g. 64)
for large blobs so a batch of images fits in executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType()),      # image|audio|video
        T.StructField("format", T.StringType()),    # png|jpeg|wav|mp4…
        T.StructField("n_bytes", T.LongType()),
    ])),
])


def decode_image(data: bytes):
    """STUB — image decoding needs PIL/opencv, not present in this
    container. Integration point: return (height, width, channels,
    ndarray). Swap in e.g. ``PIL.Image.open(io.BytesIO(data))``."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this "
        "environment; use fake_decode for plumbing tests")


def decode_audio(data: bytes):
    """STUB — audio decoding needs soundfile/librosa (absent here).
    Integration point: return (sample_rate, ndarray)."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa — not available in this "
        "environment; use fake_decode for plumbing tests")


def fake_decode(data: bytes) -> dict:
    """Deterministic stand-in decoder: derives pseudo 'dimensions' from a
    content digest so tests and benchmarks are reproducible."""
    digest = hashlib.sha256(data).digest()
    return {
        "sha256_prefix": digest[:8].hex(),
        "pseudo_width": 64 + digest[0],
        "pseudo_height": 64 + digest[1],
        "n_bytes": len(data),
    }


def attach_binary_payload(df: DataFrame, text_col: str,
                          id_col: str) -> DataFrame:
    """Demo constructor: UTF-8-encode a text column into a binary payload
    with typed metadata — stands in for reading real media blobs."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(F.lit("image").alias("kind"), F.lit("raw").alias("format"),
                 F.length(payload).cast("long").alias("n_bytes")).alias("meta"))


FEATURE_SCHEMA = ("media_id long, n_bytes long, sha256_prefix string, "
                  "pseudo_width int, pseudo_height int")


def extract_binary_features(df: DataFrame,
                            decoder: Callable[[bytes], dict] = fake_decode,
                            batch_size_hint: Optional[int] = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — Arrow batch
    in, Arrow batch out. The decoder runs per blob inside the batch loop;
    swap ``decoder`` for a real one when media libs are present."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "n_bytes": [f["n_bytes"] for f in feats],
                "sha256_prefix": [f["sha256_prefix"] for f in feats],
                "pseudo_width": [f["pseudo_width"] for f in feats],
                "pseudo_height": [f["pseudo_height"] for f in feats],
            })

    return df.select("media_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


def sample_chunks(df: DataFrame, chunk_bytes: int = 1024,
                  stride: int = 4) -> DataFrame:
    """Frame/chunk sampling plumbing: split each payload into fixed-size
    chunks and keep every ``stride``-th — pure expressions (substring on
    binary), standing in for video frame sampling."""
    n_chunks = F.ceil(F.col("meta.n_bytes") / F.lit(chunk_bytes)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    sampled_idx = F.filter(idx, lambda i: i % stride == 0)
    chunks = F.transform(
        sampled_idx,
        lambda i: F.substring(F.col("payload"), i * chunk_bytes + 1, chunk_bytes))
    return df.select("media_id",
                     F.posexplode(chunks).alias("chunk_index", "chunk"))


RESIZE_SCHEMA = ("media_id long, target_width int, target_height int, "
                 "resized binary")


def real_resize(data: bytes, width: int, height: int) -> bytes:
    """STUB — image resizing needs PIL/opencv (absent here). Integration
    point: decode, ``img.resize((width, height))``, re-encode. Swap in
    for ``resizer`` when media libs are present."""
    raise NotImplementedError(
        "image resize requires PIL/opencv — not available in this "
        "environment; use fake_resize for plumbing tests")


def fake_resize(data: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resizer: tiles/truncates the byte stream to
    exactly width*height bytes, so output sizes are checkable without a
    real codec."""
    need = width * height
    if not data:
        return b"\x00" * need
    reps = need // len(data) + 1
    return (data * reps)[:need]


def resize_media(df: DataFrame, target_width: int, target_height: int,
                 resizer: Callable[[bytes, int, int], bytes] = real_resize
                 ) -> DataFrame:
    """mapInPandas resize plumbing over binary payloads — Arrow batch in,
    Arrow batch out, one resizer call per blob. The Spark side (schema,
    batching, memory bounds) is real; the default ``resizer`` is the
    documented PIL integration stub."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "target_width": target_width,
                "target_height": target_height,
                # NULL payloads propagate as NULL (SQL semantics), never
                # crash the worker
                "resized": [None if p is None
                            else resizer(bytes(p), target_width,
                                         target_height)
                            for p in pdf["payload"]],
            })

    return df.select("media_id", "payload").mapInPandas(do_resize,
                                                        RESIZE_SCHEMA)
