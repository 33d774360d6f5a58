"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract / chunk-sample as
Arrow-batched ``mapInPandas`` stages.

Decoders: the heavyweight media libraries (PIL/ffmpeg/librosa) are NOT in
this container, so the REAL decode path covers the stdlib-parseable
formats — uncompressed BMP (``struct`` header parsing + numpy pixel
reshape) and PCM WAV (``wave`` module) — plus matching encoders so the
round-trip is testable without any native codec. Compressed formats
(png/jpeg/mp3/mp4) raise NotImplementedError at the documented
integration point; a deterministic fake decoder additionally exercises
the Spark-side plumbing (schema, batching, partitioning, UDF signature)
independent of any format.

Scale notes: mapInPandas streams Arrow record batches — memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``; set it low (e.g. 64)
for large blobs so a batch of images fits in executor memory.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Callable, Iterator, Optional

import numpy as np
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


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an (height, width, 3) uint8 BGR array as an uncompressed
    24-bit BMP (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) —
    pure ``struct``/numpy, no codec library."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects (height, width, 3) uint8")
    height, width = arr.shape[:2]
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    padded = row_bytes + pad
    pixel_bytes = bytearray()
    for y in range(height - 1, -1, -1):      # bottom-up storage order
        pixel_bytes += arr[y].tobytes() + b"\x00" * pad
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_bytes)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       height * padded, 2835, 2835, 0, 0)
    return header + info + bytes(pixel_bytes)


def decode_image(data: bytes):
    """Decode an uncompressed 8/24/32-bit BMP with ``struct`` + numpy
    (no PIL/opencv needed). Returns ``(height, width, channels, pixels)``
    where ``pixels`` is a (height, width, channels) uint8 array in
    top-down row order. Compressed/other formats raise
    NotImplementedError at the documented PIL integration point."""
    if len(data) < 54 or data[:2] != b"BM":
        raise NotImplementedError(
            "only uncompressed BMP is decodable without PIL/opencv — "
            "swap in PIL.Image.open(io.BytesIO(data)) for other formats")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    (hdr_size, width, height, _planes, bpp,
     compression) = struct.unpack_from("<IiiHHI", data, 14)
    if hdr_size < 40 or compression != 0 or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"BMP variant not supported without PIL (headerSize={hdr_size},"
            f" bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    channels = bpp // 8
    row_bytes = width * channels
    padded = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(
        data, dtype=np.uint8, count=height * padded, offset=data_offset
    ).reshape(height, padded)[:, :row_bytes]
    pixels = rows.reshape(height, width, channels)
    if not top_down:
        pixels = pixels[::-1]
    return height, width, channels, np.ascontiguousarray(pixels)


def encode_wav_pcm16(samples: "np.ndarray", sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a PCM WAV via the stdlib ``wave``
    module — no soundfile/librosa needed."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_audio(data: bytes):
    """Decode a PCM WAV with the stdlib ``wave`` module (no
    soundfile/librosa needed). Returns ``(sample_rate, samples)`` with
    ``samples`` a (n_frames, n_channels) int array (int16/int32 by sample
    width; 8-bit WAV is unsigned uint8 per the spec). Compressed audio
    raises NotImplementedError at the documented integration point."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            rate = w.getframerate()
            n_frames = w.getnframes()
            n_channels = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError) as exc:
        raise NotImplementedError(
            "only PCM WAV is decodable without soundfile/librosa — swap "
            f"in soundfile.read for other formats ({exc})") from exc
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
    if dtype is None:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    samples = np.frombuffer(raw, dtype=dtype).reshape(-1, n_channels)
    return rate, samples


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
    """Real resize for uncompressed BMP payloads: decode (struct+numpy),
    nearest-neighbor resample via integer index maps, re-encode 24-bit
    BMP. Other formats raise NotImplementedError from ``decode_image`` at
    the documented PIL integration point."""
    src_h, src_w, channels, pixels = decode_image(data)
    ys = np.minimum((np.arange(height) * src_h) // height, src_h - 1)
    xs = np.minimum((np.arange(width) * src_w) // width, src_w - 1)
    resized = pixels[ys][:, xs]
    if channels == 1:
        resized = np.repeat(resized, 3, axis=2)
    return encode_bmp(resized[:, :, :3])


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
