"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract / chunk-sample as
Arrow-batched ``mapInPandas`` stages.

Decoders: the heavyweight media libraries (PIL/ffmpeg/librosa) are NOT in
this container, so the REAL decode path covers the spec-implementable
formats — uncompressed BMP (``struct`` header parsing + numpy pixel
reshape), non-interlaced 8-bit PNG (``zlib`` inflate + the five PNG
scanline filters), full T.81 JPEG — BASELINE sequential AND progressive
(own Huffman + successive-approximation/spectral-selection passes +
numpy IDCT, see ``jpeg.py``), GIF87a/89a incl. animated-frame
compositing (own LZW decoder incl. interlace, disposal methods 1/2/3,
see ``gif.py``) and PCM WAV (``wave`` module) — plus matching encoders
so the round-trips are testable without any native codec. Compressed
AUDIO/VIDEO payloads (MP3 PCM, MP4 H.26x) are the one genuinely
out-of-scope decode: they raise NotImplementedError from the DECODERS
at the documented integration point (``llm/ffmpeg.py``'s
make_ffmpeg_frame_decoder is the drop-in hook when a real ffmpeg binary
exists) — but both still yield rich metadata WITHOUT decoding: header
probes (``probe_media``: MP3 frame-header/Xing duration, MP4 box tree),
per-frame profilers (``mp3_frame_profile`` VBR walk, ``mp4_sample_
profile`` stbl tables, ID3v2 tags) and container-level frame/keyframe
SAMPLING (stss-snapped seeks), which is the pass a routing pipeline
actually needs; a deterministic fake decoder additionally exercises the
Spark-side plumbing (schema, batching, partitioning, UDF signature)
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
import zlib
from typing import Callable, Iterator, Optional, Sequence

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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: "np.ndarray") -> bytes:
    """Encode a (height, width[, channels]) uint8 array as a
    non-interlaced 8-bit PNG — grayscale (1ch), gray+alpha (2ch), RGB
    (3ch) or RGBA (4ch) by channel count. Pure ``struct`` + ``zlib``
    (filter type 0 per scanline), no PIL."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError("encode_png expects (h, w[, 1|2|3|4]) uint8")
    height, width, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def decode_png(data: bytes):
    """Decode a non-interlaced 8-bit-depth PNG with ``struct`` + ``zlib``
    + numpy — no PIL. Covers color types 0 (gray), 2 (RGB), 3 (palette,
    expanded to RGB via PLTE), 4 (gray+alpha) and 6 (RGBA), with all five
    scanline filters (None/Sub/Up/Average/Paeth) unapplied per the spec
    (PNG §9 'Filtering'). Returns ``(height, width, channels, pixels)``
    top-down, matching ``decode_image``'s BMP contract. Adam7 interlace
    and sub-byte/16-bit depths raise NotImplementedError at the
    documented PIL integration point."""
    if data[:8] != PNG_SIGNATURE:
        raise NotImplementedError("not a PNG stream")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT chunks")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG variant needs PIL (bitDepth={depth}, interlace="
            f"{interlace}) — only non-interlaced 8-bit is stdlib-decodable")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None or (ctype == 3 and plte is None):
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise NotImplementedError("PNG scanline data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    bpp = channels
    at = 0
    for y in range(height):
        ftype = raw[at]
        row = bytearray(raw[at + 1:at + 1 + stride])
        at += 1 + stride
        if ftype == 1:                                   # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:                                 # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:                                 # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:                                 # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), np.uint8)
        prev = row
    pixels = out.reshape(height, width, channels)
    if ctype == 3:
        pixels = np.ascontiguousarray(plte[pixels[:, :, 0]])
        channels = 3
    return height, width, channels, pixels


def decode_image(data: bytes):
    """Decode an uncompressed 8/24/32-bit BMP (``struct`` + numpy), a
    non-interlaced 8-bit PNG (``struct`` + ``zlib``; see ``decode_png``)
    or a baseline-or-progressive JPEG (see ``jpeg.decode_jpeg`` — Huffman +
    numpy IDCT, grayscale/4:4:4/4:2:0, restart markers) — no PIL/opencv
    needed. Returns ``(height, width, channels, pixels)`` where
    ``pixels`` is a (height, width, channels) uint8 array in top-down
    row order. Formats outside these four (TIFF, WebP, ...) raise
    NotImplementedError at the documented PIL integration point."""
    if data[:8] == PNG_SIGNATURE:
        return decode_png(data)
    if data[:2] == b"\xFF\xD8":
        from .jpeg import decode_jpeg
        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif
        return decode_gif(data)
    if len(data) < 54 or data[:2] != b"BM":
        raise NotImplementedError(
            "only uncompressed BMP, non-interlaced 8-bit PNG, baseline "
            "JPEG and GIF are decodable without PIL/opencv — swap in "
            "PIL.Image.open(io.BytesIO(data)) for other formats")
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


def encode_mp4_skeleton(duration_ms: int, width: int, height: int,
                        n_tracks: int = 1, timescale: int = 1000) -> bytes:
    """Minimal structurally-valid MP4 (ISO/IEC 14496-12 box layout):
    ``ftyp`` + ``moov(mvhd, trak(tkhd)...)`` + empty ``mdat``. Carries
    real duration/timescale/track dimensions so ``probe_media`` has
    something true to read; there is no codec payload (that part is
    legitimately environment-bound — ffmpeg territory)."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    duration = duration_ms * timescale // 1000
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale, duration)
               + struct.pack(">IHH", 0x00010000, 0x0100, 0)
               + b"\x00" * 8 + matrix + b"\x00" * 24
               + struct.pack(">I", n_tracks + 1))
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd = box(b"tkhd", struct.pack(">IIIIII", 7, 0, 0, tid, 0,
                                        duration)
                   + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                   + matrix
                   + struct.pack(">II", width << 16, height << 16))
        traks += box(b"trak", tkhd)
    return ftyp + box(b"moov", mvhd + traks) + box(b"mdat", b"")


def encode_mp4_samples(sample_sizes: "Sequence[int]",
                       sample_deltas: "Sequence[int]",
                       sync_samples: "Optional[Sequence[int]]" = None,
                       chunk_size: int = 2, timescale: int = 1000,
                       width: int = 160, height: int = 90) -> bytes:
    """Structurally-valid single-track MP4 whose ``stbl`` sample tables
    are REAL (ISO/IEC 14496-12 §8.5-8.7): per-sample sizes (``stsz``),
    run-length decode deltas (``stts``), ``chunk_size``-sample chunks
    with true absolute file offsets (``stsc``/``stco``; two-pass build —
    offsets depend on the moov size, which is fixed once the table
    shapes are), and optional sync-sample numbers (``stss``, 1-based;
    omitted = every sample is sync, per spec). The mdat payload is
    zeros of the exact summed size — timing/size/offset metadata is
    true, codec payload is the documented ffmpeg boundary. No ``stsd``
    codec entry is written (the profiler reads timing/size tables
    only)."""
    n = len(sample_sizes)
    if len(sample_deltas) != n or n == 0:
        raise ValueError("sample_sizes and sample_deltas must be "
                         "equal-length and non-empty")

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    # stts: run-length (count, delta)
    runs = []
    for d in sample_deltas:
        if runs and runs[-1][1] == d:
            runs[-1][0] += 1
        else:
            runs.append([1, d])
    stts = box(b"stts", struct.pack(">II", 0, len(runs))
               + b"".join(struct.pack(">II", c, d) for c, d in runs))
    stsz = box(b"stsz", struct.pack(">III", 0, 0, n)
               + b"".join(struct.pack(">I", s) for s in sample_sizes))
    n_chunks = -(-n // chunk_size)
    # constant samples-per-chunk, one trailing partial entry if needed;
    # a single partial chunk declares its TRUE count so the stsc never
    # implies samples the n-entry stsz does not have
    last = n - chunk_size * (n_chunks - 1)
    entries = [(1, chunk_size if n_chunks > 1 else last)]
    if n_chunks > 1 and last != chunk_size:
        entries.append((n_chunks, last))
    stsc = box(b"stsc", struct.pack(">II", 0, len(entries))
               + b"".join(struct.pack(">III", fc, spc, 1)
                          for fc, spc in entries))
    stss = b""
    if sync_samples is not None:
        stss = box(b"stss", struct.pack(">II", 0, len(sync_samples))
                   + b"".join(struct.pack(">I", s)
                              for s in sync_samples))
    duration = sum(sample_deltas)
    mdhd = box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale,
                                    duration)
               + struct.pack(">HH", 0x55C4, 0))
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    tkhd = box(b"tkhd", struct.pack(">IIIIII", 7, 0, 0, 1, 0, duration)
               + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
               + struct.pack(">II", width << 16, height << 16))
    mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale,
                                    duration)
               + struct.pack(">IHH", 0x00010000, 0x0100, 0)
               + b"\x00" * 8 + matrix + b"\x00" * 24
               + struct.pack(">I", 2))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    def assemble(chunk_offsets):
        stco = box(b"stco", struct.pack(">II", 0, n_chunks)
                   + b"".join(struct.pack(">I", o)
                              for o in chunk_offsets))
        stbl = box(b"stbl", stts + stsz + stsc + stco + stss)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        return moov

    # pass 1 with zero offsets fixes every box size; pass 2 writes the
    # real absolute offsets (4-byte fields — sizes cannot change)
    moov_len = len(assemble([0] * n_chunks))
    mdat_payload_at = len(ftyp) + moov_len + 8
    offsets, pos, i = [], mdat_payload_at, 0
    while i < n:
        offsets.append(pos)
        pos += sum(sample_sizes[i:i + chunk_size])
        i += chunk_size
    moov = assemble(offsets)
    mdat = box(b"mdat", b"\x00" * sum(sample_sizes))
    return ftyp + moov + mdat


MP4_SAMPLE_SCHEMA = ("media_id long, track_id int, sample_index int, "
                     "byte_offset long, size_bytes int, dts_ms long, "
                     "duration_ms long, is_sync boolean")


def mp4_samples(data: bytes):
    """Walk one MP4 blob's ``stbl`` tables (the per-blob unit of
    :func:`mp4_sample_profile`, exposed for driver-side use and direct
    testing): yields ``(track_id, sample_index, byte_offset, size,
    dts_ms, duration_ms, is_sync)`` per sample. Tracks missing any of
    stts/stsz/stsc/stco/timescale yield nothing (truncation-safe)."""
    tables: dict = {}

    def walk(lo: int, hi: int, depth: int, ctx: dict) -> None:
        at = lo
        while at + 8 <= hi:
            (size,) = struct.unpack_from(">I", data, at)
            tag = data[at + 4:at + 8]
            if size == 1:
                (size,) = struct.unpack_from(">Q", data, at + 8)
            if size < 8 or at + size > hi:
                break
            if tag in (b"moov", b"trak", b"mdia", b"minf",
                       b"stbl") and depth < 6:
                sub = dict(ctx) if tag == b"trak" else ctx
                walk(at + 8, at + size, depth + 1, sub)
                if tag == b"trak" and "stsz" in sub:
                    tables[sub.get("track_id", 0)] = dict(sub)
            elif tag == b"tkhd" and size >= 8 + 24:
                ctx["track_id"] = struct.unpack_from(
                    ">I", data, at + 20)[0]
            elif tag == b"mdhd" and size >= 8 + 20:
                ver = data[at + 8]
                ctx["timescale"] = struct.unpack_from(
                    ">I", data, at + (28 if ver == 1 else 20))[0]
            elif tag == b"stts":
                (cnt,) = struct.unpack_from(">I", data, at + 12)
                ctx["stts"] = [struct.unpack_from(
                    ">II", data, at + 16 + 8 * k)
                    for k in range(cnt)]
            elif tag == b"stsz":
                uniform, cnt = struct.unpack_from(">II", data,
                                                  at + 12)
                ctx["stsz"] = ([uniform] * cnt if uniform else
                               [struct.unpack_from(
                                   ">I", data, at + 20 + 4 * k)[0]
                                for k in range(cnt)])
            elif tag == b"stsc":
                (cnt,) = struct.unpack_from(">I", data, at + 12)
                ctx["stsc"] = [struct.unpack_from(
                    ">III", data, at + 16 + 12 * k)[:2]
                    for k in range(cnt)]
            elif tag == b"stco":
                (cnt,) = struct.unpack_from(">I", data, at + 12)
                ctx["stco"] = [struct.unpack_from(
                    ">I", data, at + 16 + 4 * k)[0]
                    for k in range(cnt)]
            elif tag == b"stss":
                (cnt,) = struct.unpack_from(">I", data, at + 12)
                ctx["stss"] = {struct.unpack_from(
                    ">I", data, at + 16 + 4 * k)[0]
                    for k in range(cnt)}
            at += size

    if data[4:8] != b"ftyp":
        return
    try:
        walk(0, len(data), 0, {})
    except (struct.error, IndexError):
        # a lying box size (declared table longer than the payload)
        # must drop the blob's unparsed tail, never kill the task —
        # tracks fully parsed before the corruption still index
        pass
    for tid, t in sorted(tables.items()):
        if not all(k in t for k in ("stts", "stsz", "stsc",
                                    "stco", "timescale")):
            continue
        sizes = t["stsz"]
        deltas = []
        for c, d in t["stts"]:
            deltas.extend([d] * c)
        if len(deltas) != len(sizes):
            continue
        ts = t["timescale"] or 1
        sync = t.get("stss")
        # expand stsc: samples-per-chunk of chunk c = entry with the
        # greatest first_chunk <= c
        stsc, stco = t["stsc"], t["stco"]
        dts, si = 0, 0
        for ci, coff in enumerate(stco, start=1):
            spc = 0
            for fc, s in stsc:
                if fc <= ci:
                    spc = s
            off = coff
            for _ in range(spc):
                if si >= len(sizes):
                    break
                yield (tid, si, off, sizes[si],
                       dts * 1000 // ts, deltas[si] * 1000 // ts,
                       sync is None or (si + 1) in sync)
                off += sizes[si]
                dts += deltas[si]
                si += 1



def mp4_sample_profile(df: DataFrame) -> DataFrame:
    """Per-SAMPLE MP4 profile over (media_id, payload) blobs: one row
    per sample with its absolute byte offset, size, decode timestamp,
    duration, and sync (keyframe) flag — derived purely from the
    ``stbl`` tables (``stts``/``stsz``/``stsc``/``stco``/``stss``, ISO
    14496-12 §8.5-8.7) via :func:`mp4_samples`, no codec decode. This
    is what a video pipeline needs to PLAN decode work: seek to
    keyframes, bound read ranges, profile bitrate over time — the
    exact-timing complement to ``sample_video_frames``'s uniform mvhd
    grid. Arrow-batched ``mapInPandas``, map-only; tracks without a
    complete table set yield no rows (truncation-safe)."""

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("media_id", "track_id",
                                    "sample_index", "byte_offset",
                                    "size_bytes", "dts_ms",
                                    "duration_ms", "is_sync")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = b"" if payload is None else bytes(payload)
                if len(data) < 12:
                    continue
                for (tid, si, off, sz, dts_ms, dur_ms,
                     is_sync) in mp4_samples(data):
                    cols["media_id"].append(int(mid))
                    cols["track_id"].append(tid)
                    cols["sample_index"].append(si)
                    cols["byte_offset"].append(off)
                    cols["size_bytes"].append(sz)
                    cols["dts_ms"].append(dts_ms)
                    cols["duration_ms"].append(dur_ms)
                    cols["is_sync"].append(bool(is_sync))
            yield pd.DataFrame(cols)

    return df.select("media_id", "payload").mapInPandas(
        profile, MP4_SAMPLE_SCHEMA)


KEYFRAME_SCHEMA = ("media_id long, grid_index int, sample_index int, "
                   "ts_ms long, byte_offset long, size_bytes int")


def sample_video_keyframes(df: DataFrame, n_frames: int = 8) -> DataFrame:
    """Keyframe-SNAPPED sampling grid over MP4 blobs: for each of
    ``n_frames`` midpoint-uniform timeline positions, emit the nearest
    PRECEDING sync sample (``stss``) with its exact timestamp and byte
    span — where a real decoder must START decoding to show that
    moment. :func:`sample_video_frames` gives the uniform grid a
    thumbnailer asks for; this gives the seek plan the decode job
    actually executes (decode work between keyframes is what the
    grid's cost model charges). Derived purely from the stbl tables
    via :func:`mp4_samples` — no codec decode, map-only; blobs without
    sample tables yield no rows. Multiple grid positions inside one
    keyframe interval legitimately repeat the sample (grid_index
    disambiguates)."""

    def keyframes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("media_id", "grid_index",
                                    "sample_index", "ts_ms",
                                    "byte_offset", "size_bytes")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = b"" if payload is None else bytes(payload)
                if len(data) < 12:
                    continue
                samples = [s for s in mp4_samples(data) if s[0] == 1]
                syncs = [s for s in samples if s[6]]
                if not syncs:
                    continue
                duration = samples[-1][4] + samples[-1][5]
                if duration <= 0:
                    continue
                for i in range(n_frames):
                    ts = duration * (i + 0.5) / n_frames
                    # nearest preceding sync (first sync if before all)
                    best = syncs[0]
                    for s in syncs:
                        if s[4] <= ts:
                            best = s
                        else:
                            break
                    cols["media_id"].append(int(mid))
                    cols["grid_index"].append(i)
                    cols["sample_index"].append(best[1])
                    cols["ts_ms"].append(best[4])
                    cols["byte_offset"].append(best[2])
                    cols["size_bytes"].append(best[3])
            yield pd.DataFrame(cols)

    return df.select("media_id", "payload").mapInPandas(
        keyframes, KEYFRAME_SCHEMA)


def _probe_mp4(data: bytes) -> dict:
    """Walk the top-level box tree for mvhd (duration/timescale) and
    trak/tkhd (count, dimensions) — header-only, no codec decode."""
    out = {"format": "mp4", "kind": "video", "n_tracks": 0,
           "duration_ms": None, "width": None, "height": None}

    def walk(lo: int, hi: int, depth: int) -> None:
        at = lo
        while at + 8 <= hi:
            (size,) = struct.unpack_from(">I", data, at)
            tag = data[at + 4:at + 8]
            if size == 1:            # 64-bit largesize
                (size,) = struct.unpack_from(">Q", data, at + 8)
            if size < 8 or at + size > hi:
                break
            if tag in (b"moov", b"trak") and depth < 4:
                walk(at + 8, at + size, depth + 1)
            elif tag == b"mvhd" and size >= 8 + 20:
                ver = data[at + 8]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, at + 28)
                else:
                    ts, dur = struct.unpack_from(">II", data, at + 20)
                if ts:
                    out["duration_ms"] = int(dur * 1000 // ts)
            elif tag == b"tkhd" and size >= 8 + 84:
                out["n_tracks"] += 1
                w, h = struct.unpack_from(">II", data, at + size - 8)
                out["width"], out["height"] = w >> 16, h >> 16
            at += size

    walk(0, len(data), 0)
    return out


# MPEG audio frame-header tables (ISO/IEC 11172-3 §2.4.2.3 / 13818-3) —
# Layer III bitrates in kbps by version; sample rates by version bits
# (00=MPEG2.5, 10=MPEG2, 11=MPEG1); index 15 / rate index 3 are invalid.
_MP3_KBPS = {
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    0: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def _mp3_frame_header(data: bytes, at: int):
    """Parse one Layer III frame header at ``at``; returns (frame_len,
    sample_rate, n_channels, samples_per_frame, version_bits) or None if
    the 4 bytes are not a valid CBR-decodable Layer III header (free
    bitrate — index 0 — has caller-defined frame length, so it is
    treated as unparseable)."""
    if at + 4 > len(data) or data[at] != 0xFF or (data[at + 1] & 0xE0) != 0xE0:
        return None
    b1, b2, b3 = data[at + 1], data[at + 2], data[at + 3]
    ver = (b1 >> 3) & 0x3
    layer = (b1 >> 1) & 0x3
    if ver == 1 or layer != 1:          # reserved version / not Layer III
        return None
    br_idx, sr_idx = (b2 >> 4) & 0xF, (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    kbps = _MP3_KBPS[ver][br_idx]
    rate = _MP3_RATES[ver][sr_idx]
    padding = (b2 >> 1) & 0x1
    channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
    spf = 1152 if ver == 3 else 576     # Layer III samples per frame
    frame_len = (spf // 8) * kbps * 1000 // rate + padding
    return frame_len, rate, channels, spf, ver, kbps


def _probe_mp3(data: bytes) -> dict:
    """Header-only MP3 metadata: skip any ID3v2 tag (syncsafe size),
    parse the first valid Layer III frame header for rate/channels, then
    either read the Xing/Info VBR tag's exact frame count or walk the
    frame chain (each header gives its own length — no entropy decode).
    Returns {} when no valid frame exists so the caller keeps
    format='unknown' for pseudo-synced garbage."""
    at = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        at = 10 + size
    # resync scan: tags/garbage may precede the first frame
    first = None
    while at + 4 <= len(data):
        first = _mp3_frame_header(data, at)
        if first is not None:
            break
        at += 1
    if first is None:
        return {}
    _, rate, channels, spf, ver, _kbps = first
    out = {"format": "mp3", "kind": "audio", "sample_rate": rate,
           "n_channels": channels, "duration_ms": None}
    # Xing/Info tag (first frame, after the side info) carries the exact
    # frame count for VBR streams where header-walking each frame would
    # mis-size on bitrate changes… which the walk below handles anyway,
    # but the tag makes truncated-payload probes (first frame only) exact
    side = (17 if channels == 1 else 32) if ver == 3 else \
           (9 if channels == 1 else 17)
    tag_at = at + 4 + side
    n_frames = None
    if data[tag_at:tag_at + 4] in (b"Xing", b"Info") and \
            tag_at + 12 <= len(data):
        (flags,) = struct.unpack_from(">I", data, tag_at + 4)
        if flags & 0x1:
            (n_frames,) = struct.unpack_from(">I", data, tag_at + 8)
    if n_frames is None:                # walk the frame chain
        n_frames, pos = 0, at
        while pos + 4 <= len(data):
            hdr = _mp3_frame_header(data, pos)
            if hdr is None:
                break
            n_frames += 1
            pos += hdr[0]
    if n_frames:
        out["duration_ms"] = n_frames * spf * 1000 // rate
    return out


def encode_mp3_frames(n_frames: int, sample_rate: int = 48000,
                      bitrate_kbps: int = 64, mono: bool = True,
                      xing: bool = False) -> bytes:
    """Deterministic MPEG1 Layer III fixture stream: ``n_frames`` valid
    frame headers with zeroed payloads (probe-parseable, not
    audio-decodable), optionally a Xing tag in the first frame carrying
    the exact frame count. 64 kbps @ 48 kHz gives a pad-free 192-byte
    frame and integral 24 ms/frame durations — closed-form oracle
    arithmetic."""
    sr_idx = _MP3_RATES[3].index(sample_rate)
    br_idx = _MP3_KBPS[3].index(bitrate_kbps)
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2),
                 0xC0 if mono else 0x00])
    frame = bytearray(hdr + b"\x00" * (frame_len - 4))
    out = bytearray()
    if xing:
        first = bytearray(frame)
        side = 17 if mono else 32
        first[4 + side:4 + side + 12] = (
            b"Xing" + struct.pack(">II", 0x1, n_frames))
        out += first
    else:
        out += frame
    for _ in range(n_frames - 1):
        out += frame
    return bytes(out)


def encode_mp3_vbr(bitrates_kbps: "Sequence[int]",
                   sample_rate: int = 48000, mono: bool = True,
                   id3_payload: int = 0) -> bytes:
    """Deterministic VBR fixture stream: one MPEG1 Layer III frame per
    entry of ``bitrates_kbps``, each frame at its own bitrate (zeroed
    payloads — header-parseable, not audio-decodable), optionally
    prefixed with an ID3v2 tag of ``id3_payload`` bytes (syncsafe size)
    so offset accounting across the tag skip is exercised too. At
    48 kHz every legal MPEG1 bitrate gives a pad-free 3*kbps-byte frame
    — closed-form oracle arithmetic."""
    sr_idx = _MP3_RATES[3].index(sample_rate)
    out = bytearray()
    if id3_payload:
        sz = id3_payload
        out += bytes([0x49, 0x44, 0x33, 4, 0, 0,
                      (sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                      (sz >> 7) & 0x7F, sz & 0x7F])
        out += b"\x00" * id3_payload
    for kbps in bitrates_kbps:
        br_idx = _MP3_KBPS[3].index(kbps)
        frame_len = 144 * kbps * 1000 // sample_rate
        out += bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2),
                      0xC0 if mono else 0x00])
        out += b"\x00" * (frame_len - 4)
    return bytes(out)


def encode_id3v2(frames: "Sequence[tuple]", version: int = 4,
                 padding: int = 0) -> bytes:
    """ID3v2.3/2.4 tag block for fixtures: ``frames`` is a sequence of
    (frame_id, text, encoding) with encoding in {0: latin-1, 1: utf-16
    with BOM, 3: utf-8 (v2.4 only)}. Frame sizes are syncsafe in v2.4
    and plain big-endian in v2.3, matching the spec split that trips
    naive parsers."""
    body = bytearray()
    for fid, text, enc in frames:
        if enc == 0:
            payload = bytes([0]) + text.encode("latin-1")
        elif enc == 1:
            payload = bytes([1]) + text.encode("utf-16")  # BOM included
        elif enc == 3:
            payload = bytes([3]) + text.encode("utf-8")
        else:
            raise ValueError(f"unsupported text encoding {enc}")
        n = len(payload)
        size = (bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                       (n >> 7) & 0x7F, n & 0x7F])
                if version == 4 else struct.pack(">I", n))
        body += fid.encode("ascii") + size + b"\x00\x00" + payload
    body += b"\x00" * padding
    total = len(body)
    return (b"ID3" + bytes([version, 0, 0,
                            (total >> 21) & 0x7F, (total >> 14) & 0x7F,
                            (total >> 7) & 0x7F, total & 0x7F])
            + bytes(body))


def parse_id3_frames(data: bytes):
    """Text frames of a leading ID3v2.3/2.4 tag as (frame_id, value)
    pairs — header-only struct parsing (id3.org spec): syncsafe sizes in
    v2.4, big-endian in v2.3; $00 latin-1 / $01 utf-16-BOM / $02
    utf-16-be / $03 utf-8 text encodings; stops at padding. Non-text
    frames (no leading ``T``) are skipped structurally. Returns [] when
    no tag leads the blob."""
    if data[:3] != b"ID3" or len(data) < 10:
        return []
    version = data[3]
    total = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
             | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    end = min(10 + total, len(data))
    at, out = 10, []
    while at + 10 <= end:
        fid = data[at:at + 4]
        if fid[0] == 0:                     # padding
            break
        if version >= 4:
            n = ((data[at + 4] & 0x7F) << 21 | (data[at + 5] & 0x7F) << 14
                 | (data[at + 6] & 0x7F) << 7 | (data[at + 7] & 0x7F))
        else:
            (n,) = struct.unpack_from(">I", data, at + 4)
        payload = data[at + 10:at + 10 + n]
        at += 10 + n
        if not fid.startswith(b"T") or not payload:
            continue
        enc, text = payload[0], payload[1:]
        try:
            if enc == 0:
                val = text.decode("latin-1")
            elif enc == 1:
                val = text.decode("utf-16")
            elif enc == 2:
                val = text.decode("utf-16-be")
            elif enc == 3:
                val = text.decode("utf-8")
            else:
                continue
        except UnicodeDecodeError:
            continue
        out.append((fid.decode("ascii"), val.rstrip("\x00")))
    return out


ID3_SCHEMA = "media_id long, frame_id string, value string"


def id3_text_frames(df: DataFrame) -> DataFrame:
    """ID3v2 text-frame extraction over (media_id, payload) audio blobs:
    one row per text frame (TIT2 title, TPE1 artist, TALB album, TDRC
    year, ...) — the metadata keys an audio-corpus pipeline dedups and
    groups by before any sample ever decodes. Arrow-batched
    ``mapInPandas``, map-only; blobs without a leading tag yield no
    rows."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {"media_id": [], "frame_id": [], "value": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = b"" if payload is None else bytes(payload)
                for fid, val in parse_id3_frames(data):
                    cols["media_id"].append(int(mid))
                    cols["frame_id"].append(fid)
                    cols["value"].append(val)
            yield pd.DataFrame(cols)

    return df.select("media_id", "payload").mapInPandas(
        extract, ID3_SCHEMA)


MP3_PROFILE_SCHEMA = ("media_id long, frame_index int, byte_offset long, "
                      "bitrate_kbps int, sample_rate int, frame_bytes int, "
                      "samples int")


def mp3_frames(data: bytes):
    """Walk one MP3 blob's frame chain (the per-blob unit of
    :func:`mp3_frame_profile`, exposed for driver-side use and direct
    testing): skip a leading ID3v2 tag (syncsafe size), resync past
    garbage, then yield ``(frame_index, byte_offset, bitrate_kbps,
    sample_rate, frame_bytes, samples)`` per valid Layer III header,
    stopping at the first broken chain link."""
    at = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        at = 10 + size
    while at + 4 <= len(data):              # resync scan
        if _mp3_frame_header(data, at) is not None:
            break
        at += 1
    idx = 0
    while at + 4 <= len(data):
        hdr = _mp3_frame_header(data, at)
        if hdr is None:
            break
        flen, rate, _ch, spf, _ver, kbps = hdr
        yield idx, at, kbps, rate, flen, spf
        idx += 1
        at += flen


def mp3_frame_profile(df: DataFrame) -> DataFrame:
    """Per-FRAME MP3 profile over (media_id, payload) blobs: one row per
    MPEG audio frame with its byte offset, bitrate, sample rate, frame
    length and sample count — the VBR-analysis primitive (bitrate
    histograms, exact sample-accurate durations, splice points for
    transcription chunking) that the single-row ``probe_media`` summary
    cannot give. Pure frame-header struct parsing (ISO/IEC 11172-3
    §2.4.2.3), no entropy decode — Arrow-batched ``mapInPandas``,
    map-only, no shuffle; output size is frames-per-blob bound, so the
    plan scales with corpus bytes, not cardinality. ID3v2 tags are
    skipped (syncsafe size), leading garbage is resynced past, and the
    walk stops at the first invalid chain header (truncation-safe)."""

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("media_id", "frame_index",
                                    "byte_offset", "bitrate_kbps",
                                    "sample_rate", "frame_bytes",
                                    "samples")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = b"" if payload is None else bytes(payload)
                for idx, at, kbps, rate, flen, spf in mp3_frames(data):
                    cols["media_id"].append(int(mid))
                    cols["frame_index"].append(idx)
                    cols["byte_offset"].append(at)
                    cols["bitrate_kbps"].append(kbps)
                    cols["sample_rate"].append(rate)
                    cols["frame_bytes"].append(flen)
                    cols["samples"].append(spf)
            yield pd.DataFrame(cols)

    return df.select("media_id", "payload").mapInPandas(
        profile, MP3_PROFILE_SCHEMA)


GIF_FRAME_SCHEMA = ("media_id long, frame_index int, delay_cs int, "
                    "disposal int, canvas_sum long, lit_px long")


def gif_frame_features(df: DataFrame) -> DataFrame:
    """Per-frame features of composited GIF animations over (media_id,
    payload): one row per frame with its GCE delay/disposal and two
    canvas statistics AFTER compositing — the RGB pixel sum and the
    count of non-background (lit) pixels. The compositing loop
    (``gif.decode_gif_frames``) honors transparency and disposal
    methods 1/2/3, so these statistics change whenever inter-frame
    state handling is wrong — a single-frame decoder cannot fake them.
    Arrow-batched ``mapInPandas``, map-only; output rows are bounded by
    frames-per-blob."""
    from .gif import decode_gif_frames

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("media_id", "frame_index", "delay_cs",
                                    "disposal", "canvas_sum", "lit_px")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_gif_frames(
                        b"" if payload is None else bytes(payload))
                except (NotImplementedError, ValueError, struct.error,
                        IndexError):
                    # non-GIF, truncated (struct.error / IndexError mid-
                    # descriptor or mid-extension), or corrupt blob in a
                    # mixed corpus: skip the blob, never the task
                    continue
                for k, fr in enumerate(frames):
                    canvas = fr["canvas"]
                    cols["media_id"].append(int(mid))
                    cols["frame_index"].append(k)
                    cols["delay_cs"].append(fr["delay_cs"])
                    cols["disposal"].append(fr["disposal"])
                    cols["canvas_sum"].append(
                        int(canvas.astype(np.int64).sum()))
                    cols["lit_px"].append(int(canvas.any(axis=2).sum()))
            yield pd.DataFrame(cols)

    return df.select("media_id", "payload").mapInPandas(
        feats, GIF_FRAME_SCHEMA)


def _sniff_jpeg_dims(data: bytes):
    """Read (height, width) from any SOFn marker — works for progressive
    streams the full decoder rejects (dimension sniffing needs no
    entropy decode)."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _, h, w = struct.unpack_from(">BHH", data, pos + 4)
            return h, w
        pos += 2 + seglen
    return None, None


def _probe_tiff(data: bytes) -> dict:
    """First-IFD walk (TIFF 6.0 §2): endian-aware tag scan for
    ImageWidth(256)/ImageLength(257)/SamplesPerPixel(277). Inline
    SHORT/LONG values only — offset-valued dims don't occur for these
    tags in practice (count is 1)."""
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    (n,) = struct.unpack_from(endian + "H", data, ifd_off)
    out = {"format": "tiff", "kind": "image"}
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(endian + "HHI", data, at)
        if tag not in (256, 257, 277) or cnt != 1 or typ not in (3, 4):
            continue
        val = struct.unpack_from(endian + ("H" if typ == 3 else "I"),
                                 data, at + 8)[0]
        out[{256: "width", 257: "height",
             277: "n_channels"}[tag]] = val
    return out


def _probe_webp(data: bytes) -> dict:
    """Dims from the first WebP chunk: VP8 lossy frame header (sync
    9D 01 2A then 14-bit LE dims), VP8L lossless (14-bit packed
    minus-one dims after the 0x2F signature), VP8X extended (24-bit LE
    canvas minus-one dims)."""
    out = {"format": "webp", "kind": "image"}
    fourcc = data[12:16]
    if fourcc == b"VP8 " and data[23:26] == b"\x9D\x01\x2A":
        w, h = struct.unpack_from("<HH", data, 26)
        out.update(width=w & 0x3FFF, height=h & 0x3FFF, n_channels=3)
    elif fourcc == b"VP8L" and data[20] == 0x2F:
        (bits,) = struct.unpack_from("<I", data, 21)
        out.update(width=(bits & 0x3FFF) + 1,
                   height=((bits >> 14) & 0x3FFF) + 1, n_channels=4)
    elif fourcc == b"VP8X":
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        out.update(width=w, height=h)
    return out


def encode_tiff_skeleton(width: int, height: int,
                         samples_per_pixel: int = 3,
                         big_endian: bool = False) -> bytes:
    """Minimal structurally-valid TIFF: header + one IFD carrying
    ImageWidth/ImageLength/SamplesPerPixel (no strip data — probe
    fixtures, like ``encode_mp4_skeleton``)."""
    e = ">" if big_endian else "<"
    entries = [(256, 4, struct.pack(e + "I", width)),
               (257, 4, struct.pack(e + "I", height)),
               (277, 3, struct.pack(e + "H", samples_per_pixel)
                + b"\x00\x00")]
    ifd = struct.pack(e + "H", len(entries))
    for tag, typ, val in entries:
        ifd += struct.pack(e + "HHI", tag, typ, 1) + val
    ifd += b"\x00" * 4
    head = b"MM\x00*" if big_endian else b"II*\x00"
    return head + struct.pack(e + "I", 8) + ifd


def encode_webp_skeleton(width: int, height: int,
                         lossless: bool = False) -> bytes:
    """Minimal WebP container with a real VP8/VP8L header (sync bytes +
    packed dimensions; no coefficient payload) — probe fixtures."""
    if lossless:
        bits = (width - 1) | ((height - 1) << 14)
        payload = bytes([0x2F]) + struct.pack("<I", bits)
        fourcc = b"VP8L"
    else:
        payload = (b"\x00\x00\x00" + b"\x9D\x01\x2A"
                   + struct.pack("<HH", width, height))
        fourcc = b"VP8 "
    chunk = fourcc + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def probe_media(data: bytes) -> dict:
    """Format sniff + header-only metadata extraction — the FIRST pass a
    100 TB media pipeline runs (route/filter/partition by what a blob
    IS before paying any decode cost). Pure struct parsing, no codec
    work: BMP/PNG header fields, JPEG SOFn dimensions (including
    progressive streams the full decoder refuses), WAV fmt chunk, MP4
    box tree (mvhd duration, tkhd track dims). Unknown bytes come back
    ``format='unknown'`` rather than raising — probing must never kill
    a batch."""
    out = {"format": "unknown", "kind": "unknown", "width": None,
           "height": None, "n_channels": None, "duration_ms": None,
           "sample_rate": None, "n_tracks": None, "n_bytes": len(data)}
    try:
        if data[:8] == PNG_SIGNATURE:
            w, h, depth, ctype = struct.unpack_from(">IIBB", data, 16)
            out.update(format="png", kind="image", width=w, height=h,
                       n_channels={0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype))
        elif data[:2] == b"BM" and len(data) >= 54:
            _, w, h, _, bpp, _ = struct.unpack_from("<IiiHHI", data, 14)
            out.update(format="bmp", kind="image", width=w, height=abs(h),
                       n_channels=bpp // 8)
        elif data[:2] == b"\xFF\xD8":
            h, w = _sniff_jpeg_dims(data)
            out.update(format="jpeg", kind="image", width=w, height=h,
                       n_channels=3)
        elif data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack_from("<HH", data, 6)
            out.update(format="gif", kind="image", width=w, height=h,
                       n_channels=3)
            # frame count via block walk (no LZW decode) — an animated
            # GIF routes differently from a still image; n_tracks reuses
            # the multi-stream slot the MP4 probe established
            flags = data[10]
            at, frames = 13 + ((2 << (flags & 0x7)) * 3
                               if flags & 0x80 else 0), 0
            while at < len(data) and data[at] not in (0x3B,):
                if data[at] == 0x21:                 # extension
                    at += 2
                elif data[at] == 0x2C:               # image descriptor
                    frames += 1
                    iflags = data[at + 9]
                    at += 10 + ((2 << (iflags & 0x7)) * 3
                                if iflags & 0x80 else 0) + 1
                else:
                    break
                while at < len(data) and data[at]:   # data sub-blocks
                    at += 1 + data[at]
                at += 1
            out.update(n_tracks=frames)
        elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            with wave.open(io.BytesIO(data), "rb") as wv:
                rate = wv.getframerate()
                out.update(format="wav", kind="audio",
                           n_channels=wv.getnchannels(), sample_rate=rate,
                           duration_ms=(wv.getnframes() * 1000 // rate
                                        if rate else None))
        elif len(data) >= 12 and data[4:8] == b"ftyp":
            out.update(_probe_mp4(data))
        elif data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            out.update(_probe_webp(data))
        elif data[:4] in (b"II*\x00", b"MM\x00*"):
            out.update(_probe_tiff(data))
        elif data[:3] == b"ID3" or (len(data) >= 4 and data[0] == 0xFF
                                    and (data[1] & 0xE0) == 0xE0):
            out.update(_probe_mp3(data))   # {} keeps 'unknown' on garbage
    except Exception:                       # noqa: BLE001 — never raise
        pass
    return out


PROBE_SCHEMA = ("media_id long, format string, kind string, width int, "
                "height int, n_channels int, duration_ms long, "
                "sample_rate int, n_tracks int, n_bytes long")


def probe_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas media probing over (media_id, payload) — Arrow batch
    in, one metadata row per blob out; header-only, so throughput is
    IO-bound, not codec-bound."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [probe_media(b"" if p is None else bytes(p))
                    for p in pdf["payload"]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "format", "kind", "width", "height",
                       "n_channels", "duration_ms", "sample_rate",
                       "n_tracks", "n_bytes"]]

    return df.select("media_id", "payload").mapInPandas(probe,
                                                        PROBE_SCHEMA)


AUDIO_FEATURE_SCHEMA = ("media_id long, n_frames long, sample_rate int, "
                        "duration_ms double, rms double, "
                        "zero_crossings long, dominant_bin int, "
                        "dominant_freq_hz double")


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction over PCM-WAV binary payloads
    (``media_id``, ``payload`` columns): frames/duration, RMS energy,
    zero-crossing count, dominant frequency (argmax of the rFFT
    magnitude spectrum, DC excluded) — the standard cheap screens for
    silence/clipping/tone detection in audio corpus curation.

    mapInPandas (Arrow batches) + vectorized numpy per blob; memory is
    bounded by the Arrow batch size. Multi-channel audio is averaged to
    mono before analysis. Compressed formats raise NotImplementedError
    from ``decode_audio`` at the documented integration point."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_frames", "sample_rate",
                                   "duration_ms", "rms", "zero_crossings",
                                   "dominant_bin", "dominant_freq_hz")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_audio(bytes(payload))
                mono = samples.astype(np.float64).mean(axis=1)
                n = len(mono)
                rms = float(np.sqrt(np.mean(mono ** 2))) if n else 0.0
                zc = int(np.sum(mono[1:] * mono[:-1] < 0)) if n > 1 else 0
                if n > 1:
                    spec = np.abs(np.fft.rfft(mono))
                    spec[0] = 0.0                      # ignore DC offset
                    k = int(spec.argmax())
                else:
                    k = 0
                out["media_id"].append(int(mid))
                out["n_frames"].append(n)
                out["sample_rate"].append(int(rate))
                out["duration_ms"].append(n * 1000.0 / rate if rate else 0.0)
                out["rms"].append(rms)
                out["zero_crossings"].append(zc)
                out["dominant_bin"].append(k)
                out["dominant_freq_hz"].append(k * rate / n if n else 0.0)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        feats, AUDIO_FEATURE_SCHEMA)


FRAME_SAMPLE_SCHEMA = ("media_id long, frame_index int, ts_ms double, "
                       "width int, height int, n_tracks int, "
                       "pixels binary, decoded boolean")


def sample_video_frames(df: DataFrame, n_frames: int = 8,
                        frame_decoder: Optional[
                            Callable[[bytes, float], bytes]] = None
                        ) -> DataFrame:
    """Uniform video frame sampling over (``media_id``, ``payload``)
    binary columns: each video blob expands to ``n_frames`` rows with
    midpoint-uniform timestamps ``ts_i = duration · (i + ½) / n`` plus
    the probed track dimensions — the standard grid for thumbnailing /
    vision-embedding extraction over a video corpus.

    The TIMELINE comes from the real header probe (``probe_media`` —
    mvhd duration, tkhd dimensions, header-only); the PIXEL decode is
    codec territory (ffmpeg — legitimately environment-bound in this
    build), so ``frame_decoder(payload, ts_ms) -> bytes`` is the
    documented integration hook: absent, rows carry ``pixels = NULL,
    decoded = false``; present, its bytes land in ``pixels`` unchanged.
    :func:`deequ_spark.llm.ffmpeg.make_ffmpeg_frame_decoder` is the
    reference implementation against a real codec stack (keyframe-seek
    subprocess per frame; tests/test_ffmpeg_hook.py, skipped where no
    ffmpeg binary exists).
    Exception: ANIMATED GIFs (>1 frame) decode fully in-process —
    ``gif.decode_gif_frames`` composites the GCE timeline and each
    sampled row carries the real canvas as BMP bytes with
    ``decoded = true`` (zero-delay frames take the 10 cs viewers
    substitute). Non-video payloads (or videos whose header yields no
    positive duration) produce ZERO rows — the operator is also the
    video filter.

    Spark shape: one ``mapInPandas`` (Arrow batch in, ≤ n·rows out),
    map-only — no shuffle; the n-fold row expansion happens inside the
    task, never via an exploded join."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_index", "ts_ms",
                                   "width", "height", "n_tracks",
                                   "pixels", "decoded")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = b"" if payload is None else bytes(payload)
                meta = probe_media(data)
                dur = meta.get("duration_ms")
                # animated GIF: the one video-like container this build
                # DECODES end-to-end (gif.decode_gif_frames) — pixels
                # are real composited canvases (BMP-encoded), timeline
                # from the GCE delays, no external decoder needed
                if (meta.get("format") == "gif"
                        and (meta.get("n_tracks") or 0) > 1):
                    from .gif import decode_gif_frames
                    try:
                        frames = decode_gif_frames(data)
                    except (NotImplementedError, ValueError, struct.error,
                            IndexError):
                        # the probe said "animated" but the full decode
                        # failed (truncated/corrupt stream): skip the
                        # blob, never the task -- the operator is also
                        # the video filter for mixed corpora
                        continue
                    ends, t = [], 0
                    for fr in frames:
                        # zero-delay frames get the 10 cs viewers use
                        t += (fr["delay_cs"] or 10) * 10
                        ends.append(t)
                    if t <= 0:
                        continue
                    for i in range(n_frames):
                        ts = t * (i + 0.5) / n_frames
                        k = next(j for j, e in enumerate(ends) if ts < e)
                        canvas = frames[k]["canvas"]
                        out["media_id"].append(mid)
                        out["frame_index"].append(i)
                        out["ts_ms"].append(ts)
                        out["width"].append(canvas.shape[1])
                        out["height"].append(canvas.shape[0])
                        out["n_tracks"].append(len(frames))
                        out["pixels"].append(encode_bmp(canvas))
                        out["decoded"].append(True)
                    continue
                if meta.get("kind") != "video" or not dur or dur <= 0:
                    continue
                for i in range(n_frames):
                    ts = dur * (i + 0.5) / n_frames
                    px = (frame_decoder(data, ts)
                          if frame_decoder is not None else None)
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["ts_ms"].append(ts)
                    out["width"].append(meta.get("width") or 0)
                    out["height"].append(meta.get("height") or 0)
                    out["n_tracks"].append(meta.get("n_tracks") or 0)
                    out["pixels"].append(px)
                    out["decoded"].append(px is not None)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        sample, FRAME_SAMPLE_SCHEMA)


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
    """Real resize for BMP/PNG payloads: decode (struct+numpy/zlib),
    nearest-neighbor resample via integer index maps, re-encode in the
    INPUT's format (PNG stays PNG with its channel count; BMP re-encodes
    24-bit). Other formats raise NotImplementedError from
    ``decode_image`` at the documented PIL integration point."""
    src_h, src_w, channels, pixels = decode_image(data)
    ys = np.minimum((np.arange(height) * src_h) // height, src_h - 1)
    xs = np.minimum((np.arange(width) * src_w) // width, src_w - 1)
    resized = pixels[ys][:, xs]
    if data[:8] == PNG_SIGNATURE:
        return encode_png(resized)
    if data[:2] == b"\xFF\xD8":
        from .jpeg import encode_jpeg
        return encode_jpeg(resized[:, :, 0] if channels == 1
                           else resized[:, :, :3])
    if data[:6] in (b"GIF87a", b"GIF89a"):
        # nearest-neighbor never invents colors, so the ≤256-color
        # invariant survives the resize and GIF stays GIF
        from .gif import encode_gif
        return encode_gif(resized[:, :, :3])
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
