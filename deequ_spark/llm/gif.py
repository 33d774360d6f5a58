"""Pure-stdlib GIF codec (GIF87a/GIF89a, ISO-adopted W3C spec): LZW
decompression + palette mapping for decode, and a real LZW compressor so
fixtures round-trip without PIL.

Reference parity note: the reference treats compressed image decode as an
environment-bound integration point; this codec (like ``png.py``-style
decode in multimodal.py and ``jpeg.py``) makes the common formats real on
a bare cluster image — spec-implementable with stdlib only.

Decode semantics: ``decode_gif`` returns the FIRST image frame
composited at its (left, top) offset onto the logical screen
(background-color-filled), in (height, width, 3) uint8 RGB — the
thumbnail/probe path. ``decode_gif_frames`` is the full ANIMATION path:
every frame composited in sequence honoring the Graphic Control
Extension (89a spec §23) — per-frame delay, transparency index, and
disposal methods 1 (leave), 2 (restore to background color over the
frame rect) and 3 (restore to the pre-frame canvas). The paired
``encode_gif_animation`` writes multi-frame GCE streams so the
compositing loop is round-trip-testable without PIL.

LZW width-transition semantics follow the de-facto standard (giflib):
a code is written/read at the CURRENT width, and the width grows to
``bits+1`` as soon as the number of assigned codes reaches ``1 << bits``
— checked after each code on both sides, so encoder and decoder stay
bit-aligned including across 12-bit saturation and CLEAR resets. Bits
pack LSB-first (spec Appendix F); the 1×1 fixture test pins the exact
packed bytes so the bit order cannot silently drift.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096  # 12-bit code space (spec Appendix F)


class _BitWriter:
    """LSB-first bit packer (GIF Appendix F byte order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, resets the table at 4096
    codes, ends with END-OF-INFORMATION."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    cs = mcs + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1

    def emit(code: int) -> None:
        nonlocal cs
        bw.write(code, cs)
        # late change: width grows AFTER the last code that fits
        if next_code >= (1 << cs) and cs < 12:
            cs += 1

    emit(clear)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code = next_code + 1
        else:                              # table full: reset
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            cs = mcs + 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(end)
    return bw.flush()


def _lzw_decode(data: bytes, mcs: int, expected: int) -> bytes:
    """Decode at most ``expected`` indices (trailing junk tolerated —
    real-world encoders pad the final sub-block)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    cs = mcs + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = nbits = pos = 0
    prev = None
    while len(out) < expected:
        while nbits < cs:
            if pos >= len(data):
                return bytes(out)          # truncated stream: best effort
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << cs) - 1)
        acc >>= cs
        nbits -= cs
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            cs = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):           # the KwKwK case
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(table[prev] + entry[:1])
        if len(table) >= (1 << cs) and cs < 12:
            cs += 1
        prev = code
    return bytes(out[:expected])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return np.asarray(rows)


def decode_gif(data: bytes):
    """Decode the first frame of a GIF87a/GIF89a stream. Returns
    ``(height, width, 3, pixels)`` (logical-screen-sized, frame
    composited at its offset over the background color) — the
    ``decode_image`` convention."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF stream")
    sw, sh, flags, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    at = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        gct = np.frombuffer(data, np.uint8, n * 3, at).reshape(n, 3)
        at += n * 3
    while at < len(data):
        block = data[at]
        if block == 0x21:                  # extension: skip sub-blocks
            at += 2
            while at < len(data) and data[at]:
                at += 1 + data[at]
            at += 1
        elif block == 0x2C:                # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", data,
                                                         at + 1)
            at += 10
            palette = gct
            if iflags & 0x80:              # local color table wins
                n = 2 << (iflags & 0x7)
                palette = np.frombuffer(data, np.uint8, n * 3,
                                        at).reshape(n, 3)
                at += n * 3
            if palette is None:
                raise ValueError("GIF frame without any color table")
            mcs = data[at]
            at += 1
            lzw = bytearray()
            while at < len(data) and data[at]:
                size = data[at]
                lzw += data[at + 1:at + 1 + size]
                at += 1 + size
            at += 1
            idx = np.frombuffer(_lzw_decode(bytes(lzw), mcs, w * h),
                                np.uint8)
            if len(idx) < w * h:           # truncated: pad with background
                idx = np.concatenate(
                    [idx, np.full(w * h - len(idx), bg, np.uint8)])
            frame = palette[np.minimum(idx, len(palette) - 1)] \
                .reshape(h, w, 3)
            if iflags & 0x40:              # interlaced: reorder rows
                out_rows = np.empty_like(frame)
                out_rows[_interlace_order(h)] = frame
                frame = out_rows
            screen = np.tile(
                (gct[bg] if gct is not None and bg < len(gct)
                 else np.zeros(3, np.uint8)), (sh, sw, 1)).astype(np.uint8)
            screen[top:top + h, left:left + w] = frame[:sh - top, :sw - left]
            return sh, sw, 3, screen
        elif block == 0x3B:                # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02X}")
    raise ValueError("GIF stream contains no image frame")


def decode_gif_frames(data: bytes):
    """Composite every frame of a GIF89a animation: returns a list of
    ``{"delay_cs", "disposal", "canvas"}`` dicts, ``canvas`` the full
    logical-screen (sh, sw, 3) uint8 RGB AFTER this frame is drawn —
    i.e. what a viewer shows during the frame's delay. GCE semantics
    per the 89a spec §23: transparency index pixels leave the canvas
    untouched; disposal is applied when ADVANCING to the next frame —
    1/0 leave the canvas, 2 restores the frame rect to the background
    color, 3 restores the pre-frame canvas snapshot."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF stream")
    sw, sh, flags, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    at = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        gct = np.frombuffer(data, np.uint8, n * 3, at).reshape(n, 3)
        at += n * 3
    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, np.uint8))
    canvas = np.tile(bg_rgb, (sh, sw, 1)).astype(np.uint8)
    frames = []
    gce = None                              # (disposal, delay_cs, tidx)
    while at < len(data):
        block = data[at]
        if block == 0x21:                  # extension
            label = data[at + 1]
            at += 2
            if label == 0xF9 and data[at] >= 4:
                packed, delay, tidx = struct.unpack_from("<BHB", data,
                                                         at + 1)
                gce = ((packed >> 2) & 0x7, delay,
                       tidx if packed & 0x1 else None)
            while at < len(data) and data[at]:
                at += 1 + data[at]
            at += 1
        elif block == 0x2C:                # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", data,
                                                         at + 1)
            at += 10
            palette = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x7)
                palette = np.frombuffer(data, np.uint8, n * 3,
                                        at).reshape(n, 3)
                at += n * 3
            if palette is None:
                raise ValueError("GIF frame without any color table")
            mcs = data[at]
            at += 1
            lzw = bytearray()
            while at < len(data) and data[at]:
                size = data[at]
                lzw += data[at + 1:at + 1 + size]
                at += 1 + size
            at += 1
            idx = np.frombuffer(_lzw_decode(bytes(lzw), mcs, w * h),
                                np.uint8)
            if len(idx) < w * h:
                idx = np.concatenate(
                    [idx, np.full(w * h - len(idx), bg, np.uint8)])
            idx = idx.reshape(h, w)
            if iflags & 0x40:
                out_rows = np.empty_like(idx)
                out_rows[_interlace_order(h)] = idx
                idx = out_rows
            disposal, delay_cs, tidx = gce if gce is not None \
                else (0, 0, None)
            # clip the frame rect to the logical screen; frames whose
            # origin lies past the screen edge clip to empty (legal to
            # parse -- just contributes no pixels)
            ch, cw = max(0, min(h, sh - top)), max(0, min(w, sw - left))
            sub = idx[:ch, :cw]
            rect = canvas[top:top + ch, left:left + cw]
            snapshot = canvas.copy() if disposal == 3 else None
            draw = np.ones((ch, cw), bool) if tidx is None \
                else (sub != tidx)
            rect[draw] = palette[np.minimum(sub, len(palette) - 1)][draw]
            frames.append({"delay_cs": int(delay_cs),
                           "disposal": int(disposal),
                           "canvas": canvas.copy()})
            if disposal == 2:
                canvas[top:top + ch, left:left + cw] = bg_rgb
            elif disposal == 3:
                canvas = snapshot
            gce = None                      # GCE applies to ONE frame
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02X}")
    return frames


def encode_gif_animation(screen_hw, frames, bg_rgb=(0, 0, 0)) -> bytes:
    """Multi-frame GIF89a writer for animation fixtures: ``frames`` is a
    list of dicts with ``patch`` ((h, w, 3) uint8 RGB), ``left``,
    ``top``, ``disposal`` (0-3), ``delay_cs``, and an optional
    ``transparent_mask`` ((h, w) bool — True pixels are written as the
    reserved transparent index). One GLOBAL color table: background
    color at index 0, every distinct patch color, plus one reserved
    transparent slot; ≤ 256 total or ValueError."""
    sh, sw = screen_hw
    bg_rgb = np.asarray(bg_rgb, np.uint8)
    colors = [bg_rgb.reshape(1, 3)]
    for fr in frames:
        colors.append(np.asarray(fr["patch"], np.uint8).reshape(-1, 3))
    uniq = np.unique(np.concatenate(colors), axis=0)
    # background first (index 0), then the rest in sorted order
    rest = uniq[~(uniq == bg_rgb).all(axis=1)]
    palette = np.concatenate([bg_rgb.reshape(1, 3), rest])
    tidx = len(palette)                     # reserved transparent slot
    if tidx + 1 > 256:
        raise ValueError(f"GIF supports at most 256 colors, "
                         f"got {tidx + 1}")
    lut = {tuple(c): k for k, c in enumerate(palette)}
    bits = max(1, int(tidx).bit_length())   # palette size = tidx + 1
    padded = np.full((2 << (bits - 1), 3), 255, np.uint8)
    padded[:len(palette)] = palette
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh,
                       0x80 | (7 << 4) | (bits - 1), 0, 0)
    out += padded.tobytes()
    for fr in frames:
        patch = np.asarray(fr["patch"], np.uint8)
        h, w = patch.shape[:2]
        mask = fr.get("transparent_mask")
        idx = np.array([[lut[tuple(px)] for px in row] for row in patch],
                       np.uint8)
        if mask is not None:
            idx[np.asarray(mask, bool)] = tidx
        packed = ((int(fr.get("disposal", 0)) & 0x7) << 2) \
            | (1 if mask is not None else 0)
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, packed,
                           int(fr.get("delay_cs", 0)), tidx, 0)
        out += struct.pack("<BHHHHB", 0x2C, int(fr.get("left", 0)),
                           int(fr.get("top", 0)), w, h, 0)
        out.append(mcs)
        lzw = _lzw_encode(idx.tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def encode_gif(pixels: "np.ndarray", interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (≤ 256 distinct colors — the
    format's hard palette bound; more raises ValueError rather than
    silently quantizing) as a single-frame GIF89a with a global color
    table and real LZW compression."""
    pixels = np.asarray(pixels, np.uint8)
    h, w = pixels.shape[:2]
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF supports at most 256 colors, "
                         f"got {len(palette)}")
    # palette padded to a power of two ≥ 2 (spec table-size encoding)
    bits = max(1, int(len(palette) - 1).bit_length())
    padded = np.zeros((2 << (bits - 1), 3), np.uint8)
    padded[:len(palette)] = palette
    mcs = max(2, bits)                     # LZW min code size ≥ 2 (spec)
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | (bits - 1), 0, 0)
    out += padded.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(mcs)
    lzw = _lzw_encode(idx.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
