"""Pure-stdlib media codecs: BMP, PPM/PGM, PNG, WAV.

No image/audio library exists in this environment (PIL/libav verified
absent), but these four formats are decodable with nothing beyond
``struct``/``zlib``/``wave`` — so the multimodal stages can run REAL bytes
end to end instead of stubbing the codec.  Decoders return
``(width, height, n_frames, pixels)`` where pixels is a ``uint8`` ndarray
``(h, w, channels)`` for images and an ``int16`` ndarray ``(n_frames,
channels)`` for WAV (width carries the sample rate, height the channel
count — the same metadata layout the fake-payload path uses).

Scope (conformance, not performance): 8-bit non-interlaced PNG
(gray/RGB/RGBA, all five scanline filters), 24-bit uncompressed BMP,
binary P5/P6 PNM, 16-bit PCM WAV.  The PNG Average/Paeth unfilter loops are
per-byte Python — fine for the small payloads these stages batch; a
production deployment swaps in a real codec behind the same
``decode_any`` interface.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(buf: bytes) -> str:
    """Format of a payload by magic bytes: png | bmp | pnm | wav."""
    if buf[:8] == _PNG_MAGIC:
        return "png"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:2] in (b"P5", b"P6"):
        return "pnm"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    raise ValueError("unrecognized media payload (png/bmp/pnm/wav supported)")


# --------------------------------------------------------------------------- #
# PNG
# --------------------------------------------------------------------------- #
def decode_png(buf: bytes):
    """8-bit non-interlaced PNG: zlib inflate + per-row unfilter
    (None/Sub/Up/Average/Paeth per the spec, sequential where the filter
    demands it)."""
    if buf[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = ch = None
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        typ = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace or comp or filt:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            ch = _PNG_CHANNELS.get(color)
            if ch is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        cur = np.frombuffer(raw[pos + 1:pos + 1 + stride], np.uint8).copy()
        pos += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            lanes = cur.reshape(w, ch).astype(np.int64)
            cur = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            cur = cur + prev  # uint8 wraps == mod 256
        elif f == 3:  # Average (left dependency -> sequential)
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = out[y]
    return int(w), int(h), 1, out.reshape(h, w, ch)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode uint8 pixels (h, w) or (h, w, ch) with ONE filter type for
    every row (0/1/2/3/4) — the filtered bytes are computed per the spec,
    so decode(encode(x, f)) == x exercises each unfilter path."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    rows = []
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = flat[y]
        left = np.zeros(stride, np.int64)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(stride, np.int64)
        upleft[ch:] = prev[:-ch]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - upleft
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        else:
            raise ValueError(filter_type)
        rows.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------- #
# BMP (24-bit uncompressed, BITMAPINFOHEADER)
# --------------------------------------------------------------------------- #
def decode_bmp(buf: bytes):
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", buf[10:14])[0]
    hdr_size = struct.unpack("<I", buf[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BMP core headers unsupported")
    w, h = struct.unpack("<ii", buf[18:26])
    bpp = struct.unpack("<H", buf[28:30])[0]
    comp = struct.unpack("<I", buf[30:34])[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    px = np.frombuffer(
        buf, np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flip:
        px = px[::-1]
    return int(w), int(h), 1, px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return head + info + data


# --------------------------------------------------------------------------- #
# PNM (binary P5 gray / P6 RGB)
# --------------------------------------------------------------------------- #
def decode_pnm(buf: bytes):
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("only binary P5/P6 PNM supported")
    ch = 3 if buf[:2] == b"P6" else 1
    # header tokens: magic, width, height, maxval; '#' comments to EOL
    toks, pos = [], 2
    while len(toks) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        toks.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    px = np.frombuffer(buf, np.uint8, count=w * h * ch, offset=pos)
    return int(w), int(h), 1, px.reshape(h, w, ch).copy()


def encode_pnm(pixels: np.ndarray) -> bytes:
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch == 1:
        magic = b"P5"
    elif ch == 3:
        magic = b"P6"
    else:
        raise ValueError("PNM is gray or RGB")
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


# --------------------------------------------------------------------------- #
# WAV (16-bit PCM via the stdlib wave module)
# --------------------------------------------------------------------------- #
def decode_wav(buf: bytes):
    with wave.open(io.BytesIO(buf), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate, nch, n = f.getframerate(), f.getnchannels(), f.getnframes()
        samples = np.frombuffer(f.readframes(n), np.int16).reshape(n, nch)
    return int(rate), int(nch), int(n), samples.copy()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    out = io.BytesIO()
    with wave.open(out, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return out.getvalue()


# --------------------------------------------------------------------------- #
# unified interface the decode stage uses
# --------------------------------------------------------------------------- #
def decode_any(buf: bytes):
    """(kind, width, height, n_frames, data ndarray) for any supported
    payload.  Images: width/height are pixel dims, data uint8 (h, w, ch).
    WAV: width=sample rate, height=#channels, n_frames=#samples,
    data int16 — the same metadata convention as the fake-payload path."""
    kind = sniff(buf)
    if kind == "png":
        w, h, fr, data = decode_png(buf)
    elif kind == "bmp":
        w, h, fr, data = decode_bmp(buf)
    elif kind == "pnm":
        w, h, fr, data = decode_pnm(buf)
    else:
        w, h, fr, data = decode_wav(buf)
    return kind, w, h, fr, data


def resize_nearest(pixels: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor image resize (the classic index-map gather)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return pixels[ys][:, xs]
