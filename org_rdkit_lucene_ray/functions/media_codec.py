"""Pure-python media codecs — PNG (stdlib zlib) and WAV (stdlib wave).

The multimodal stages (stages/multimodal.py) keep the codec behind a
per-actor seam; this module makes ``decoder="real"`` real for the two
formats a pure-python environment can honestly decode:

- **PNG**: chunk parse + zlib inflate + the five scanline filters
  (RFC 2083 §6). Supports the common web shapes: 8-bit greyscale /
  RGB / RGBA, non-interlaced. Everything else raises loudly (the
  seam's contract: fail, never fake).
- **WAV**: RIFF PCM via the stdlib ``wave`` module, 16-bit samples.

Encoders exist for both (PNG filter-per-row selectable so tests cover
every unfilter path; WAV via ``wave``) — they make round-trip tests and
ResizeStage's re-encode possible without any third-party library.

Perf note: decode cost is per-payload and lives inside an actor-pool
``map_batches`` stage (one actor initializes the dispatch table once,
each payload decodes independently) — the Ray-side scaling story is the
pool size, not this module. Row unfiltering is numpy per row; SUB/AVG/
PAETH are sequential by definition (each reconstructed byte feeds the
next), so those loop over row bytes in python — acceptable for a codec
seam, replaceable by a C codec behind the same function signature.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}          # colour type -> channel count


def png_encode(pixels: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array (c in 1/3/4) as a PNG.
    ``filter_type`` applies the same scanline filter to every row (0-4) —
    tests use this to exercise each decoder unfilter path."""
    if pixels.dtype != np.uint8:
        raise ValueError("png_encode: pixels must be uint8")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise ValueError(f"png_encode: unsupported channel count {c}")
    raw = pixels.reshape(h, w * c).astype(np.int64)
    out_rows = []
    prior = np.zeros(w * c, np.int64)
    for y in range(h):
        row = raw[y]
        left = np.concatenate([np.zeros(c, np.int64), row[:-c]])
        ul = np.concatenate([np.zeros(c, np.int64), prior[:-c]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prior
        elif filter_type == 3:
            filt = row - (left + prior) // 2
        elif filter_type == 4:
            p = left + prior - ul
            pa_ = np.abs(p - left)
            pb = np.abs(p - prior)
            pc_ = np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prior, ul))
            filt = row - pred
        else:
            raise ValueError(f"png_encode: bad filter {filter_type}")
        out_rows.append(bytes([filter_type])
                        + (filt % 256).astype(np.uint8).tobytes())
        prior = row
    idat = zlib.compress(b"".join(out_rows))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an (h, w, c) uint8 array. Supports 8-bit
    greyscale (c=1) / RGB (c=3) / RGBA (c=4), non-interlaced; anything
    else raises ``NotImplementedError`` (palette, 16-bit, Adam7)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("png_decode: bad PNG signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("png_decode: truncated chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("png_decode: missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or interlace != 0 or comp != 0:
        raise NotImplementedError(
            f"png_decode: unsupported PNG (depth={depth} colour={ctype} "
            f"interlace={interlace}) — 8-bit grey/RGB/RGBA only")
    c = _CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("png_decode: inflated size mismatch")
    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int64)
        if ft == 0:
            rec = row
        elif ft == 2:                              # up: fully vectorized
            rec = (row + prior) % 256
        elif ft in (1, 3, 4):                      # sequential in x
            rec = np.zeros(stride, np.int64)
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                up = prior[i]
                ul = prior[i - c] if i >= c else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (left if pa_ <= pb and pa_ <= pc_
                            else up if pb <= pc_ else ul)
                rec[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"png_decode: bad filter byte {ft}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out.reshape(h, w, c)


def wav_encode(samples: np.ndarray, *, sample_rate: int = 16000) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as a PCM WAV."""
    if samples.dtype != np.int16:
        raise ValueError("wav_encode: samples must be int16")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(samples.shape[1])
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload -> ((n, channels) int16 array, rate).
    16-bit PCM only; other sample widths raise ``NotImplementedError``."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise NotImplementedError(
                f"wav_decode: {8 * wv.getsampwidth()}-bit samples — "
                "16-bit PCM only")
        n, ch = wv.getnframes(), wv.getnchannels()
        rate = wv.getframerate()
        data = np.frombuffer(wv.readframes(n), np.int16)
    return data.reshape(-1, ch), rate


def image_feature(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Unit-norm float32 feature from decoded pixels: ``dim``-bin
    luminance histogram (mean over channels) — a real, deterministic
    content feature (two images differing in pixels differ here)."""
    lum = pixels.astype(np.float32).mean(axis=2).ravel()
    hist, _ = np.histogram(lum, bins=dim, range=(0.0, 256.0))
    v = hist.astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def audio_feature(samples: np.ndarray, dim: int) -> np.ndarray:
    """Unit-norm float32 feature from decoded PCM: ``dim``-bin histogram
    of the mono-mixdown amplitude."""
    mono = samples.astype(np.float32).mean(axis=1)
    hist, _ = np.histogram(mono, bins=dim, range=(-32768.0, 32768.0))
    v = hist.astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def resize_nearest(pixels: np.ndarray, width: int, height: int,
                   channels: int) -> np.ndarray:
    """Nearest-neighbour resize + channel adaptation to (height, width,
    channels): grey replicates, extra channels truncate, RGB->RGBA pads
    opaque alpha."""
    h, w, c = pixels.shape
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    out = pixels[ys[:, None], xs[None, :], :]
    if c < channels:
        if c == 1:
            out = np.repeat(out, channels, axis=2)
        else:                                      # RGB -> RGBA
            pad = np.full((height, width, channels - c), 255, np.uint8)
            out = np.concatenate([out, pad], axis=2)
    elif c > channels:
        out = out[:, :, :channels]
    return np.ascontiguousarray(out)
