"""Pure-Python media codecs: PNG (full decode, all 5 scanline filters)
and WAV PCM — stdlib (``zlib``, ``struct``) + numpy only.

This replaces the round-1/2 "codecs are stubbed" boundary for the two
formats whose container + compression layers are fully expressible with
the standard library: PNG's DEFLATE stream is ``zlib`` and its scanline
filters are arithmetic; WAV PCM is a RIFF chunk walk plus a typed
``frombuffer``. JPEG/MP4/Opus still need external codec libraries and
remain declared out of scope (SURVEY §7.3).

Decode is the real thing, not header sniffing: ``decode_png`` inflates
the IDAT stream and **unfilters every scanline** (None/Sub/Up/Average/
Paeth — the same reconstruction PIL performs), returning the pixel
matrix; ``decode_wav`` walks RIFF chunks in any order and returns the
PCM sample array. The encode side exists so the suite can synthesize
deterministic media from ``doc_id`` and oracle the decoded features
against closed-form SQL — if any unfilter path or chunk walk were
wrong, the pixel/sample sums would not match.

On a cluster these run inside Arrow-batched ``mapInPandas`` stages (see
``multimodal.media_features``): payload bytes stay in the executor, one
Python call per file, numpy for the per-sample math.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color_type -> samples per pixel (palette/interlace unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filters_per_row: bool = True) -> bytes:
    """Encode an 8-bit image (H×W gray, or H×W×{2,3,4}) as a valid PNG.

    With ``filters_per_row`` each scanline uses filter type ``y % 5``, so a
    round-trip exercises every unfilter path in :func:`decode_png`.
    """
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch  # bytes per pixel at bit depth 8

    raw = bytearray()
    prev = np.zeros((w * ch,), dtype=np.int64)
    for y in range(h):
        line = a[y].reshape(-1).astype(np.int64)
        ft = (y % 5) if filters_per_row else 0
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), line[:-bpp]])
        up_left = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if ft == 0:
            filt = line
        elif ft == 1:  # Sub
            filt = line - left
        elif ft == 2:  # Up
            filt = line - prev
        elif ft == 3:  # Average
            filt = line - (left + prev) // 2
        else:  # Paeth
            filt = line - _paeth(left, prev, up_left)
        raw.append(ft)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = line

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, up_left: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4)."""
    p = left + up - up_left
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left)
    )


def decode_png(payload: bytes) -> tuple[dict, np.ndarray]:
    """Parse + inflate + unfilter a PNG; returns (meta, H×W×C uint8 array).

    Supports bit depth 8, color types 0/2/4/6, no interlace — i.e. every
    PNG :func:`encode_png` emits, and the common non-palette files. CRCs
    are verified; scanline reconstruction implements all five filter
    types per the PNG spec (the part "header stats" stubs skip).
    """
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, bytearray(), {}
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
            meta = {
                "width": w,
                "height": h,
                "bit_depth": depth,
                "channels": _PNG_CHANNELS[color],
                "color_type": color,
            }
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if not meta:
        raise ValueError("missing IHDR")

    w, h, ch = meta["width"], meta["height"], meta["channels"]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    bpp = ch

    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros((stride,), dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            recon = line
        elif ft == 2:  # Up — no intra-row dependency
            recon = (line + prev) % 256
        elif ft == 1:  # Sub — prefix sum by bpp stride (mod-256 associative)
            recon = line.reshape(-1, bpp).cumsum(axis=0).reshape(-1) % 256
        elif ft in (3, 4):  # Average / Paeth — left-neighbor recurrence
            # The recurrence is inherently sequential along the row, so
            # walk it with scalar Python ints: 1-element numpy slices pay
            # ~6 µs of dispatch per pixel (a megapixel image was ~3 s);
            # plain ints over lists are ~8× faster.
            ln, pv = line.tolist(), prev.tolist()
            rc = [0] * stride
            if ft == 3:
                for x in range(stride):
                    left = rc[x - bpp] if x >= bpp else 0
                    rc[x] = (ln[x] + ((left + pv[x]) >> 1)) & 255
            else:  # Paeth (spec §9.4); with p = a+b−c: |p−a|=|b−c| etc.
                for x in range(stride):
                    a = rc[x - bpp] if x >= bpp else 0
                    c = pv[x - bpp] if x >= bpp else 0
                    b = pv[x]
                    pa = b - c if b >= c else c - b
                    pb = a - c if a >= c else c - a
                    pc = a + b - 2 * c
                    if pc < 0:
                        pc = -pc
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    rc[x] = (ln[x] + pred) & 255
            recon = np.asarray(rc, dtype=np.int64)
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = recon
        prev = recon
    return meta, out.astype(np.uint8).reshape(h, w, ch)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------

def encode_wav(
    samples: np.ndarray, sample_rate: int, channels: int = 1
) -> bytes:
    """Encode int16 PCM samples ((n,) or (n, channels)) as a RIFF/WAVE file."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    assert s.shape[1] == channels
    data = s.astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[dict, np.ndarray]:
    """Walk RIFF chunks (any order, pad-byte aware) → (meta, n×ch int16)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, ch, rate, _brate, balign, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt} bits={bits}); "
                    "only PCM-16 is implemented"
                )
            fmt = {"channels": ch, "sample_rate": rate, "bits": bits}
        elif tag == b"data":
            data = body
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    s = np.frombuffer(data, dtype="<i2").reshape(-1, fmt["channels"])
    fmt["n_frames"] = s.shape[0]
    return fmt, s


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def decode_media(payload: bytes) -> dict:
    """Decode a media payload by magic bytes into a unified feature dict.

    PNG → pixel matrix is fully reconstructed; ``content_sum`` is the sum
    of all pixel values (wrong unfiltering ⇒ wrong sum). WAV → PCM frames
    are decoded; ``content_sum`` is the sum of |sample| over all frames.
    Formats needing external codec libs raise ValueError (declared
    boundary — JPEG/MP4/Opus, SURVEY §7.3).
    """
    if payload[:8] == PNG_MAGIC:
        meta, px = decode_png(payload)
        return {
            "kind": "png",
            "width": meta["width"],
            "height": meta["height"],
            "channels": meta["channels"],
            "sample_rate": None,
            "n_frames": None,
            "content_sum": int(px.astype(np.int64).sum()),
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        meta, s = decode_wav(payload)
        return {
            "kind": "wav",
            "width": None,
            "height": None,
            "channels": meta["channels"],
            "sample_rate": meta["sample_rate"],
            "n_frames": meta["n_frames"],
            "content_sum": int(np.abs(s.astype(np.int64)).sum()),
        }
    raise ValueError(
        "unsupported media format (only PNG and WAV PCM decode without "
        "external codec libraries)"
    )
