"""Zero-dependency media decoders for the multimodal strict path.

The container has no Pillow/ffmpeg/librosa, but three common formats
are decodable with the standard library alone: PNG (stdlib ``zlib``
inflate + spec unfiltering), BMP (fixed-layout header + numpy), and
WAV (stdlib ``wave``). ``decode_gray_levels`` dispatches on magic
bytes and returns a flat uint8 intensity array (pixels as BT.601 luma,
audio samples mapped to 0..255), which ``stdlib_features`` folds into
the same 16-bucket L1-normalized histogram as the Pillow path — so
``extract_features(strict=True)`` produces REAL decoded-domain
features for these formats even with no decoder libraries installed.

Unknown formats still raise ``NotImplementedError`` (that is what
strict means); the byte-histogram fake remains the oracle-matched
default for non-strict runs.

Correctness-over-speed: the PNG Average/Paeth unfilters are per-pixel
Python (the spec's recurrences are sequential in the left neighbor);
Sub vectorizes as a per-lane modular cumsum and Up/None are pure
numpy. Real deployments install Pillow — ``extract_features`` prefers
it automatically — this module is the zero-dep correctness fallback,
and a 100 TB image sweep would decode inside the same Arrow-batched
``mapInPandas`` either way.

Luma parity: grayscale conversion uses Pillow's integer convert("L")
formula (L = (R*299 + G*587 + B*114) // 1000) so the stdlib and
Pillow paths agree bit-for-bit on the same image.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _luma(rgb: np.ndarray) -> np.ndarray:
    """BT.601 integer luma, Pillow convert("L") compatible.
    rgb: (..., 3) int64 array -> (...) uint8."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


# ---------------------------------------------------------------- PNG


def _png_chunks(data: bytes):
    pos = len(PNG_MAGIC)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Invert the PNG per-row filters (spec §6); returns (h, stride)
    uint8. Sub is a modular cumsum per byte lane; Average/Paeth are the
    spec's sequential recurrences."""
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).astype(np.int64)
        pos += stride
        if ftype == 0:  # None
            cur = row
        elif ftype == 1:  # Sub: cur[i] = row[i] + cur[i-bpp]
            cur = row.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def decode_png_gray(payload: bytes) -> np.ndarray:
    """PNG -> flat uint8 luma array. Supports bit depth 8, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    non-interlaced."""
    if not payload.startswith(PNG_MAGIC):
        raise NotImplementedError("not a PNG payload")
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise NotImplementedError(f"PNG bit depth {bit_depth}")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None or not idat:
        raise NotImplementedError("malformed PNG (missing IHDR/IDAT)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    px = _png_unfilter(raw, height, stride, channels).reshape(height, width, channels)
    if color_type == 0:
        return px[..., 0].ravel()
    if color_type == 4:  # gray + alpha: gray channel, like convert("L")
        return px[..., 0].ravel()
    if color_type == 3:
        if palette is None:
            raise NotImplementedError("palette PNG without PLTE")
        rgb = palette[px[..., 0].astype(np.int64)]
        return _luma(rgb).ravel()
    return _luma(px[..., :3].astype(np.int64)).ravel()


# ---------------------------------------------------------------- BMP


def decode_bmp_gray(payload: bytes) -> np.ndarray:
    """BMP (BITMAPINFOHEADER, uncompressed 8/24/32-bit) -> flat uint8
    luma array, honoring bottom-up vs top-down row order and 4-byte
    row padding."""
    if not payload.startswith(b"BM"):
        raise NotImplementedError("not a BMP payload")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size}")
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * bpp // 8 + 3) & ~3
    rows = []
    for y in range(height):
        start = data_off + y * row_bytes
        rows.append(
            np.frombuffer(payload[start : start + width * bpp // 8], dtype=np.uint8)
        )
    px = np.vstack(rows)
    if not top_down:
        px = px[::-1]
    if bpp == 8:
        # palette starts right after the DIB header; entries are BGRX.
        # Honor biClrUsed (bytes 46:50): an 8-bit BMP may declare fewer
        # than 256 entries, and slicing a fixed 1024 bytes would read
        # pixel data as palette (ADVICE r6). 0 means "full 256".
        (clr_used,) = struct.unpack("<I", payload[46:50])
        # clamp to 256: a malformed header can declare biClrUsed > 256
        # (or truncate the payload mid-palette) — without the clamp the
        # reshape/broadcast raises a bare numpy ValueError instead of
        # the module's NotImplementedError contract (ADVICE r7)
        n_entries = min(clr_used if clr_used else 256, 256)
        pal = np.zeros((256, 4), dtype=np.int64)
        raw_bytes = payload[14 + hdr_size : 14 + hdr_size + 4 * n_entries]
        raw = np.frombuffer(
            raw_bytes[: len(raw_bytes) & ~3], dtype=np.uint8
        ).reshape(-1, 4)
        if raw.shape[0] == 0:
            raise NotImplementedError("8-bit BMP with empty/truncated palette")
        pal[: raw.shape[0]] = raw  # out-of-palette indexes map to black
        rgb = pal[px.astype(np.int64)][..., [2, 1, 0]]
        return _luma(rgb).ravel()
    if bpp in (24, 32):
        n = bpp // 8
        px = px.reshape(height, width, n).astype(np.int64)
        rgb = px[..., [2, 1, 0]]  # BGR(A) -> RGB
        return _luma(rgb).ravel()
    raise NotImplementedError(f"BMP bit depth {bpp}")


# ---------------------------------------------------------------- WAV


def decode_wav_levels(payload: bytes) -> np.ndarray:
    """PCM WAV -> flat uint8 array: 8-bit samples pass through
    (already unsigned), 16-bit map linearly to 0..255 via
    (s + 32768) >> 8. Channels stay interleaved (a histogram is
    channel-order invariant)."""
    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        raise NotImplementedError("not a WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:
        return np.frombuffer(frames, dtype=np.uint8)
    if width == 2:
        s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        return ((s + 32768) >> 8).astype(np.uint8)
    raise NotImplementedError(f"WAV sample width {width}")


# ----------------------------------------------------------- dispatch


def decode_gray_levels(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch -> flat uint8 intensity array, or
    NotImplementedError for formats with no stdlib decoder (JPEG,
    WebP, MP3, …) — strict mode surfaces those instead of silently
    featurizing compressed bytes."""
    if payload.startswith(PNG_MAGIC):
        return decode_png_gray(payload)
    if payload.startswith(b"BM"):
        return decode_bmp_gray(payload)
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return decode_wav_levels(payload)
    raise NotImplementedError(
        "no stdlib decoder for this payload format (PNG/BMP/WAV supported; "
        "install Pillow for the full image path)"
    )


def encode_png_gray(px: np.ndarray) -> bytes:
    """(h, w) uint8 -> grayscale PNG (bit depth 8, color type 0,
    filter 0 rows). A spec-minimal writer: zlib-deflated scanlines
    with CRC'd chunks — round-trips exactly through decode_png_gray."""
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].astype(np.uint8).tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_image(payload: bytes, max_dim: int) -> tuple[bytes, int, int]:
    """REAL image resize for the stdlib-decodable formats: decode
    (PNG/BMP) -> luma plane -> nearest-neighbor downsample so the
    longer side is <= max_dim -> re-encode as grayscale PNG. Returns
    (new_payload, new_width, new_height). Upscaling never happens
    (scale capped at 1). The zero-dep path resizes via the luma plane;
    a Pillow deployment swaps a color-preserving callable into the
    same seam. Nearest-neighbor is chosen for exactness: every output
    pixel is an input pixel, no rounding-mode ambiguity across
    implementations."""
    if payload.startswith(PNG_MAGIC):
        # decode keeps only the luma plane; recover dims from IHDR
        w = h = None
        for ctype, body in _png_chunks(payload):
            if ctype == b"IHDR":
                w, h = struct.unpack(">II", body[:8])
                break
        if w is None:
            # match decode_png_gray's contract instead of a NameError
            raise NotImplementedError("malformed PNG (missing IHDR)")
        levels = decode_png_gray(payload).reshape(h, w)
    elif payload.startswith(b"BM"):
        width, height = struct.unpack("<ii", payload[18:26])
        w, h = width, abs(height)
        levels = decode_bmp_gray(payload).reshape(h, w)
    else:
        raise NotImplementedError("resize supports PNG/BMP payloads")
    scale = min(1.0, float(max_dim) / float(max(w, h)))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    ys = (np.arange(nh) * h) // nh
    xs = (np.arange(nw) * w) // nw
    out = levels[np.ix_(ys, xs)]
    return encode_png_gray(out), nw, nh


def wav_frame_slices(
    payload: bytes, frame_len: int = 1024, hop: int | None = None
) -> list[tuple[int, int, bytes]]:
    """REAL audio frame sampling: decode the PCM stream and return
    (frame_idx, offset_samples, frame_bytes) windows over the decoded
    sample domain — not raw file-byte offsets, which would slice
    through the RIFF header and split samples. frame_bytes is the raw
    little-endian PCM slice at the file's native sample width."""
    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        raise NotImplementedError("not a WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        nch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    step = width * nch
    n_samples = len(frames) // step
    hop = frame_len if hop is None else hop
    out = []
    idx = 0
    for off in range(0, max(n_samples, 1), hop):
        out.append((idx, off, frames[off * step : (off + frame_len) * step]))
        idx += 1
    return out


def stdlib_features(payload: bytes, feature_dim: int = 16) -> list[float]:
    """Decoded-domain featurization, identical recipe to the Pillow
    path: intensity histogram in ``feature_dim`` buckets,
    L1-normalized."""
    levels = decode_gray_levels(payload)
    if levels.size == 0:
        return [0.0] * feature_dim
    counts = np.bincount(
        levels.astype(np.int64) * feature_dim // 256, minlength=feature_dim
    )
    return (counts / float(levels.size)).tolist()
