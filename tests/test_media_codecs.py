"""Tests for the zero-dependency media decoders (media_codecs).

The encoders here are written IN THE TEST from the format specs
(PNG forward filtering, BMP layout, stdlib wave writer), so the
product decoders are checked against an independent implementation,
not against themselves.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from kairos_spark.operators import multimodal
from kairos_spark.operators.media_codecs import (
    decode_bmp_gray,
    decode_gray_levels,
    decode_png_gray,
    decode_wav_levels,
    stdlib_features,
)

# ------------------------------------------------------ test encoders


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def encode_png(px: np.ndarray, color_type: int, filters: list[int]) -> bytes:
    """Forward-filter PNG encoder (spec §6, independent of the
    decoder): px is (h, w) for gray or (h, w, c) for RGB/RGBA."""
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    bpp = c
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = cur & 0xFF
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif f == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) & 0xFF
        else:
            raise AssertionError(f)
        raw.extend(int(v) for v in enc)
        prev = cur
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def encode_bmp24(px_rgb: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = px_rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    rows = px_rgb if top_down else px_rgb[::-1]
    for row in rows:
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r])
        line += b"\x00" * (row_bytes - len(line))
        body += line
    data_off = 14 + 40
    hdr = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    )
    return hdr + bytes(body)


def encode_wav16(samples: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _hist16(levels: np.ndarray) -> list[float]:
    counts = np.bincount(levels.astype(np.int64) * 16 // 256, minlength=16)
    return (counts / float(levels.size)).tolist()


# ------------------------------------------------------------- decode


def test_png_gray_all_filters_roundtrip():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(10, 13), dtype=np.uint8)
    # one row of every filter type, cycling
    payload = encode_png(px, color_type=0, filters=[0, 1, 2, 3, 4])
    got = decode_png_gray(payload)
    assert np.array_equal(got, px.ravel())


def test_png_rgb_luma_matches_bt601():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    payload = encode_png(px, color_type=2, filters=[4, 3, 1, 2, 0])
    got = decode_png_gray(payload)
    r, g, b = (px[..., i].astype(np.int64) for i in range(3))
    want = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8).ravel()
    assert np.array_equal(got, want)


def test_png_rgba_ignores_alpha():
    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, size=(4, 4, 4), dtype=np.uint8)
    payload = encode_png(px, color_type=6, filters=[2, 4])
    got = decode_png_gray(payload)
    r, g, b = (px[..., i].astype(np.int64) for i in range(3))
    want = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8).ravel()
    assert np.array_equal(got, want)


def test_bmp24_bottom_up_and_top_down():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(7, 3, 3), dtype=np.uint8)
    want = (
        (px[..., 0].astype(np.int64) * 299
         + px[..., 1].astype(np.int64) * 587
         + px[..., 2].astype(np.int64) * 114) // 1000
    ).astype(np.uint8).ravel()
    for top_down in (False, True):
        got = decode_bmp_gray(encode_bmp24(px, top_down=top_down))
        assert np.array_equal(got, want), f"top_down={top_down}"


def test_wav16_maps_to_unsigned_levels():
    samples = np.array([-32768, -1, 0, 1, 32767, 256, -256], dtype=np.int64)
    got = decode_wav_levels(encode_wav16(samples))
    want = ((samples + 32768) >> 8).astype(np.uint8)
    assert np.array_equal(got, want)


def test_dispatch_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_gray_levels(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(NotImplementedError):
        stdlib_features(b"just some text bytes")


def test_png_property_roundtrip():
    """Property: any (h, w, channels) uint8 image with any filter
    assignment round-trips exactly through encode (in-test, forward
    spec) -> decode (product)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        ct=st.sampled_from([0, 2, 6]),
        seed=st.integers(0, 2**31 - 1),
        f0=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    )
    def check(h, w, ct, seed, f0):
        c = {0: 1, 2: 3, 6: 4}[ct]
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
        got = decode_png_gray(encode_png(px, color_type=ct, filters=f0))
        if ct == 0:
            want = px[..., 0].ravel()
        else:
            r, g, b = (px[..., i].astype(np.int64) for i in range(3))
            want = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8).ravel()
        assert np.array_equal(got, want)

    check()


# -------------------------------------------------------- end to end


def test_resize_image_nearest_neighbor_exact():
    from kairos_spark.operators.media_codecs import resize_image

    px = np.arange(12 * 8, dtype=np.uint8).reshape(12, 8)
    payload = encode_png(px, color_type=0, filters=[0, 2, 1])
    out, nw, nh = resize_image(payload, max_dim=6)
    assert (nw, nh) == (4, 6)  # 8x12 scaled by 6/12
    got = decode_png_gray(out).reshape(nh, nw)
    ys, xs = (np.arange(6) * 12) // 6, (np.arange(4) * 8) // 4
    assert np.array_equal(got, px[np.ix_(ys, xs)])
    # no upscaling: already-small image passes through at same dims
    _, w2, h2 = resize_image(payload, max_dim=100)
    assert (w2, h2) == (8, 12)


def test_resize_media_spark_path(spark):
    from kairos_spark.operators import multimodal

    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, size=(20, 30, 3), dtype=np.uint8)
    payload = encode_png(px, color_type=2, filters=[0, 1, 2, 3, 4])
    media = spark.createDataFrame(
        [(7, bytearray(payload), "image/png", len(payload), 30, 20)],
        schema=multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.resize_media(media, max_dim=10).collect()[0]
    assert row.width == 10 and row.height == 6  # 30x20 * (10/30)
    got = decode_png_gray(bytes(row.payload))
    assert got.size == 60 and row.mime == "image/png"


def test_audio_frame_sample_sample_domain(spark):
    from kairos_spark.operators import multimodal

    samples = np.arange(-100, 150, dtype=np.int64)  # 250 samples
    payload = encode_wav16(samples)
    media = spark.createDataFrame(
        [(3, bytearray(payload), "audio/wav", len(payload), 0, 0)],
        schema=multimodal.MEDIA_SCHEMA,
    )
    rows = sorted(
        multimodal.audio_frame_sample(media, frame_len=100, hop=100).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.offset_samples for r in rows] == [0, 100, 200]
    # frames are exact PCM slices in the decoded sample domain
    for r in rows:
        got = np.frombuffer(bytes(r.frame), dtype="<i2").astype(np.int64)
        want = samples[r.offset_samples : r.offset_samples + 100]
        assert np.array_equal(got, want)


def test_extract_features_strict_decodes_real_media(spark):
    """strict=True on a media table of REAL payloads (PNG + BMP + WAV)
    returns decoded-domain histograms — no decoder libs installed."""
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(9, 9), dtype=np.uint8)
    rgb = rng.randint(0, 256, size=(5, 8, 3), dtype=np.uint8)
    samples = rng.randint(-32768, 32768, size=400).astype(np.int64)
    payloads = {
        1: encode_png(gray, color_type=0, filters=[0, 1, 2, 3, 4]),
        2: encode_bmp24(rgb),
        3: encode_wav16(samples),
    }
    want = {
        1: _hist16(gray.ravel()),
        2: _hist16(
            ((rgb[..., 0].astype(np.int64) * 299
              + rgb[..., 1].astype(np.int64) * 587
              + rgb[..., 2].astype(np.int64) * 114) // 1000).ravel()
        ),
        3: _hist16(((samples + 32768) >> 8)),
    }
    media = spark.createDataFrame(
        [(k, bytearray(v), "media/mixed", len(v), 0, 0) for k, v in payloads.items()],
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in multimodal.extract_features(media, strict=True).collect()}
    for k in payloads:
        assert out[k].n_bytes == len(payloads[k])
        assert out[k].features == pytest.approx(want[k], abs=1e-12)
    # and the features differ from the raw-byte fake (decode is real)
    fake = {r.media_id: r for r in multimodal.extract_features(media).collect()}
    assert fake[1].features != out[1].features


def encode_bmp8(px_idx: np.ndarray, palette_grays: list[int]) -> bytes:
    """8-bit palettized BMP declaring EXACTLY len(palette_grays) palette
    entries via biClrUsed (not the full 256) — pixel data starts right
    after the short palette."""
    h, w = px_idx.shape
    row_bytes = (w + 3) & ~3
    pal = bytearray()
    for g in palette_grays:
        pal += bytes([g, g, g, 0])  # BGRX, gray
    body = bytearray()
    for row in px_idx[::-1]:  # bottom-up
        line = bytearray(int(v) for v in row)
        line += b"\x00" * (row_bytes - len(line))
        body += line
    data_off = 14 + 40 + len(pal)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835,
            len(palette_grays), 0,
        )
    )
    return hdr + bytes(pal) + bytes(body)


def test_bmp8_short_palette_honors_biclrused():
    """ADVICE r6: an 8-bit BMP declaring fewer than 256 palette entries
    must not read pixel data as palette — decode through biClrUsed."""
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    grays = [0, 85, 170, 255]
    payload = encode_bmp8(idx, grays)
    got = decode_bmp_gray(payload).reshape(2, 4)
    want = np.array(grays, dtype=np.int64)[idx]
    assert (got == want).all()


def test_bmp8_biclrused_zero_means_full_256():
    idx = np.array([[0, 255], [128, 7]], dtype=np.uint8)
    grays = list(range(256))
    payload = encode_bmp8(idx, grays)
    # patch biClrUsed to 0 (the "full palette" convention)
    payload = payload[:46] + struct.pack("<I", 0) + payload[50:]
    got = decode_bmp_gray(payload).reshape(2, 2)
    assert (got == idx.astype(np.int64)).all()


def test_bmp8_oversized_biclrused_raises_not_implemented():
    """ADVICE r7: biClrUsed > 256 (malformed) must hit the documented
    NotImplementedError contract, not a numpy broadcast ValueError.
    The clamp decodes the first 256 entries; here the declared count
    pushes data_off past the payload so the palette read truncates."""
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    payload = encode_bmp8(idx, [0, 255])
    # patch biClrUsed to a bogus 100000 entries
    bad = payload[:46] + struct.pack("<I", 100_000) + payload[50:]
    got = decode_bmp_gray(bad).reshape(2, 2)
    # clamped decode still honors the 2 real entries (rest map black)
    want = np.array([0, 255], dtype=np.int64)[idx]
    assert (got == want).all()


def test_bmp8_truncated_palette_raises_not_implemented():
    """Payload cut inside the declared palette → NotImplementedError
    (empty palette after truncation to whole 4-byte entries)."""
    idx = np.array([[0]], dtype=np.uint8)
    payload = encode_bmp8(idx, [0, 255])
    # cut the payload right after the DIB header + 2 palette bytes
    cut = payload[: 14 + 40 + 2]
    with pytest.raises(NotImplementedError):
        decode_bmp_gray(cut)


def test_resize_png_missing_ihdr_raises_not_implemented():
    """ADVICE r6: resize_image on an IHDR-less PNG chunk stream must
    raise the module's NotImplementedError contract, not NameError."""
    from kairos_spark.operators.media_codecs import PNG_MAGIC, resize_image

    bogus = PNG_MAGIC + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        resize_image(bogus, 16)
