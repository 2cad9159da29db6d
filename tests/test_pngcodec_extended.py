"""Extended PNG decode paths: Adam7 interlace and 16-bit depth — both
hand-crafted (the in-repo encoder writes non-interlaced 8-bit, so these
streams exercise decoder-only paths), plus corrupt-structure contracts.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_pipeline2_spark.functions.imagecodec import (
    _ADAM7,
    decode_png,
    encode_png,
)


def _chunk(cid: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + cid
        + data
        + struct.pack(">I", zlib.crc32(cid + data))
    )


def _png(w, h, depth, ctype, interlace, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _adam7_raw(img, sample_bytes=1):
    """Serialize an (h, w, c) array into Adam7 pass scanlines, filter 0."""
    h, w = img.shape[:2]
    out = bytearray()
    for xs, ys, xstep, ystep in _ADAM7:
        sub = img[ys::ystep, xs::xstep]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        for y in range(ph):
            out.append(0)  # filter None
            row = sub[y]
            if sample_bytes == 2:
                out += row.astype(">u2").tobytes()
            else:
                out += row.astype(np.uint8).tobytes()
    return bytes(out)


@pytest.mark.parametrize("h,w", [(8, 8), (13, 21), (1, 1), (2, 3), (9, 1)])
def test_adam7_rgb_roundtrip(h, w):
    rng = np.random.RandomState(h * 100 + w)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    payload = _png(w, h, 8, 2, 1, _adam7_raw(img))
    dec = decode_png(payload)
    assert dec.shape == (h, w, 3)
    assert np.array_equal(dec, img)


def test_adam7_gray_alpha_roundtrip():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (11, 17, 2), dtype=np.uint8)
    payload = _png(17, 11, 8, 4, 1, _adam7_raw(img))
    assert np.array_equal(decode_png(payload), img)


def test_adam7_matches_noninterlaced_encode():
    """Same pixels through the in-repo encoder (interlace 0) and a
    hand-built Adam7 stream must decode identically."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (10, 14, 4), dtype=np.uint8)
    plain = decode_png(encode_png(img))
    inter = decode_png(_png(14, 10, 8, 6, 1, _adam7_raw(img)))
    assert np.array_equal(plain, inter)


def test_16bit_gray_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 65536, (7, 9, 1), dtype=np.uint16)
    raw = bytearray()
    for y in range(7):
        raw.append(0)
        raw += img[y].astype(">u2").tobytes()
    dec = decode_png(_png(9, 7, 16, 0, 0, bytes(raw)))
    assert dec.dtype == np.uint16
    assert np.array_equal(dec, img)


def test_16bit_rgb_interlaced_roundtrip():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 65536, (6, 10, 3), dtype=np.uint16)
    dec = decode_png(_png(10, 6, 16, 2, 1, _adam7_raw(img, sample_bytes=2)))
    assert dec.dtype == np.uint16
    assert np.array_equal(dec, img)


def test_16bit_sub_filter_defilters_bytewise():
    """PNG filters operate on BYTES even at 16-bit depth: a Sub-filtered
    16-bit row must reconstruct with bpp = channels*2 byte offsets."""
    img = np.array([[[1000, 2000], [3000, 4000], [5000, 6000]]], dtype=np.uint16)
    plain = img[0].astype(">u2").tobytes()
    filtered = bytearray([1])  # Sub
    bpp = 4  # 2 channels x 2 bytes
    for i, b in enumerate(plain):
        filtered.append((b - (plain[i - bpp] if i >= bpp else 0)) & 0xFF)
    dec = decode_png(_png(3, 1, 16, 4, 0, bytes(filtered)))
    assert np.array_equal(dec, img)


def test_interlaced_palette_roundtrip():
    palette = bytes(range(30))  # 10 RGB triples
    idx = (np.arange(63).reshape(7, 9) % 10).astype(np.uint8)
    payload = _png(
        9, 7, 8, 3, 1,
        _adam7_raw(idx[:, :, None]),
        extra=_chunk(b"PLTE", palette),
    )
    dec = decode_png(payload)
    expected = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)[idx]
    assert np.array_equal(dec, expected)


def test_truncated_interlaced_rejected():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    raw = _adam7_raw(img)
    payload = _png(8, 8, 8, 2, 1, raw[: len(raw) - 10])
    with pytest.raises((ValueError, zlib.error)):
        decode_png(payload)


def test_trailing_garbage_after_passes_rejected():
    rng = np.random.RandomState(10)
    img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    payload = _png(4, 4, 8, 2, 1, _adam7_raw(img) + b"\x00\x00\x00")
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(payload)


def test_bad_interlace_method_rejected():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    payload = _png(4, 4, 8, 2, 7, _adam7_raw(img))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(payload)


def test_sub8bit_gray_still_honest_seam():
    raw = bytes([0, 0b10100000])
    payload = _png(4, 1, 2, 0, 0, raw)
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_png_pixel_bomb_rejected_before_allocation():
    """A bit-flipped IHDR height must fail the size check loudly, not
    drive a giant allocation."""
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    payload = bytearray(_png(4, 4, 8, 2, 0, b"".join(
        b"\x00" + img[y].tobytes() for y in range(4))))
    i = payload.find(b"IHDR")
    payload[i + 8 : i + 12] = struct.pack(">I", 0xF8FF0000)  # huge height
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def test_png_bad_idat_is_valueerror_not_zlib_error():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    payload = bytearray(_png(4, 4, 8, 2, 0, raw))
    i = payload.find(b"IDAT")
    payload[i + 6] ^= 0xFF  # corrupt the zlib stream
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(bytes(payload))


def test_png_missing_idat_is_valueerror():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(payload)


def test_png_truncated_before_interlace_byte():
    """Payloads cut inside the IHDR data (probe-parseable dims but no
    interlace byte) must raise ValueError, not IndexError."""
    rng = np.random.RandomState(14)
    img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    payload = encode_png(img)
    for cut in (26, 27, 28):
        with pytest.raises(ValueError):
            decode_png(payload[:cut])


def test_png_zlib_bomb_bounded_inflate():
    """A tiny declared-dims PNG whose IDAT would inflate to ~100 MB must
    fail on the bounded decompress, never inflating past expected+1."""
    bomb = zlib.compress(bytes(100 * 1024 * 1024), 9)  # ~100 KB compressed
    payload = _png(8, 8, 8, 2, 0, b"")  # headers only
    payload = payload.replace(
        _chunk(b"IDAT", zlib.compress(b"")), _chunk(b"IDAT", bomb)
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(payload)
