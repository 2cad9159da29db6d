"""Baseline JPEG codec tests: exact constant-block roundtrips, bounded
error on arbitrary images, hand-rolled 4:2:0 and restart-marker streams
(paths the encoder doesn't emit), and never-garbage guarantees on
corrupt input."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline2_spark.functions.jpegcodec import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    ZIGZAG,
    _BitWriter,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
    make_jpeg_asset,
)


def _const_block_image(h, w, fn):
    bx = np.arange(w) // 8
    by = np.arange(h) // 8
    return (fn(np.add.outer(by, np.zeros_like(bx)), np.add.outer(np.zeros_like(by), bx)) % 256).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (41, 57), (7, 9), (1, 1), (100, 3)])
def test_constant_block_gray_roundtrip_exact(h, w):
    img = _const_block_image(h, w, lambda by, bx: bx * 7 + by * 13 + 5)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (h, w)
    assert np.array_equal(dec, img)


def test_fixture_decode_matches_closed_form():
    for aid in (0, 1, 17, 88, 119):
        w, h = 16 + aid % 89, 16 + aid % 47
        bx = np.arange(w) // 8
        by = np.arange(h) // 8
        expected = ((np.add.outer(by * 13, bx * 7) + aid) % 256).astype(np.uint8)
        assert np.array_equal(decode_jpeg(make_jpeg_asset(aid)), expected)


def test_random_gray_roundtrip_bounded_error():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (40, 72), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, qtable=[1] * 64))
    # all-ones quant: only FDCT/IDCT float rounding remains
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_random_rgb_roundtrip_bounded_error():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 33, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, qtable=[1] * 64))
    assert dec.shape == (24, 33, 3)
    # color adds one YCbCr<->RGB float roundtrip on top of the DCT
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 4


def test_coarse_qtable_error_bounded_by_quantizer():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    q = 16
    dec = decode_jpeg(encode_jpeg(img, qtable=[q] * 64))
    # worst-case quantization error per coefficient is q/2; the IDCT
    # spreads it but a generous linear bound still must hold
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 8 * q


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _write_dc_only_block(bw, value, pred, dc_codes, ac_codes):
    diff = value - pred[0]
    pred[0] = value
    s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    code, length = ac_codes[0x00]  # EOB
    bw.write(code, length)


def _headers(h, w, comps, qt_id=0):
    """comps: list of (component_id, h_samp, v_samp)."""
    zz_qt = bytes([8] * 64)
    dqt = _seg(0xDB, bytes([qt_id]) + zz_qt)
    sof_body = struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(
        bytes([cid, (hs << 4) | vs, qt_id]) for cid, hs, vs in comps
    )
    sof = _seg(0xC0, sof_body)
    dht = _seg(0xC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    dht += _seg(0xC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    sos = _seg(
        0xDA,
        bytes([len(comps)])
        + b"".join(bytes([cid, 0x00]) for cid, _, _ in comps)
        + b"\x00\x3f\x00",
    )
    return dqt, sof, dht, sos


def test_handrolled_420_subsampled_decode():
    """16x16 4:2:0 stream the encoder can't produce: 1 MCU with four
    DC-only Y blocks (values 40/80/120/160 by quadrant) and constant
    chroma at 128 (level-shifted 0) -> decodes to exact quadrants."""
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    pred = [0]
    for v in (40, 80, 120, 160):  # Y blocks, raster order within MCU
        _write_dc_only_block(bw, v - 128, pred, dc_codes, ac_codes)
    for _ in range(2):  # Cb, Cr: DC diff 0 from fresh predictors
        predc = [0]
        _write_dc_only_block(bw, 0, predc, dc_codes, ac_codes)
    bw.flush()
    dqt, sof, dht, sos = _headers(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)])
    payload = b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    dec = decode_jpeg(payload)
    assert dec.shape == (16, 16, 3)
    # neutral chroma => R == G == B == Y
    assert np.array_equal(dec[..., 0], dec[..., 1])
    assert np.array_equal(dec[..., 1], dec[..., 2])
    assert (dec[:8, :8, 0] == 40).all()
    assert (dec[:8, 8:, 0] == 80).all()
    assert (dec[8:, :8, 0] == 120).all()
    assert (dec[8:, 8:, 0] == 160).all()


def test_handrolled_restart_markers():
    """8x32 grayscale, DRI=2: predictors reset at the RST boundary, so
    a decoder that ignores restarts reads wrong DC values."""
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    values = [10, 60, 110, 210]
    scan = bytearray()
    pred = [0]
    bw = _BitWriter()
    for i, v in enumerate(values):
        if i == 2:  # restart boundary after 2 MCUs
            bw.flush()
            scan += bytes(bw.out) + b"\xff\xd0"
            bw = _BitWriter()
            pred = [0]
        _write_dc_only_block(bw, v - 128, pred, dc_codes, ac_codes)
    bw.flush()
    scan += bytes(bw.out)
    dri = _seg(0xDD, struct.pack(">H", 2))
    dqt, sof, dht, sos = _headers(8, 32, [(1, 1, 1)])
    payload = b"\xff\xd8" + dqt + dri + sof + dht + sos + bytes(scan) + b"\xff\xd9"
    dec = decode_jpeg(payload)
    assert dec.shape == (8, 32)
    for i, v in enumerate(values):
        assert (dec[:, i * 8 : (i + 1) * 8] == v).all(), (i, v)


def test_progressive_raises_not_implemented():
    img = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_zero_quantizer_rejected():
    img = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.find(b"\xff\xdb")
    payload[i + 5] = 0  # first quant entry -> 0
    with pytest.raises(ValueError, match="quantizer"):
        decode_jpeg(bytes(payload))


def test_truncated_scan_rejected():
    img = np.full((16, 16), 77, dtype=np.uint8)
    payload = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) - 40])


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.int32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8), qtable=[0] * 64)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_garbage_never_decodes_silently(data):
    """Arbitrary bytes either raise (ValueError / NotImplementedError)
    or — if they happen to be a valid stream — return a uint8 array.
    Never a silent wrong-shaped or wrong-typed result."""
    try:
        out = decode_jpeg(b"\xff\xd8" + data)
    except (ValueError, NotImplementedError, struct.error):
        return
    assert out.dtype == np.uint8


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_property_roundtrip_any_dims(h, w, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, qtable=[1] * 64))
    assert dec.shape == (h, w)
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == list(range(64))


def _patch_segment(payload: bytes, marker: bytes, new_body: bytes) -> bytes:
    """Replace a marker segment's body (and length) in a JPEG stream."""
    i = payload.find(marker)
    assert i >= 0
    seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
    return (
        payload[:i]
        + marker
        + struct.pack(">H", len(new_body) + 2)
        + new_body
        + payload[i + 2 + seglen :]
    )


def test_empty_sos_body_rejected():
    payload = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="SOS"):
        decode_jpeg(_patch_segment(payload, b"\xff\xda", b""))


def test_truncated_dht_rejected():
    payload = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="DHT"):
        decode_jpeg(_patch_segment(payload, b"\xff\xc4", b"\x00\x01\x02"))


def test_truncated_dri_rejected():
    payload = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = payload.find(b"\xff\xc0")
    # insert a truncated DRI before SOF
    bad = payload[:i] + b"\xff\xdd\x00\x03\x01" + payload[i:]
    with pytest.raises(ValueError, match="DRI"):
        decode_jpeg(bytes(bad))


def test_pixel_bomb_dimensions_rejected():
    payload = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = payload.find(b"\xff\xc0")
    # SOF h/w at offset +5/+7 -> 65535 x 65535
    payload[i + 5 : i + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        decode_jpeg(bytes(payload))
