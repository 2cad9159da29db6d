"""Pure-stdlib (+numpy) image/audio codecs for the multimodal surface.

The container ships no PIL/ffmpeg, but real container formats are still
parseable with struct + zlib + numpy:

- header PROBES (dimensions / mode / duration) for PNG, JPEG, GIF, BMP
  and WAV — byte-exact parsing of the public container specs;
- a REAL PNG codec: decode (all five scanline filters, 8-bit
  gray/LA/RGB/RGBA plus palette colortype 3 at depths 1/2/4/8 with
  PLTE + tRNS, non-interlaced), nearest-neighbor resize, encode
  (truecolor and 8-bit palette). 16-bit/interlaced PNGs and non-PNG
  pixel work raise NotImplementedError — those genuinely need
  external codecs.

This is the real implementation behind operators/multimodal.py's seams
(reference ingests arbitrary binary uploads, document_processor.py:47-74);
the deterministic fixture generator (`make_asset`) emits real files of
every probe-able format so the driver oracle can verify the parsers
end-to-end: the oracle recomputes the dimensions the generator embedded,
the engine re-reads them from the actual bytes.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------- probes

_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_JPEG_SOF = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # SOFn markers


def probe_image(payload: bytes) -> dict | None:
    """Parse container headers → {format, width, height, mode} or None
    when the payload is not a recognized image container."""
    if len(payload) < 12:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", payload[16:24])
        depth, ctype = payload[24], payload[25]
        return {
            "format": "png",
            "width": w,
            "height": h,
            "mode": _PNG_MODES.get(ctype, f"ctype{ctype}"),
            "depth": depth,
        }
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h, "mode": "P"}
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return {"format": "bmp", "width": w, "height": abs(h), "mode": "RGB"}
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk marker segments
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                ncomp = payload[i + 9]
                mode = {1: "L", 3: "YCbCr", 4: "CMYK"}.get(ncomp, f"c{ncomp}")
                return {"format": "jpeg", "width": w, "height": h, "mode": mode}
            i += 2 + seglen
        return None
    return None


def probe_wav(payload: bytes) -> dict | None:
    """RIFF/WAVE probe → {format, duration_ms, sample_rate, channels}."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    duration_ms = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(payload):
            _, channels, rate, byte_rate = struct.unpack(
                "<HHII", payload[i + 8 : i + 20]
            )
            fmt = (channels, rate, byte_rate)
        elif cid == b"data" and fmt and fmt[2]:
            duration_ms = int(clen * 1000 / fmt[2])
        i += 8 + clen + (clen & 1)
    if fmt is None:
        return None
    return {
        "format": "wav",
        "duration_ms": duration_ms,
        "sample_rate": fmt[1],
        "channels": fmt[0],
    }


# ------------------------------------------------------------- PNG codec

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes):
    """PNG → numpy uint8 array of shape (h, w, channels).

    Supports 8-bit gray / gray+alpha / RGB / RGBA plus PALETTE images
    (colortype 3, bit depth 1/2/4/8, PLTE + optional tRNS — resolved to
    RGB/RGBA), non-interlaced. 16-bit and interlaced images raise
    NotImplementedError — those genuinely need a full codec library.
    Corrupt structures (bad PLTE length, out-of-range palette index,
    size mismatch) raise ValueError, never return garbage pixels.
    """
    import numpy as np

    info = probe_image(payload)
    if not info or info["format"] != "png":
        raise ValueError("not a PNG payload")
    w, h, depth = info["width"], info["height"], info["depth"]
    ctype = {v: k for k, v in _PNG_MODES.items()}.get(info["mode"])
    interlace = payload[28]
    if interlace != 0:
        raise NotImplementedError("interlaced PNG needs a full codec library")
    if ctype == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"corrupt PNG: palette bit depth {depth}")
        bpp, stride = 1, (w * depth + 7) // 8
    elif depth == 8 and ctype in _CHANNELS:
        bpp = _CHANNELS[ctype]
        stride = w * bpp
    else:
        raise NotImplementedError(
            f"PNG depth={depth} colortype={ctype} needs a full codec library"
        )
    # walk chunks: concatenate IDAT, pick up PLTE/tRNS for palette images
    i, idat, plte, trns = 8, [], None, None
    while i + 8 <= len(payload):
        clen = struct.unpack(">I", payload[i : i + 4])[0]
        cid = payload[i + 4 : i + 8]
        if cid == b"IDAT":
            idat.append(payload[i + 8 : i + 8 + clen])
        elif cid == b"PLTE":
            plte = payload[i + 8 : i + 8 + clen]
        elif cid == b"tRNS":
            trns = payload[i + 8 : i + 8 + clen]
        elif cid == b"IEND":
            break
        i += 12 + clen  # len + id + data + crc
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: decompressed size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        line = data[y].copy()
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            pass
        elif f == 1:  # Sub — sequential in x, vectorize per channel offset
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter {f}")
        out[y] = line.astype(np.uint8)
    if ctype != 3:
        return out.reshape(h, w, bpp)
    return _apply_palette(out, w, h, depth, plte, trns)


def _apply_palette(scan, w: int, h: int, depth: int, plte, trns):
    """Defiltered palette scanlines → RGB/RGBA via PLTE (+ tRNS alpha).

    PLTE must exist, hold 1-256 RGB triples, and cover every index the
    image uses — anything else is ValueError (the property-tested
    garbage-PLTE contract: valid pixels or a loud error, never an
    IndexError or silent wraparound).
    """
    import numpy as np

    if plte is None or len(plte) == 0:
        raise ValueError("corrupt PNG: palette image without PLTE")
    if len(plte) % 3 or len(plte) > 256 * 3:
        raise ValueError(f"corrupt PNG: PLTE length {len(plte)}")
    palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    if depth == 8:
        idx = scan.reshape(h, -1)[:, :w]
    else:
        # unpack MSB-first bit groups of `depth` bits, then trim to width
        bits = np.unpackbits(scan, axis=1)
        idx = bits.reshape(h, -1, depth)
        weights = 1 << np.arange(depth - 1, -1, -1)
        idx = (idx * weights).sum(axis=2)[:, :w].astype(np.uint8)
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError(
            f"corrupt PNG: palette index {int(idx.max())} >= "
            f"palette size {len(palette)}"
        )
    rgb = palette[idx]
    if trns is None:
        return rgb
    if len(trns) > len(palette):
        raise ValueError("corrupt PNG: tRNS longer than PLTE")
    alpha_lut = np.full(len(palette), 255, dtype=np.uint8)
    alpha_lut[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
    return np.concatenate([rgb, alpha_lut[idx][:, :, None]], axis=2)


def encode_png(arr) -> bytes:
    """numpy uint8 (h, w, channels) → PNG bytes (filter 0, one IDAT).

    Deterministic for a given zlib build: fixed compression level,
    fixed chunk layout — safe for content-hash comparisons in tests.
    """
    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + cid
            + data
            + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * nch)], axis=1
    )
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def encode_png_palette(indices, palette, trns: bytes | None = None) -> bytes:
    """(h, w) uint8 index array + (n, 3) palette → 8-bit palette PNG
    (PLTE + optional tRNS, filter 0, one IDAT). Deterministic like
    encode_png; the inverse of decode_png's colortype-3 path."""
    import numpy as np

    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if indices.ndim != 2:
        raise ValueError("indices must be (h, w)")
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError("palette must be (n, 3) with 1 <= n <= 256")
    if int(indices.max(initial=0)) >= len(palette):
        raise ValueError("index exceeds palette size")
    h, w = indices.shape

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + cid
            + data
            + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    scan = np.concatenate([np.zeros((h, 1), np.uint8), indices], axis=1)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette.tobytes())
    if trns is not None:
        if len(trns) > len(palette):
            raise ValueError("tRNS longer than palette")
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6)) + chunk(b"IEND", b"")


def resize_nearest(arr, target_w: int, target_h: int):
    """Nearest-neighbor resize via numpy index sampling (the real pixel
    work for the resize operator — no external library involved)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return arr[ys][:, xs]


# ----------------------------------------------------- fixture generator

# dims/duration are pure functions of asset_id so a SQL oracle can
# recompute what the generator embedded while the engine re-parses the
# actual bytes — header-parser bugs become value mismatches.
FORMATS = ("png", "gif", "bmp", "jpeg", "wav")


def fixture_dims(asset_id: int) -> tuple[int, int]:
    return 16 + (asset_id % 97), 16 + (asset_id % 53)


def fixture_duration_ms(asset_id: int) -> int:
    return 500 + (asset_id % 41) * 250


def make_palette_asset(asset_id: int) -> bytes:
    """Deterministic REAL 8-bit palette PNG for `asset_id`: palette size
    n = 2 + id%15, index(x, y) = (x + 3y + id) % n, palette entry i =
    ((i*37+id)%256, (i*59+id*7)%256, (i*83+id*13)%256); ids divisible
    by 3 carry a tRNS chunk (alpha_i = (i*29+id)%256). Every value is
    a closed-form function of the id so a SQL oracle can recompute
    decoded-pixel sums while the engine re-reads them from the bytes —
    a PLTE/tRNS/defilter bug becomes a value mismatch."""
    import numpy as np

    w, h = fixture_dims(asset_id)
    n = 2 + asset_id % 15
    yy, xx = np.mgrid[0:h, 0:w]
    idx = ((xx + 3 * yy + asset_id) % n).astype(np.uint8)
    pal = np.array(
        [
            [
                (i * 37 + asset_id) % 256,
                (i * 59 + asset_id * 7) % 256,
                (i * 83 + asset_id * 13) % 256,
            ]
            for i in range(n)
        ],
        dtype=np.uint8,
    )
    trns = (
        bytes((i * 29 + asset_id) % 256 for i in range(n))
        if asset_id % 3 == 0
        else None
    )
    return encode_png_palette(idx, pal, trns)


def make_asset(asset_id: int) -> tuple[str, bytes]:
    """Deterministic real file of format FORMATS[asset_id % 5]."""
    import numpy as np

    fmt = FORMATS[asset_id % len(FORMATS)]
    w, h = fixture_dims(asset_id)
    if fmt == "png":
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack(
            [
                (xx * 7 + asset_id) % 256,
                (yy * 13 + asset_id // 3) % 256,
                (xx + yy + asset_id) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        return fmt, encode_png(arr)
    if fmt == "gif":
        # GIF89a logical screen descriptor + trailer (probe-sufficient)
        return fmt, (
            b"GIF89a"
            + struct.pack("<HH", w, h)
            + bytes([0x70, 0, 0])
            + b"\x3b"
        )
    if fmt == "bmp":
        hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
        return fmt, hdr + dib
    if fmt == "jpeg":
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h, w, 3) + bytes(
            [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
        )
        return fmt, b"\xff\xd8" + sof0 + b"\xff\xd9"
    # wav: 8 kHz mono 8-bit PCM, data length = duration * byte_rate
    rate = 8000
    dur_ms = fixture_duration_ms(asset_id)
    n = rate * dur_ms // 1000
    fmt_chunk = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
    data = b"data" + struct.pack("<I", n) + bytes(n)
    body = b"WAVE" + fmt_chunk + data
    return "wav", b"RIFF" + struct.pack("<I", len(body)) + body
