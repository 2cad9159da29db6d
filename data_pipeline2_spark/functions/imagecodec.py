"""Pure-stdlib (+numpy) image/audio codecs for the multimodal surface.

The container ships no PIL/ffmpeg, but real container formats are still
parseable with struct + zlib + numpy:

- header PROBES (dimensions / mode / duration) for PNG, JPEG, GIF, BMP,
  WAV and MP4 (ISO-BMFF box walk) — byte-exact parsing of the public
  container specs;
- REAL sample/pixel decodes beyond the probes: GIF (variable-width LZW,
  color tables, transparency, interlace) and WAV PCM (8/16-bit,
  multi-channel) — see decode_gif / decode_wav_pcm;
- a REAL PNG codec: decode (all five scanline filters, 8- and 16-bit
  gray/LA/RGB/RGBA plus palette colortype 3 at depths 1/2/4/8 with
  PLTE + tRNS, both interlace methods — none and Adam7),
  nearest-neighbor resize, encode (truecolor and 8-bit palette).
  Sub-8-bit non-palette grayscale raises NotImplementedError — the
  one remaining PNG seam. Baseline JPEG pixel decode/encode lives in
  functions/jpegcodec.py.

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

# Decompression-bomb guard: decoders refuse frames past this pixel count
# BEFORE allocating or inflating anything (a kilobyte-scale hostile file
# can declare 65535x65535 and OOM an executor otherwise). 2^26 = 64 Mpix
# covers any sane training asset; callers with legitimate larger media
# should tile upstream.
MAX_PIXELS = 1 << 26

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


# Adam7 interlace passes: (xstart, ystart, xstep, ystep)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _defilter(sub, ph: int, stride: int, bpp: int):
    """Reverse PNG scanline filters over `ph` rows of `stride` bytes
    (`bpp` = bytes per complete pixel, per the spec — filters operate on
    bytes, so 16-bit images just use a doubled bpp)."""
    import numpy as np

    raw = np.frombuffer(sub, dtype=np.uint8).reshape(ph, stride + 1)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)
    out = np.zeros((ph, stride), dtype=np.uint8)
    for y in range(ph):
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
    return out


def decode_png(payload: bytes):
    """PNG → numpy array of shape (h, w, channels): uint8 for 8-bit
    (and palette) images, uint16 for 16-bit images.

    Supports gray / gray+alpha / RGB / RGBA at bit depth 8 and 16,
    PALETTE images (colortype 3, depth 1/2/4/8, PLTE + optional tRNS —
    resolved to RGB/RGBA), and BOTH interlace methods (none and Adam7 —
    per-pass defilter + scatter). Sub-8-bit grayscale (non-palette)
    raises NotImplementedError — the one remaining seam. Corrupt
    structures (bad PLTE length, out-of-range palette index, size
    mismatch) raise ValueError, never return garbage pixels.
    """
    import numpy as np

    info = probe_image(payload)
    if not info or info["format"] != "png":
        raise ValueError("not a PNG payload")
    w, h, depth = info["width"], info["height"], info["depth"]
    ctype = {v: k for k, v in _PNG_MODES.items()}.get(info["mode"])
    if len(payload) < 29:
        raise ValueError("corrupt PNG: truncated IHDR")
    interlace = payload[28]
    if interlace not in (0, 1):
        raise ValueError(f"corrupt PNG: interlace method {interlace}")
    if ctype == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"corrupt PNG: palette bit depth {depth}")
        nch = 1
    elif ctype in _CHANNELS and depth in (8, 16):
        nch = _CHANNELS[ctype]
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
    if w * h > MAX_PIXELS:
        raise ValueError(f"corrupt PNG: {w}x{h} exceeds MAX_PIXELS")
    sample_bytes = 2 if depth == 16 else 1

    def pass_pixels(sub, pw: int, ph: int):
        """Defiltered pass → (ph, pw) palette indices or (ph, pw, nch)
        samples (uint8 or uint16)."""
        if ctype == 3 and depth < 8:
            scan = _defilter(sub, ph, (pw * depth + 7) // 8, 1)
            bits = np.unpackbits(scan, axis=1)
            grouped = bits.reshape(ph, -1, depth)
            weights = 1 << np.arange(depth - 1, -1, -1)
            return (grouped * weights).sum(axis=2)[:, :pw].astype(np.uint8)
        stride = pw * nch * sample_bytes
        scan = _defilter(sub, ph, stride, nch * sample_bytes)
        if ctype == 3:
            return scan.reshape(ph, -1)[:, :pw]
        if depth == 16:
            pairs = scan.reshape(ph, pw, nch, 2).astype(np.uint16)
            return (pairs[..., 0] << 8) | pairs[..., 1]
        return scan.reshape(ph, pw, nch)

    def pass_bytes(pw: int, ph: int) -> int:
        if pw == 0 or ph == 0:
            return 0
        if ctype == 3 and depth < 8:
            return ph * (1 + (pw * depth + 7) // 8)
        return ph * (1 + pw * nch * sample_bytes)

    passes = [(0, 0, 1, 1)] if interlace == 0 else _ADAM7
    dims = []
    for xs, ys, xstep, ystep in passes:
        pw = max(0, (w - xs + xstep - 1) // xstep)
        ph = max(0, (h - ys + ystep - 1) // ystep)
        dims.append((pw, ph))
    expected_raw = sum(pass_bytes(pw, ph) for pw, ph in dims)
    # BOUNDED inflate: a zlib stream can expand ~1000:1, so cap the
    # decompress at the byte count the (already pixel-capped) dims
    # imply — a hostile IDAT can never inflate past expected+1 bytes,
    # and any length mismatch fails loudly before the h*w allocation
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected_raw + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG: bad IDAT stream ({exc})") from exc
    if len(raw) != expected_raw or dec.unconsumed_tail or dec.unused_data:
        raise ValueError("corrupt PNG: decompressed size mismatch")

    if ctype == 3:
        img = np.zeros((h, w), dtype=np.uint8)
    else:
        img = np.zeros((h, w, nch), dtype=np.uint16 if depth == 16 else np.uint8)

    offset = 0
    for (xs, ys, xstep, ystep), (pw, ph) in zip(passes, dims):
        need = pass_bytes(pw, ph)
        if need == 0:
            continue
        img[ys::ystep, xs::xstep] = pass_pixels(raw[offset : offset + need], pw, ph)
        offset += need
    if ctype != 3:
        return img
    return _apply_palette_indices(img, plte, trns)


def _apply_palette_indices(idx, plte, trns):
    """(h, w) palette indices → RGB/RGBA via PLTE (+ tRNS alpha).

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


# ------------------------------------------------------- WAV PCM codec


def decode_wav_pcm(payload: bytes):
    """RIFF/WAVE PCM → (samples ndarray, sample_rate, channels).

    Real sample decode, not just the header probe: 8-bit unsigned or
    16-bit signed little-endian PCM, any channel count (samples come
    back shaped (n_frames, channels)). Compressed/float formats raise
    NotImplementedError; corrupt containers raise ValueError."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} needs a codec library "
            "(only uncompressed PCM is supported)"
        )
    if channels < 1:
        raise ValueError("corrupt WAV: zero channels")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    else:
        raise NotImplementedError(f"{bits}-bit PCM needs a codec library")
    n_frames = len(samples) // channels
    return samples[: n_frames * channels].reshape(n_frames, channels), rate, channels


def make_wav_pcm_asset(asset_id: int) -> bytes:
    """Deterministic REAL 8-bit PCM WAV for `asset_id`: a square wave at
    1000 Hz sample rate with period p = 8 + id%32 samples, levels
    high = 200 + id%56 / low = id%100, n = 500 + (id%41)*250 samples.
    Sum, sum-of-squares and level-transition counts all have integer
    closed forms, so a SQL oracle verifies the real byte-level PCM
    decode end-to-end."""
    import numpy as np

    n = 500 + (asset_id % 41) * 250
    p = 8 + asset_id % 32
    high = 200 + asset_id % 56
    low = asset_id % 100
    t = np.arange(n)
    samples = np.where((t // p) % 2 == 0, high, low).astype(np.uint8)
    return encode_wav_pcm(samples, 1000)


# ------------------------------------------------------------- GIF codec


def decode_gif(payload: bytes):
    """First frame of a GIF → numpy uint8 array (h, w, 3) or (h, w, 4)
    when the frame declares a transparent index.

    Real LZW decompression (variable-width codes, clear/EOI handling,
    12-bit dictionary cap) + global/local color table resolution +
    interlace pass reordering — pure stdlib/numpy, same stance as the
    PNG codec. Corrupt streams raise ValueError."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF payload")
    packed = payload[10]
    gct = None
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[i : i + 3 * n], np.uint8).reshape(-1, 3)
        if len(gct) < n:
            raise ValueError("corrupt GIF: truncated global color table")
        i += 3 * n
    transparent = None
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension
            if i + 2 > len(payload):
                raise ValueError("corrupt GIF: truncated extension")
            label = payload[i + 1]
            i += 2
            if label == 0xF9 and i + 5 <= len(payload) and payload[i] >= 4:
                if payload[i + 1] & 0x01:  # transparency flag
                    transparent = payload[i + 4]
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1  # block terminator
        elif b == 0x2C:  # image descriptor
            if i + 10 > len(payload):
                raise ValueError("corrupt GIF: truncated image descriptor")
            w, h = struct.unpack("<HH", payload[i + 5 : i + 9])
            if w * h > MAX_PIXELS:
                raise ValueError(f"corrupt GIF: {w}x{h} exceeds MAX_PIXELS")
            ipacked = payload[i + 9]
            i += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    payload[i : i + 3 * n], np.uint8
                ).reshape(-1, 3)
                if len(pal) < n:
                    raise ValueError("corrupt GIF: truncated local color table")
                i += 3 * n
            if pal is None:
                raise ValueError("corrupt GIF: no color table")
            if i >= len(payload):
                raise ValueError("corrupt GIF: missing LZW data")
            min_code = payload[i]
            i += 1
            data = bytearray()
            while i < len(payload) and payload[i] != 0:
                sz = payload[i]
                data += payload[i + 1 : i + 1 + sz]
                i += 1 + sz
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if (ipacked & 0x40) and h > 1:  # interlaced: reorder rows
                rows = np.zeros(h, np.int64)
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                rows[np.array(order)] = np.arange(h)
                idx = idx.reshape(h, w)[rows].reshape(-1)
            idx = idx.reshape(h, w)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError(
                    f"corrupt GIF: index {int(idx.max())} >= palette "
                    f"size {len(pal)}"
                )
            rgb = pal[idx]
            if transparent is None:
                return rgb
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            return np.concatenate([rgb, alpha[:, :, None]], axis=2)
        elif b == 0x3B:  # trailer before any image
            raise ValueError("corrupt GIF: no image data")
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{b:02x}")
    raise ValueError("corrupt GIF: no image data")


def _lzw_decode(data: bytes, min_code: int, expected: int):
    """GIF-flavor LZW → numpy uint8 index array of length `expected`."""
    import numpy as np

    if not 2 <= min_code <= 11:
        raise ValueError(f"corrupt GIF: LZW min code size {min_code}")
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [(c,) for c in range(clear)] + [None, None]
    table = list(base)
    width = min_code + 1
    out: list[int] = []
    prev: tuple | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                # EOI terminates the stream; any remaining sub-block
                # bytes are padding, never pixels (decoding past EOI
                # could silently fill a short frame with garbage).
                if len(out) >= expected:  # only reachable at expected=0
                    return np.array(out[:expected], np.uint8)
                raise ValueError(
                    f"corrupt GIF: LZW EOI at {len(out)}/{expected} pixels"
                )
            if prev is None:
                if code >= len(table) or table[code] is None:
                    raise ValueError("corrupt GIF: bad initial LZW code")
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                raise ValueError("corrupt GIF: LZW code out of range")
            out.extend(entry)
            if len(out) >= expected:
                return np.array(out[:expected], np.uint8)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    if len(out) < expected:
        raise ValueError(
            f"corrupt GIF: LZW stream ended at {len(out)}/{expected} pixels"
        )
    return np.array(out[:expected], np.uint8)


def encode_gif(indices, palette, transparent: int | None = None) -> bytes:
    """(h, w) uint8 indices + (n, 3) palette → single-frame GIF89a.

    Emits literal LZW codes with a clear code before each symbol run
    (the classic no-compression GIF writer) — deterministic bytes,
    decodable by any GIF reader including decode_gif."""
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
    # color table size: next power of two >= max(2, n), min exponent 1
    exp = 1
    while (2 << exp) < len(palette):
        exp += 1
    n_slots = 2 << exp
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (n_slots - len(palette)))
    min_code = max(2, exp + 1)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1

    bits = bytearray()
    acc = nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # after a clear the table holds clear+2 codes; emitting a literal
    # grows it by one — re-clear before the table forces a width bump
    budget = (1 << width) - clear - 3
    for v in indices.reshape(-1):
        if budget == 0:
            emit(clear)
            budget = (1 << width) - clear - 3
        emit(int(v))
        budget -= 1
    emit(eoi)
    if nbits:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h) + bytes([0xF0 | exp, 0, 0]) + pal_bytes
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent & 0xFF, 0])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    for j in range(0, len(bits), 255):
        block = bits[j : j + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


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


def make_gif_asset(asset_id: int) -> bytes:
    """Deterministic REAL single-frame GIF for `asset_id`: color table
    size n = 2 + id%15, index(x, y) = (2x + y + id) % n, palette entry
    i = ((i*41+id)%256, (i*61+id*5)%256, (i*89+id*11)%256); ids
    divisible by 4 mark index id%n transparent. Closed-form like
    make_palette_asset so a SQL oracle can recompute decoded-pixel
    sums while the engine runs the real LZW decode."""
    import numpy as np

    w, h = fixture_dims(asset_id)
    n = 2 + asset_id % 15
    yy, xx = np.mgrid[0:h, 0:w]
    idx = ((2 * xx + yy + asset_id) % n).astype(np.uint8)
    pal = np.array(
        [
            [
                (i * 41 + asset_id) % 256,
                (i * 61 + asset_id * 5) % 256,
                (i * 89 + asset_id * 11) % 256,
            ]
            for i in range(n)
        ],
        dtype=np.uint8,
    )
    tr = asset_id % n if asset_id % 4 == 0 else None
    return encode_gif(idx, pal, tr)


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
    return "wav", encode_wav_pcm(bytes(n), rate)


# ------------------------------------------------------------ MP4 probe

def probe_mp4(payload: bytes) -> dict | None:
    """ISO-BMFF (MP4) container probe → {format, width, height,
    duration_ms, timescale} or None when the payload is not MP4.

    Real box-structure walk, same stance as the image probes: top-level
    boxes (64-bit largesize supported) → moov → mvhd (v0/v1 timescale +
    duration) and trak → tkhd (16.16 fixed-point dims). Recognized-but-
    corrupt structure raises ValueError; pixel/sample DECODE of mp4
    payloads still needs a real codec library and keeps its
    NotImplementedError seam — this parses the container, not the codec
    stream.
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None

    def walk(buf, start, end):
        i = start
        while i + 8 <= end:
            size = struct.unpack(">I", buf[i : i + 4])[0]
            btype = buf[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    raise ValueError("corrupt MP4: truncated largesize")
                size = struct.unpack(">Q", buf[i + 8 : i + 16])[0]
                hdr = 16
            elif size == 0:  # box extends to end of enclosing container
                size = end - i
            if size < hdr or i + size > end:
                raise ValueError("corrupt MP4: bad box size")
            yield btype, i + hdr, i + size
            i += size

    duration_ms = None
    timescale = None
    width = height = None
    for btype, s, e in walk(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in walk(payload, s, e):
            if ctype == b"mvhd":
                if ce - cs < 1:
                    raise ValueError("corrupt MP4: empty mvhd")
                ver = payload[cs]
                if ver == 1:
                    # 4 ver/flags + 8+8 times + 4 timescale + 8 duration
                    if ce - cs < 32:
                        raise ValueError("corrupt MP4: short mvhd v1")
                    timescale = struct.unpack(">I", payload[cs + 20 : cs + 24])[0]
                    dur = struct.unpack(">Q", payload[cs + 24 : cs + 32])[0]
                else:
                    if ce - cs < 20:
                        raise ValueError("corrupt MP4: short mvhd")
                    timescale = struct.unpack(">I", payload[cs + 12 : cs + 16])[0]
                    dur = struct.unpack(">I", payload[cs + 16 : cs + 20])[0]
                if timescale == 0:
                    raise ValueError("corrupt MP4: zero timescale")
                duration_ms = dur * 1000 // timescale
                if duration_ms > 0x7FFFFFFF:
                    # int32 schema bound; also catches corrupt 64-bit
                    # duration fields masquerading as ~centuries
                    raise ValueError(
                        f"corrupt MP4: implausible duration {duration_ms} ms"
                    )
            elif ctype == b"trak":
                for ttype, ts, te in walk(payload, cs, ce):
                    if ttype == b"tkhd":
                        if te - ts < 1:
                            raise ValueError("corrupt MP4: empty tkhd")
                        ver = payload[ts]
                        # width sits after ver/flags(4) + times(8 or 16)
                        # + track_id(4) + rsvd(4) + duration(4 or 8) +
                        # rsvd(8) + layer/alt/vol/rsvd(8) + matrix(36)
                        off = ts + (88 if ver == 1 else 76)
                        if off + 8 > te:
                            raise ValueError("corrupt MP4: short tkhd")
                        w = struct.unpack(">I", payload[off : off + 4])[0]
                        h = struct.unpack(">I", payload[off + 4 : off + 8])[0]
                        if w and h:  # audio tracks carry 0x0
                            width, height = w >> 16, h >> 16
    if duration_ms is None:
        raise ValueError("corrupt MP4: no mvhd")
    return {
        "format": "mp4",
        "width": width,
        "height": height,
        "duration_ms": duration_ms,
        "timescale": timescale,
    }


def make_mp4_asset(asset_id: int) -> bytes:
    """Deterministic REAL minimal MP4: ftyp + moov(mvhd + trak(tkhd)).
    duration_ms = 1000 + (id % 97)*137 at timescale 1000; dims
    160 + (id % 33)*8 x 120 + (id % 17)*8 — closed-form for the oracle."""
    dur = 1000 + (asset_id % 97) * 137
    w = 160 + (asset_id % 33) * 8
    h = 120 + (asset_id % 17) * 8

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"            # version/flags
        + struct.pack(">II", 0, 0)      # creation/modification
        + struct.pack(">II", 1000, dur)  # timescale, duration
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)      # volume
        + bytes(10)                      # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)                      # predefined
        + struct.pack(">I", 2),          # next track id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"             # version/flags (enabled)
        + struct.pack(">II", 0, 0)       # creation/modification
        + struct.pack(">I", 1)           # track id
        + bytes(4)                       # reserved
        + struct.pack(">I", dur)         # duration
        + bytes(8)                       # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/alt/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov + box(b"free", bytes(asset_id % 32))


def encode_wav_pcm(samples, rate: int) -> bytes:
    """Encode a mono uint8 sample array as a REAL 8-bit PCM WAV (the
    inverse of decode_wav_pcm for 1-channel/8-bit): RIFF container,
    canonical 16-byte fmt chunk, raw data chunk. Used by the resample
    operator to write its output as real audio bytes, which then
    re-verify through the decoder."""
    import numpy as np

    if isinstance(samples, (bytes, bytearray)):
        s = np.frombuffer(samples, dtype=np.uint8)
    else:
        s = np.asarray(samples, dtype=np.uint8)
    fmt_chunk = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
    payload = s.tobytes()
    # RIFF word alignment: an odd-sized data chunk carries a pad byte
    # (not counted in the chunk size) — strict parsers require it
    pad = b"\x00" if len(payload) % 2 else b""
    data = b"data" + struct.pack("<I", len(payload)) + payload + pad
    body = b"WAVE" + fmt_chunk + data
    return b"RIFF" + struct.pack("<I", len(body)) + body
