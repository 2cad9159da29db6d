"""Multimodal columns — binary payloads with typed metadata.

North-star scope: image/audio/video as opaque `binary` columns. The
container has no image/audio libraries, so actual codec work is STUBBED
(clearly marked) behind the same seams a real implementation would use;
the Spark-side plumbing — schema, partitioning, mapInPandas batch
shapes, metadata extraction — is real and tested.

Design for 100 TB of media:
- payloads live in parquet binary columns (or object-store paths for
  >~64 MB items, same schema with `payload` null + `uri` set);
- decode/feature-extract runs via `mapInPandas` — Arrow-batched bytes
  into Python, one batch per ~maxRecordsPerBatch rows, never per-row;
- partition by (modality, bucket(asset_id)) so codec-heavy stages
  parallelize evenly and metadata-only queries prune payload bytes via
  column pruning (binary column untouched unless selected).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "asset_id long, modality string, format string, n_bytes long, "
    "sha string, width int, height int, mode string, duration_ms int"
)

ASSET_SCHEMA = "asset_id long, modality string, format string, payload binary"


def real_assets(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media fixtures: one actual PNG/GIF/BMP/JPEG/WAV
    file per document id (functions/imagecodec.make_asset — real
    container bytes, dims/duration a pure function of the id so a SQL
    oracle can verify the parsers end-to-end)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.imagecodec import make_asset

        for pdf in batches:
            fmts, payloads = [], []
            for aid in pdf["asset_id"]:
                f, p = make_asset(int(aid))
                fmts.append(f)
                payloads.append(p)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": [
                        "audio" if f == "wav" else "image" for f in fmts
                    ],
                    "format": fmts,
                    "payload": payloads,
                }
            )

    return documents.select(
        F.col(id_col).cast("long").alias("asset_id")
    ).mapInPandas(gen, ASSET_SCHEMA)


def palette_assets(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL palette-PNG fixtures (PLTE + optional tRNS),
    one per document id (functions/imagecodec.make_palette_asset)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.imagecodec import make_palette_asset

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": ["image"] * len(pdf),
                    "format": ["png"] * len(pdf),
                    "payload": [make_palette_asset(int(a)) for a in pdf["asset_id"]],
                }
            )

    return documents.select(
        F.col(id_col).cast("long").alias("asset_id")
    ).mapInPandas(gen, ASSET_SCHEMA)


def gif_assets(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL single-frame GIF fixtures (LZW-encoded, some
    with a transparent index), one per document id
    (functions/imagecodec.make_gif_asset)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.imagecodec import make_gif_asset

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": ["image"] * len(pdf),
                    "format": ["gif"] * len(pdf),
                    "payload": [make_gif_asset(int(a)) for a in pdf["asset_id"]],
                }
            )

    return documents.select(
        F.col(id_col).cast("long").alias("asset_id")
    ).mapInPandas(gen, ASSET_SCHEMA)


PALETTE_STATS_SCHEMA = (
    "asset_id long, width int, height int, has_alpha boolean, "
    "red_sum long, alpha_sum long"
)


def decode_palette_stats(assets: DataFrame, codec: str = "png") -> DataFrame:
    """REAL paletted-image decode, reduced to driver-hashable scalars:
    each payload goes through the full pixel chain — PNG colortype-3
    (PLTE lookup, tRNS alpha, defilter) or GIF (LZW decompression,
    color-table lookup, transparency) — and emits decoded-pixel sums.
    Dims come from the decoded array's shape, not the header, so the
    whole chain must be right for an oracle recomputing the sums in
    closed form to hash-match. Opaque images count alpha as 255/pixel."""
    if codec not in ("png", "gif"):
        raise ValueError(f"unsupported palette codec {codec!r}")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.imagecodec import (
            decode_gif,
            decode_png,
        )

        decode = decode_png if codec == "png" else decode_gif
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = decode(bytes(payload))
                h, w, nch = arr.shape
                has_alpha = nch == 4
                alpha_sum = (
                    int(arr[:, :, 3].astype("int64").sum())
                    if has_alpha
                    else 255 * w * h
                )
                rows.append(
                    (
                        int(aid),
                        w,
                        h,
                        has_alpha,
                        int(arr[:, :, 0].astype("int64").sum()),
                        alpha_sum,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "has_alpha",
                    "red_sum", "alpha_sum",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        stats, PALETTE_STATS_SCHEMA
    )


AUDIO_STATS_SCHEMA = (
    "asset_id long, n_samples long, sample_rate int, channels int, "
    "sum_samples long, sum_squares long, transitions long"
)


def audio_pcm_stats(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL WAV PCM decode reduced to integer invariants: generate a
    deterministic square-wave WAV per id (imagecodec.make_wav_pcm_asset),
    decode the actual sample bytes (decode_wav_pcm — RIFF walk, PCM
    width handling), and emit sums/sum-of-squares/level-transition
    counts. All integers, so a closed-form SQL oracle is exact — the
    RMS-energy / zero-crossing-rate building blocks of audio curation,
    verified at the byte level."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.imagecodec import (
            decode_wav_pcm,
            make_wav_pcm_asset,
        )

        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                aid = int(aid)
                samples, rate, channels = decode_wav_pcm(make_wav_pcm_asset(aid))
                mono = samples[:, 0].astype("int64")
                rows.append(
                    (
                        aid,
                        len(mono),
                        rate,
                        channels,
                        int(mono.sum()),
                        int((mono * mono).sum()),
                        int((mono[1:] != mono[:-1]).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_samples", "sample_rate", "channels",
                    "sum_samples", "sum_squares", "transitions",
                ],
            )

    return documents.select(
        F.col(id_col).cast("long").alias("asset_id")
    ).mapInPandas(stats, AUDIO_STATS_SCHEMA)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Derive a deterministic assets table from the documents corpus
    (text bytes stand in for media payloads — the container has no
    codecs; schema matches schemas.ASSETS)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            # pmod: % follows the dividend's sign, so negative ids would
            # hit index 0 (ANSI error) or index -1 (wrong modality)
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Decode / probe binary payloads via mapInPandas.

    `fake=False` is the REAL path: byte-exact header parsing of PNG /
    JPEG / GIF / BMP containers (dimensions + color mode), RIFF/WAVE
    audio (duration), and ISO-BMFF MP4 (box walk: mvhd duration + tkhd
    dims) via functions/imagecodec — no external codec involved.
    Payloads in formats that genuinely need a codec library (webm/ogg/
    mkv/...) raise NotImplementedError naming the asset; mp4 SAMPLE
    decode (the codec stream inside the container) keeps that seam too.

    `fake=True` keeps the deterministic stand-in probe (dims derived
    from payload bytes) for text-derived fixture assets, so the
    plumbing oracles stay reproducible from the documents table alone.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from data_pipeline2_spark.functions.imagecodec import (
            probe_image,
            probe_mp4,
            probe_wav,
        )

        cols = [
            "asset_id", "modality", "format", "n_bytes", "sha",
            "width", "height", "mode", "duration_ms",
        ]
        for pdf in batches:
            rows = []
            for asset_id, modality, raw in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(raw or b"")
                sha = hashlib.sha256(payload).hexdigest()
                n = len(payload)
                if fake:
                    # deterministic fake "probe": dims derived from content
                    w = 16 + (n % 1024)
                    h = 16 + (int(sha[:4], 16) % 1024)
                    dur = 1000 + (int(sha[4:8], 16) % 60_000)
                    rows.append(
                        (
                            asset_id, modality, "fake", n, sha,
                            w if modality == "image" else None,
                            h if modality == "image" else None,
                            None,
                            dur if modality in ("audio", "video") else None,
                        )
                    )
                    continue
                img = probe_image(payload)
                if img is not None:
                    rows.append(
                        (
                            asset_id, modality, img["format"], n, sha,
                            img["width"], img["height"], img["mode"], None,
                        )
                    )
                    continue
                wav = probe_wav(payload)
                if wav is not None:
                    rows.append(
                        (
                            asset_id, modality, "wav", n, sha,
                            None, None, None, wav["duration_ms"],
                        )
                    )
                    continue
                mp4 = probe_mp4(payload)
                if mp4 is not None:
                    rows.append(
                        (
                            asset_id, modality, "mp4", n, sha,
                            mp4["width"], mp4["height"], None,
                            mp4["duration_ms"],
                        )
                    )
                    continue
                raise NotImplementedError(
                    f"asset {asset_id}: payload is not a recognized "
                    "PNG/JPEG/GIF/BMP/WAV/MP4 container; other formats "
                    "need codec libraries not present in this environment"
                )
            yield pd.DataFrame(rows, columns=cols)

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        decode, DECODE_SCHEMA
    )


def asset_meta(assets: DataFrame) -> DataFrame:
    """Pure-SQL metadata extraction over binary payloads (no decode):
    byte length + sha256 + modality rollup key. Column-pruning-friendly."""
    return assets.select(
        "asset_id",
        "modality",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


def resize_plan(
    assets: DataFrame, max_dim: int = 256, fake: bool = True
) -> DataFrame:
    """Aspect-preserving resize targets for image assets →
    (asset_id, width, height, target_w, target_h, scale).

    The geometry is pure JVM-side arithmetic over probed dimensions —
    only the pixel work needs a codec, so a real pipeline runs THIS to
    plan (and to skip already-small images entirely) and hands only the
    shrink-needed subset to `resize_assets`. Filter to images before the
    probe: the modality filter prunes at the parquet scan, the probe
    never sees audio/video bytes. `fake=False` probes real container
    headers (PNG/JPEG/GIF/BMP) instead of the deterministic stand-in.
    """
    probed = decode_assets(assets.filter(F.col("modality") == "image"), fake=fake)
    longest = F.greatest(F.col("width"), F.col("height"))
    scale = F.when(longest <= max_dim, F.lit(1.0)).otherwise(
        F.lit(max_dim) / longest
    )
    return probed.select(
        "asset_id",
        "width",
        "height",
        # floor-with-min-1 keeps extreme aspect ratios from collapsing a
        # dimension to 0 pixels
        F.greatest((F.col("width") * scale).cast("int"), F.lit(1)).alias("target_w"),
        F.greatest((F.col("height") * scale).cast("int"), F.lit(1)).alias("target_h"),
        F.round(scale, 6).alias("scale"),
    )


def resize_assets(
    assets: DataFrame, max_dim: int = 256, fake: bool = True
) -> DataFrame:
    """Resize image payloads via mapInPandas → (asset_id, target_w,
    target_h, payload).

    `fake=False` is the REAL pixel path for PNG payloads: decode (all
    five scanline filters), nearest-neighbor resample, re-encode — all
    via functions/imagecodec, no external library. Non-PNG images raise
    NotImplementedError (JPEG/GIF pixel decode genuinely needs a codec
    library; their headers still probe fine in resize_plan).

    `fake=True` emits a deterministic payload (sha256 of original bytes
    + target geometry) so downstream dedup/caching semantics stay
    exercisable from text-derived fixtures. Batch shape, schema, and
    the plan/execute split are identical in both modes.
    """
    plan = resize_plan(assets, max_dim, fake=fake)
    to_resize = assets.select("asset_id", "payload").join(
        plan.filter(F.col("scale") < 1.0), "asset_id"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from data_pipeline2_spark.functions.imagecodec import (
            decode_png,
            encode_png,
            probe_image,
            resize_nearest,
        )

        for pdf in batches:
            out = []
            for asset_id, raw, tw, th in zip(
                pdf["asset_id"], pdf["payload"], pdf["target_w"], pdf["target_h"]
            ):
                payload = bytes(raw or b"")
                if fake:
                    new_payload = hashlib.sha256(
                        payload + f"|{tw}x{th}".encode()
                    ).digest()
                else:
                    info = probe_image(payload)
                    if not info or info["format"] != "png":
                        raise NotImplementedError(
                            f"asset {asset_id}: real pixel resize is "
                            "implemented for PNG; "
                            f"{info['format'] if info else 'unknown'} "
                            "pixel decode needs a codec library"
                        )
                    arr = resize_nearest(decode_png(payload), int(tw), int(th))
                    new_payload = encode_png(arr)
                out.append((asset_id, int(tw), int(th), new_payload))
            yield pd.DataFrame(
                out, columns=["asset_id", "target_w", "target_h", "payload"]
            )

    return to_resize.select("asset_id", "payload", "target_w", "target_h").mapInPandas(
        resize, "asset_id long, target_w int, target_h int, payload binary"
    )


def extract_features(assets: DataFrame, dim: int = 64, fake: bool = True) -> DataFrame:
    """Feature vectors from binary payloads via mapInPandas →
    (asset_id, modality, feature array<float>).

    STUB for the model forward pass (no torch/CLIP here): fake=True
    derives a deterministic unit-norm vector per payload — sha256 seeds
    per row (that hash IS the fake generator), then one (batch, dim)
    numpy expansion + normalization for the whole Arrow batch, the same
    batch-matrix shape a real encoder's output takes; fake=False raises
    where the model call plugs in. Output plugs straight into the
    kNN/ANN surface (similarity.knn_batch and friends take array<float>
    columns).
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        # expand sha256 (32 bytes) to dim uint16s deterministically
        need = (dim * 2 + 31) // 32
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires a model runtime; run "
                    "with fake=True for the deterministic stand-in"
                )
            seeds = b"".join(
                hashlib.sha256(bytes(raw or b"") + bytes([i])).digest()
                for raw in pdf["payload"]
                for i in range(need)
            )
            mat = (
                np.frombuffer(seeds, dtype=np.uint16)
                .reshape(len(pdf), need * 16)[:, :dim]
                .astype(np.float32)
                / 65535.0
                - 0.5
            )
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms > 0, norms, 1.0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "feature": list(map(list, mat)),
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        featurize, "asset_id long, modality string, feature array<float>"
    )


def frame_sample_plan(
    assets: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Explode a per-asset frame-sampling plan (video → frame rows).

    Pure plumbing: generates (asset_id, frame_no, ts_ms) rows from the
    probed duration — `fake=False` reads it from the REAL container
    probe (MP4 mvhd); a real sampler then maps frames via mapInPandas.
    Filter BEFORE decoding — Catalyst cannot push a filter through the
    opaque mapInPandas, and probing non-video payloads is pure waste.
    """
    probed = decode_assets(
        assets.filter(F.col("modality") == "video"), fake=fake
    )
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return probed.select(
        "asset_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_i"),
    ).select(
        "asset_id",
        "frame_no",
        (F.col("frame_no") * every_ms).cast("long").alias("ts_ms"),
    )


def jpeg_assets(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL baseline-JPEG fixtures (full entropy-coded
    scan: Huffman, DC prediction, byte stuffing), one per document id
    (functions/jpegcodec.make_jpeg_asset)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.jpegcodec import make_jpeg_asset

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": ["image"] * len(pdf),
                    "format": ["jpeg"] * len(pdf),
                    "payload": [make_jpeg_asset(int(a)) for a in pdf["asset_id"]],
                }
            )

    return documents.select(
        F.col(id_col).cast("long").alias("asset_id")
    ).mapInPandas(gen, ASSET_SCHEMA)


def mp4_assets(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL minimal-MP4 fixtures (ftyp + moov(mvhd,
    trak(tkhd))), one per document id (imagecodec.make_mp4_asset)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.imagecodec import make_mp4_asset

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": ["video"] * len(pdf),
                    "format": ["mp4"] * len(pdf),
                    "payload": [make_mp4_asset(int(a)) for a in pdf["asset_id"]],
                }
            )

    return documents.select(
        F.col(id_col).cast("long").alias("asset_id")
    ).mapInPandas(gen, ASSET_SCHEMA)


JPEG_STATS_SCHEMA = (
    "asset_id long, width int, height int, lum_sum long, lum_sq_sum long"
)


def decode_jpeg_stats(assets: DataFrame) -> DataFrame:
    """REAL JPEG decode reduced to driver-hashable scalars: each payload
    goes through the full baseline pipeline — marker walk, DHT/DQT
    parse, Huffman + DC-prediction entropy decode, dequant, IDCT — and
    emits decoded-pixel sum and sum-of-squares. Dims come from the
    decoded array's shape. The fixtures are constant-per-block images
    whose decode is bit-exact (DC-only spectra, flat quant table), so
    an oracle recomputing the sums in closed form hash-matches; any
    Huffman, zigzag, predictor, or IDCT-scaling bug is a mismatch."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.jpegcodec import decode_jpeg

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = decode_jpeg(bytes(payload))
                if arr.ndim != 2:
                    raise ValueError("fixture JPEGs are grayscale")
                h, w = arr.shape
                a64 = arr.astype("int64")
                rows.append(
                    (int(aid), w, h, int(a64.sum()), int((a64 * a64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "lum_sum", "lum_sq_sum"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        stats, JPEG_STATS_SCHEMA
    )


def audio_resample_stats(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio resample roundtrip reduced to integer invariants:
    generate the square-wave WAV per id, DECODE it, decimate by
    d = 2 + id % 3 (naive every-d-th-sample downsampling — the
    band-limited variant needs scipy, which the honest-seams policy
    stubs), RE-ENCODE the result as real WAV bytes at rate//d, decode
    THOSE bytes again, and emit sums/transitions over what came back.

    → (asset_id, decim, n_samples, sample_rate, sum_samples,
    sum_squares, transitions). Every value is an exact integer with a
    closed-form-per-index SQL replay, so a bug anywhere in the
    decode→decimate→encode→decode chain hash-fails. Map-only."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_pipeline2_spark.functions.imagecodec import (
            decode_wav_pcm,
            encode_wav_pcm,
            make_wav_pcm_asset,
        )

        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                aid = int(aid)
                samples, rate, _ = decode_wav_pcm(make_wav_pcm_asset(aid))
                d = 2 + aid % 3
                mono = samples[:, 0]
                resampled_bytes = encode_wav_pcm(mono[::d], rate // d)
                back, back_rate, _ = decode_wav_pcm(resampled_bytes)
                out = back[:, 0].astype("int64")
                rows.append(
                    (
                        aid,
                        d,
                        len(out),
                        back_rate,
                        int(out.sum()),
                        int((out * out).sum()),
                        int((out[1:] != out[:-1]).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "decim", "n_samples", "sample_rate",
                    "sum_samples", "sum_squares", "transitions",
                ],
            )

    return documents.select(
        F.col(id_col).cast("long").alias("asset_id")
    ).mapInPandas(
        stats,
        "asset_id long, decim int, n_samples long, sample_rate int, "
        "sum_samples long, sum_squares long, transitions long",
    )


AHASH_SCHEMA = (
    "asset_id long, width int, height int, hash_hi long, hash_lo long"
)


def image_ahash(assets: DataFrame, codec: str = "gif") -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels → (asset_id,
    width, height, hash_hi, hash_lo): the image near-dup fingerprint
    (aHash — 8x8 block means thresholded at the global mean; resize /
    re-encode / palette-shuffle variants of one image collapse to
    nearby hashes, Hamming distance = visual difference).

    Exactness: block membership is the integer grid map gx=(x*8)//w,
    and each bit compares block_sum * total_px > total_sum * block_px —
    cross-multiplied INTEGER arithmetic, no float mean, so the oracle
    replays the closed-form fixture pixels bit-for-bit. The 64 bits
    split into two longs (hi = blocks 32..63) to stay inside signed
    BIGINT on both engines. The decode itself is the full real chain
    (LZW/defilter + palette lookup), same as decode_palette_stats.

    Scale shape: map-only (one pandas batch per task, no shuffle);
    downstream near-dup joins consume 16 bytes/asset. The aHash is the
    oracle-checkable stand-in for pHash/CLIP-embedding image dedup —
    swap the per-row function, keep the plan.
    """
    if codec not in ("png", "gif"):
        raise ValueError(f"unsupported ahash codec {codec!r}")

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from data_pipeline2_spark.functions.imagecodec import (
            decode_gif,
            decode_png,
        )

        decode = decode_png if codec == "png" else decode_gif
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = decode(bytes(payload))
                h, w = arr.shape[0], arr.shape[1]
                red = arr[:, :, 0].astype(np.int64)
                gx = (np.arange(w, dtype=np.int64) * 8) // w
                gy = (np.arange(h, dtype=np.int64) * 8) // h
                blk = (gy[:, None] * 8 + gx[None, :]).ravel()
                bsum = np.bincount(blk, weights=red.ravel(), minlength=64)
                bsum = bsum.astype(np.int64)  # int weights < 2^53: exact
                npx = np.bincount(blk, minlength=64).astype(np.int64)
                total = int(red.sum())
                # python-int cross-multiply: bsum*(w*h) overflows int64
                # around 14k x 14k images; 64 exact bigint compares are
                # free next to the decode
                bits = [
                    int(bsum[k]) * (w * h) > total * int(npx[k])
                    for k in range(64)
                ]
                hi = sum(1 << (k - 32) for k in range(32, 64) if bits[k])
                lo = sum(1 << k for k in range(32) if bits[k])
                rows.append((int(aid), w, h, int(hi), int(lo)))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "hash_hi", "hash_lo"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        hashes, AHASH_SCHEMA
    )


def ahash_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 7,
    exact: bool = False,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs by aHash Hamming distance →
    (id_a, id_b, hamming), id_a < id_b, hamming <= max_hamming.

    DEFAULT path is the banded LSH equi-join (the multi-index hashing
    trick, Norouzi et al.): split the 64 bits into `bands` equal
    slices, explode each hash into (band_idx, band_val) rows, self
    equi-join on the band, verify candidates with the exact
    xor-popcount, dedup pairs that collide on several bands. A pair at
    Hamming distance d has its d differing bits inside at most d
    bands, so with d <= bands-1 at least one band matches exactly —
    the banded join is pigeonhole-COMPLETE (identical results to
    all-pairs) for max_hamming <= bands-1, which the default (7 <= 8-1)
    satisfies. Beyond that regime the join is a candidate generator
    with partial recall (measured per-distance by the
    image_ahash_band_eval registry key; on the synthetic fixtures
    recall at 8 <= d <= 24 is the recorded curve, trending to ~0 as d
    approaches uniform-random distance).

    Scale shape: the corpus shuffles as bands x 24-byte rows keyed by
    (band_idx, band_val); join fan-out is quadratic only within one
    band-value bucket — near-dup clusters, never the corpus. No
    CartesianProduct anywhere (plan-asserted in test_plans.py).

    exact=True keeps the O(N^2) all-pairs crossJoin for fixture-scale
    ground truth (the dedup_near_embedding `exact` precedent) — never
    export it; at a media-lake 1e8 images that is 1e16 comparisons.
    """
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))) + F.bit_count(
        F.col("__la").bitwiseXOR(F.col("__lb"))
    )
    if exact:
        a = hashes.select(
            F.col("asset_id").alias("id_a"),
            F.col("hash_hi").alias("__ha"),
            F.col("hash_lo").alias("__la"),
        )
        b = hashes.select(
            F.col("asset_id").alias("id_b"),
            F.col("hash_hi").alias("__hb"),
            F.col("hash_lo").alias("__lb"),
        )
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
        )

    if bands not in (2, 4, 8, 16, 32):
        raise ValueError(f"bands must divide both 32-bit halves; got {bands}")
    width = 64 // bands
    mask = (1 << width) - 1

    def band_val(k: int):
        # hash_lo holds bits 0..31, hash_hi bits 32..63; width divides
        # 32 so no band straddles the halves. Both halves are built as
        # sums of 1<<k with k<32, hence non-negative: shiftright is a
        # pure logical shift here.
        bit0 = k * width
        src = F.col("hash_lo") if bit0 < 32 else F.col("hash_hi")
        return F.shiftright(src, bit0 % 32).bitwiseAND(F.lit(mask))

    banded = hashes.select(
        "asset_id",
        "hash_hi",
        "hash_lo",
        F.posexplode(
            F.array(*[band_val(k) for k in range(bands)])
        ).alias("band_idx", "band_val"),
    )
    a = banded.select(
        F.col("asset_id").alias("id_a"),
        F.col("hash_hi").alias("__ha"),
        F.col("hash_lo").alias("__la"),
        "band_idx",
        "band_val",
    )
    b = banded.select(
        F.col("asset_id").alias("id_b"),
        F.col("hash_hi").alias("__hb"),
        F.col("hash_lo").alias("__lb"),
        "band_idx",
        "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def video_scene_cuts(
    assets: DataFrame,
    every_ms: int = 1000,
    scene_ms: int = 3000,
    threshold: int = 16,
) -> DataFrame:
    """Scene segmentation over a sampled frame grid → one row per
    detected scene: (asset_id, scene_no, n_frames, start_ms, end_ms).

    Pipeline shape (all real): probe the MP4 container (mvhd walk,
    fake=False) → explode the frame-sampling grid → per-frame feature
    → lag-diff cut detection (|Δluma| >= threshold) → scenes as
    cumulative-cut run groups. The per-frame LUMA is the documented
    STUB SEAM: a deterministic stand-in ((id·131 + scene·977) mod 256,
    constant within a scene_ms window) replaces the H.264 frame decode
    the container fixtures don't carry — swap that one expression for
    a mapInPandas decode (the image_ahash pattern) and every plan
    stage downstream is production-ready.

    Scale shape: frame rows explode map-side from the probe; the lag
    window and the scene aggregation both partition by asset_id (a
    video's frame list, never the corpus); no shuffle carries pixels —
    frames reduce to one integer feature before the first exchange.
    """
    from pyspark.sql.window import Window

    frames = frame_sample_plan(assets, every_ms=every_ms, fake=False)
    luma = (
        F.col("asset_id") * F.lit(131)
        + F.floor(F.col("ts_ms") / F.lit(scene_ms)) * F.lit(977)
    ) % F.lit(256)
    w = Window.partitionBy("asset_id").orderBy("ts_ms")
    scored = frames.withColumn("__luma", luma.cast("long")).withColumn(
        "__cut",
        (
            F.abs(
                F.col("__luma") - F.lag("__luma").over(w)
            ).isNull()  # first frame opens scene 1
            | (F.abs(F.col("__luma") - F.lag("__luma").over(w)) >= threshold)
        ).cast("long"),
    )
    return (
        scored.withColumn(
            "scene_no",
            F.sum("__cut")
            .over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("int"),
        )
        .groupBy("asset_id", "scene_no")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
        )
    )


VAD_SCHEMA = (
    "asset_id long, seg_no int, start_sample long, n_samples long, "
    "level int"
)


def audio_vad_segments(
    documents: DataFrame, threshold: int = 128, id_col: str = "doc_id"
) -> DataFrame:
    """Voice-activity-style segmentation over REAL decoded PCM →
    one row per active segment: (asset_id, seg_no, start_sample,
    n_samples, level).

    The audio-curation primitive: split a track into runs where the
    signal exceeds a level threshold (here amplitude >= threshold over
    the real byte-level WAV decode — swap the feature for frame RMS
    energy and the plan is production VAD). Runs are found per asset
    inside the Arrow batch (numpy diff over the boolean mask — arrays
    are asset-sized, never corpus-sized), so the operator is map-only:
    no shuffle carries samples, and downstream consumers get
    segment-width rows.

    The square-wave fixtures make every segment closed-form (each high
    half-period is one run), so the oracle verifies the decode +
    segmentation chain end-to-end.
    """

    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from data_pipeline2_spark.functions.imagecodec import (
            decode_wav_pcm,
            make_wav_pcm_asset,
        )

        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                aid = int(aid)
                samples, _, _ = decode_wav_pcm(make_wav_pcm_asset(aid))
                mono = samples[:, 0].astype("int64")
                active = mono >= threshold
                # run boundaries: prepend/append inactive sentinels so
                # diff marks every run start (+1) and end (-1)
                edges = np.diff(np.r_[0, active.astype(np.int8), 0])
                starts = np.flatnonzero(edges == 1)
                ends = np.flatnonzero(edges == -1)
                for i, (s, e) in enumerate(zip(starts, ends)):
                    rows.append(
                        (aid, i + 1, int(s), int(e - s), int(mono[s]))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "seg_no", "start_sample", "n_samples",
                    "level",
                ],
            )

    return documents.select(
        F.col(id_col).cast("long").alias("asset_id")
    ).mapInPandas(segs, VAD_SCHEMA)
