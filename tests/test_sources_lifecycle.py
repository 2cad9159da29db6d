"""Binary ingestion (the reference upload path), MIME detection,
status lifecycle latest-wins, TTL cache semantics, multimodal plumbing."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline2_spark.operators import multimodal
from data_pipeline2_spark.operators.cache import cache_aside, ttl_filter, with_expiry
from data_pipeline2_spark.operators.lifecycle import current_status, validate_transitions
from data_pipeline2_spark.sources.binary import ingest_binary_dir


@pytest.fixture(scope="module")
def upload_dir():
    d = tempfile.mkdtemp(prefix="dp2s_upload_")
    files = {
        "report.pdf": b"%PDF-1.4 fake pdf body",
        "notes.md": b"# heading\nbody text",
        "photo.png": bytes.fromhex("89504E470D0A1A0A") + b"fakepng",
        "data.bin": b"\x00\x01\x02unknown",
        "slides.pptx": b"PK\x03\x04fakezip",
    }
    for name, content in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(content)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_ingest_binary_dir(spark, upload_dir):
    out = ingest_binary_dir(spark, upload_dir).toPandas().set_index("filename")
    assert out.loc["report.pdf", "content_type"] == "application/pdf"
    assert out.loc["photo.png", "content_type"] == "image/png"
    assert out.loc["slides.pptx", "content_type"] == "application/zip"  # magic wins
    assert out.loc["notes.md", "content_type"] == "text/markdown"
    assert out.loc["data.bin", "content_type"] == "application/octet-stream"
    assert (out.status == "pending").all()
    assert out.index.size == out["doc_id"].nunique()  # ids unique
    # idempotent: re-ingesting yields identical doc_ids
    again = ingest_binary_dir(spark, upload_dir).toPandas().set_index("filename")
    assert (out["doc_id"] == again["doc_id"]).all()


def test_status_latest_wins(spark):
    log = spark.createDataFrame(
        [
            (1, "pending", None, "2024-01-01 00:00:00"),
            (1, "processing", None, "2024-01-01 00:01:00"),
            (1, "completed", None, "2024-01-01 00:02:00"),
            (2, "pending", None, "2024-01-01 00:00:00"),
            (2, "failed", "boom", "2024-01-01 00:05:00"),
        ],
        "doc_id long, status string, error_message string, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    cur = {r.doc_id: (r.status, r.error_message)
           for r in current_status(log).collect()}
    assert cur[1] == ("completed", None)
    assert cur[2] == ("failed", "boom")
    assert validate_transitions(log).count() == 0

    bad = log.union(
        spark.createDataFrame(
            [(1, "processing", None, "2024-01-01 00:03:00")],
            log.schema.simpleString().replace("struct<", "").replace(">", "")
            if False else "doc_id long, status string, error_message string, updated_at string",
        ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    )
    assert validate_transitions(bad).count() == 1


def test_ttl_semantics(spark):
    rows = [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 02:00:00")]
    df = spark.createDataFrame(rows, "id long, created_at string").withColumn(
        "created_at", F.col("created_at").cast("timestamp")
    )
    fresh = ttl_filter(df, "created_at", 3600, "2024-01-01 02:30:00").collect()
    assert [r.id for r in fresh] == [2]
    exp = with_expiry(df, "created_at", 3600).collect()
    assert str(exp[0].expires_at) == "2024-01-01 01:00:00"


def test_cache_aside_split(spark):
    reqs = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    cache = spark.createDataFrame([("a",), ("c",)], "k string")
    hits, misses = cache_aside(reqs, cache, ["k"])
    assert {r.k for r in hits.collect()} == {"a", "c"}
    assert {r.k for r in misses.collect()} == {"b"}


def test_multimodal_decode_fake_and_stub(spark):
    docs = spark.createDataFrame(
        [(i, f"payload {i} " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    assets = multimodal.documents_as_assets(docs)
    out = multimodal.decode_assets(assets, fake=True).toPandas()
    assert len(out) == 6
    img = out[out.modality == "image"]
    assert img.width.notna().all() and img.height.notna().all()
    av = out[out.modality != "image"]
    assert av.duration_ms.notna().all()
    # stub path: the real-decoder seam raises where codecs would plug in
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.decode_assets(assets, fake=False).collect()


def test_resize_plan_and_execute(spark):
    # long texts → big fake dims → most images need shrinking
    docs = spark.createDataFrame(
        [(i * 3, f"img payload {i} " * (i * 40 + 1)) for i in range(8)],
        "doc_id long, text string",
    )
    assets = multimodal.documents_as_assets(docs)
    plan = multimodal.resize_plan(assets, max_dim=64).toPandas()
    assert len(plan) == 8  # every image planned, shrink or not
    assert (plan.target_w <= 64).all() and (plan.target_h <= 64).all()
    assert (plan.target_w >= 1).all() and (plan.target_h >= 1).all()
    noop = plan[plan.scale == 1.0]
    assert (noop.target_w == noop.width).all()
    # aspect ratio preserved within integer truncation
    shrunk = plan[plan.scale < 1.0]
    assert len(shrunk) > 0
    out = multimodal.resize_assets(assets, max_dim=64, fake=True).toPandas()
    assert set(out.asset_id) == set(shrunk.asset_id)  # only shrinkers resized
    assert out.payload.map(len).eq(32).all()  # fake pixels = sha256 digest
    # deterministic: same inputs → byte-identical payloads
    again = multimodal.resize_assets(assets, max_dim=64, fake=True).toPandas()
    m1 = dict(zip(out.asset_id, out.payload))
    m2 = dict(zip(again.asset_id, again.payload))
    assert m1 == m2
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        multimodal.resize_assets(assets, max_dim=64, fake=False).collect()


def test_extract_features_unit_norm_deterministic(spark):
    import numpy as np

    docs = spark.createDataFrame(
        [(i, f"asset {i}") for i in range(6)] + [(100, "asset 0x")],
        "doc_id long, text string",
    )
    assets = multimodal.documents_as_assets(docs)
    out = multimodal.extract_features(assets, dim=32, fake=True).toPandas()
    assert len(out) == 7
    norms = out.feature.map(lambda v: float(np.linalg.norm(v)))
    assert ((norms - 1.0).abs() < 1e-5).all()
    assert out.feature.map(len).eq(32).all()
    # deterministic across runs; distinct payloads → distinct vectors
    again = multimodal.extract_features(assets, dim=32, fake=True).toPandas()
    f1 = {a: tuple(v) for a, v in zip(out.asset_id, out.feature)}
    f2 = {a: tuple(v) for a, v in zip(again.asset_id, again.feature)}
    assert f1 == f2
    assert len(set(f1.values())) == 7
    with pytest.raises(Exception, match="NotImplementedError|model"):
        multimodal.extract_features(assets, fake=False).collect()


def test_frame_sample_plan(spark):
    docs = spark.createDataFrame(
        [(i, "x" * 100) for i in range(9)], "doc_id long, text string"
    )
    assets = multimodal.documents_as_assets(docs)
    plan = multimodal.frame_sample_plan(assets, every_ms=1000).toPandas()
    assert (plan.ts_ms == plan.frame_no * 1000).all()
    assert plan.groupby("asset_id").frame_no.min().eq(0).all()


def test_metadata_filter_malformed_json(spark):
    from data_pipeline2_spark.operators.relational import metadata_filter
    from pyspark.sql import functions as F

    evt = spark.createDataFrame(
        [(1, '{"k": 95}'), (2, "not json"), (3, ""), (4, None), (5, '{"k": 10}')],
        "event_id long, props string",
    )
    out = metadata_filter(evt, "props", "$.k", lambda c: c.cast("int") > 50)
    # malformed/missing JSON → null extraction → filtered out, no errors
    assert [r.event_id for r in out.collect()] == [1]


def test_convert_documents_seam(spark, upload_dir):
    from data_pipeline2_spark.operators.convert import convert_documents

    ingested = ingest_binary_dir(spark, upload_dir)
    # strict mode raises at the docling plug-in point for binary formats
    with pytest.raises(Exception, match="NotImplementedError|no converter"):
        convert_documents(ingested).collect()
    # lenient mode converts text formats for real, stubs the rest
    out = convert_documents(ingested, lenient=True).toPandas()
    assert len(out) == 5
    md = out[out.content_type == "text/markdown"].iloc[0]
    assert md["text"].startswith("# heading") and md["converter"] == "text/markdown"
    pdf = out[out.content_type == "application/pdf"].iloc[0]
    assert pdf["converter"] == "stub" and "unconverted" in pdf["text"]
    # custom converter plugs into the same seam
    out2 = convert_documents(
        ingested,
        converters={"application/pdf": lambda b: f"PDFTEXT:{len(b)}"},
        lenient=True,
    ).toPandas()
    pdf2 = out2[out2.content_type == "application/pdf"].iloc[0]
    assert pdf2["text"].startswith("PDFTEXT:")


def test_multimodal_real_decode_all_formats(spark):
    """The REAL path: actual PNG/GIF/BMP/JPEG/WAV container bytes are
    generated, then decode_assets(fake=False) re-parses the headers —
    parsed dims/duration must equal what the generator embedded."""
    from data_pipeline2_spark.functions.imagecodec import (
        fixture_dims,
        fixture_duration_ms,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(25)], "doc_id long"
    )
    assets = multimodal.real_assets(docs)
    out = multimodal.decode_assets(assets, fake=False).toPandas()
    assert len(out) == 25
    assert set(out.format) == {"png", "gif", "bmp", "jpeg", "wav"}
    for r in out.itertuples():
        if r.format == "wav":
            assert r.modality == "audio"
            assert r.duration_ms == fixture_duration_ms(r.asset_id)
        else:
            w, h = fixture_dims(r.asset_id)
            assert (r.width, r.height) == (w, h), r


def test_multimodal_real_resize_roundtrip(spark):
    """Real pixel path: PNG decode → nearest resize → PNG encode; the
    output payload re-decodes to exactly the target geometry and the
    corner pixel survives (nearest-neighbor maps (0,0) to (0,0))."""
    import numpy as np

    from data_pipeline2_spark.functions.imagecodec import decode_png, make_asset

    # ids divisible by 5 are PNG fixtures; pick ones bigger than max_dim
    ids = [i for i in range(0, 500, 5) if max(
        (16 + i % 97), (16 + i % 53)) > 32][:6]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    assets = multimodal.real_assets(docs)
    out = multimodal.resize_assets(assets, max_dim=32, fake=False).toPandas()
    assert len(out) == len(ids)
    originals = {i: decode_png(make_asset(i)[1]) for i in ids}
    for r in out.itertuples():
        arr = decode_png(bytes(r.payload))
        assert arr.shape == (r.target_h, r.target_w, 3)
        assert (arr[0, 0] == originals[r.asset_id][0, 0]).all()


def test_mp4_probe_structure_and_corruption():
    """Box walk handles largesize/size-0 and rejects corrupt structure;
    garbage never parses as MP4."""
    import struct

    import pytest

    from data_pipeline2_spark.functions.imagecodec import (
        make_mp4_asset,
        probe_mp4,
    )

    payload = make_mp4_asset(42)
    info = probe_mp4(payload)
    assert info["format"] == "mp4" and info["timescale"] == 1000
    assert info["duration_ms"] == 1000 + (42 % 97) * 137

    assert probe_mp4(b"random bytes, not a container") is None
    assert probe_mp4(b"\x00\x00\x00\x08ftyp") is None  # ftyp alone: too short

    # corrupt: box claiming to extend past the payload
    bad = bytearray(payload)
    i = bad.find(b"moov") - 4
    bad[i : i + 4] = struct.pack(">I", len(bad) * 2)
    with pytest.raises(ValueError, match="box size"):
        probe_mp4(bytes(bad))

    # corrupt: zero timescale
    bad2 = bytearray(payload)
    j = bad2.find(b"mvhd") + 4 + 12
    bad2[j : j + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="timescale"):
        probe_mp4(bytes(bad2))


def test_mp4_probe_v1_boxes_and_truncation():
    """Version-1 mvhd/tkhd (64-bit times) parse; truncated v1 boxes
    raise ValueError, never IndexError/struct.error."""
    import struct

    import pytest

    from data_pipeline2_spark.functions.imagecodec import probe_mp4

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd_v1 = box(
        b"mvhd",
        b"\x01\x00\x00\x00" + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 1000) + struct.pack(">Q", 7500)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + bytes(10)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24) + struct.pack(">I", 2),
    )
    tkhd_v1 = box(
        b"tkhd",
        b"\x01\x00\x00\x07" + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 1) + bytes(4) + struct.pack(">Q", 7500)
        + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 320 << 16, 240 << 16),
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512))
    payload = ftyp + box(b"moov", mvhd_v1 + box(b"trak", tkhd_v1))
    info = probe_mp4(payload)
    assert info["duration_ms"] == 7500
    assert (info["width"], info["height"]) == (320, 240)

    # truncated v1 mvhd followed by another box: must NOT read the
    # neighbor's bytes as duration
    short_mvhd = box(b"mvhd", b"\x01\x00\x00\x00" + bytes(24))
    bad = ftyp + box(b"moov", short_mvhd + box(b"free", bytes(8)))
    with pytest.raises(ValueError, match="mvhd"):
        probe_mp4(bad)

    # empty mvhd / tkhd bodies at end of payload: ValueError, not IndexError
    with pytest.raises(ValueError):
        probe_mp4(ftyp + box(b"moov", box(b"mvhd", b"")))
    with pytest.raises(ValueError):
        probe_mp4(
            ftyp + box(b"moov", mvhd_v1 + box(b"trak", box(b"tkhd", b"")))
        )

    # implausible (int32-overflowing) duration is corrupt, not returned
    huge = box(
        b"mvhd",
        b"\x01\x00\x00\x00" + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 1) + struct.pack(">Q", 1 << 40),
    )
    with pytest.raises(ValueError, match="implausible"):
        probe_mp4(ftyp + box(b"moov", huge))


def test_mp4_probe_fuzz_never_unstructured():
    import random

    from data_pipeline2_spark.functions.imagecodec import probe_mp4

    rng = random.Random(7)
    for _ in range(500):
        n = rng.randrange(0, 200)
        b = bytes(rng.randrange(256) for _ in range(n))
        try:
            out = probe_mp4(b"\x00\x00\x00\x14ftypisom" + b)
            assert out is None or isinstance(out, dict)
        except ValueError:
            pass
