from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from weatherdatapipeline_spark.operators.multimodal import (
    decode_image_strict,
    extract_features,
    sample_frames,
    synthetic_media,
)
from weatherdatapipeline_spark.schemas import WEATHER_RAW
from weatherdatapipeline_spark.sources.catalog import TableCatalog
from weatherdatapipeline_spark.sources.rest import ingest
from weatherdatapipeline_spark.sources.synthetic import synthetic_weather


def canned_payload(city: str) -> str | None:
    if city == "Brokenville":
        return "{not json"
    if city == "Nowhere":
        raise RuntimeError("connection refused")
    return json.dumps(
        {
            "name": city,
            "main": {"temp": 21.5, "feels_like": 22.0, "humidity": 55, "pressure": 1012},
            "weather": [{"main": "Clear", "description": "clear sky"}],
            "wind": {"speed": 3.2},
            "sys": {"country": "XX"},
            "dt": 1700000000,
        }
    )


def test_rest_ingest_tolerates_failures(spark):
    out = ingest(spark, ["Alpha", "Brokenville", "Nowhere", "Beta"], canned_payload)
    rows = out.collect()
    # Brokenville (bad JSON) and Nowhere (fetch error) are skipped, batch survives
    assert sorted(r["city"] for r in rows) == ["Alpha", "Beta"]
    r = rows[0]
    assert r["temperature"] == 21.5 and r["weather"] == "Clear" and r["country"] == "XX"
    assert r["timestamp"] == 1700000000


def test_synthetic_weather_shape_and_determinism(spark):
    a = synthetic_weather(spark, n_batches=3).collect()
    b = synthetic_weather(spark, n_batches=3).collect()
    assert len(a) == 30
    assert a == b  # hash-derived, partition-stable
    temps = [r["temperature"] for r in a]
    assert all(5.0 <= t <= 50.0 for t in temps)
    per_city = {}
    for r in a:
        per_city.setdefault(r["city"], []).append(r["timestamp"])
    assert all(ts == sorted(ts) and len(set(ts)) == len(ts) for ts in per_city.values())


def test_catalog_sinks_roundtrip(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path))
    df = synthetic_weather(spark, n_batches=2)
    cat.append_raw(df)
    cat.append_raw(df)  # append log grows
    assert cat.read("raw_weather").count() == 40
    cat.overwrite_current(df)
    cur = cat.read("current_weather")
    assert cur.count() == 10  # latest row per city
    assert cur.filter(F.col("is_current")).count() == 10
    cat.append_batch_partition(df)
    assert "batch_id" in cat.read("weather_batches").columns
    assert sorted(cat.list_tables()) == ["current_weather", "raw_weather", "weather_batches"]


def test_csv_roundtrip_with_schema(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path))
    df = synthetic_weather(spark, n_batches=1)
    cat.write_csv(df, "csv_out")
    back = cat.read_csv("csv_out", WEATHER_RAW)
    assert back.count() == 10
    assert back.schema["humidity"].dataType.simpleString() == "int"


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path))
    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, 'quote " and\nnewline', "de")],
        "doc_id LONG, text STRING, lang STRING",
    )
    cat.write_jsonl(docs, "docs_jsonl")
    back = cat.read_jsonl("doc_id LONG, text STRING, lang STRING", "docs_jsonl")
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    # JSON string escaping must round-trip quotes and embedded newlines
    assert got == {1: ("hello world", "en"), 2: ('quote " and\nnewline', "de")}


def test_jsonl_malformed_line_is_permissive(spark, tmp_path):
    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\nnot json at all\n{"doc_id": 2, "text": "fine"}\n'
    )
    cat = TableCatalog(spark, str(tmp_path))
    back = cat.read_jsonl(
        "doc_id LONG, text STRING, _corrupt_record STRING", "bad"
    ).cache()  # PERMISSIVE + corrupt column requires a cache/materialization
    assert back.count() == 3
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert {r["doc_id"] for r in back.filter(F.col("doc_id").isNotNull()).collect()} == {1, 2}
    back.unpersist()


def test_orc_roundtrip(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path))
    df = synthetic_weather(spark, n_batches=1)
    cat.write_orc(df, "orc_out")
    back = cat.read_orc("orc_out")
    assert back.count() == 10
    assert back.schema["humidity"].dataType.simpleString() == "int"


def test_multimodal_features(spark):
    media = synthetic_media(spark, n=12)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 12
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(r["n_bytes"] == 64 for r in feats)  # sha2-256 hex → 64 bytes
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    first = {r["media_id"]: r["feature"] for r in feats}
    assert again == first  # deterministic


def test_multimodal_frame_sampling(spark):
    media = synthetic_media(spark, n=12)
    frames = sample_frames(media, every_ms=1000)
    per_media = (
        frames.groupBy("media_id").count().join(media, "media_id").collect()
    )
    for r in per_media:
        assert r["count"] == (r["duration_ms"] + 999) // 1000


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(_have_pil(), reason="PIL installed: stdlib-only errors dormant")
def test_decode_strict_errors_without_pil():
    # non-PNG formats have no stdlib codec → NotImplementedError
    with pytest.raises(NotImplementedError):
        decode_image_strict(b"\xff\xd8\xff\xe0fakejpeg")
    # a PNG-signature-prefixed but truncated stream is a corrupt PNG
    with pytest.raises(ValueError):
        decode_image_strict(b"\x89PNG")


def test_decode_real_image_any_backend():
    # real decode runs in-sandbox: the PNG is generated by the stdlib
    # encoder and decoded through whichever backend resolves (PIL when
    # installed, operators/png.py otherwise)
    from weatherdatapipeline_spark.operators.png import encode_png

    blob = encode_png(4, 3, "RGB", bytes([10, 200, 30]) * 12)
    img = decode_image_strict(blob)
    assert img.size == (4, 3)
    # ITU-R 601 luma of (10, 200, 30) ≈ 124; backends may round ±1
    luma = list(img.convert("L").getdata())[0]
    assert abs(luma - 124) <= 1


def test_extract_features_real_decode_path(spark):
    # a valid PNG flows through the REAL decode branch: features are
    # normalized grayscale pixels, NOT the byte-fold stand-in of the blob
    from weatherdatapipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _fake_feature,
    )
    from weatherdatapipeline_spark.operators.png import encode_png

    blob = encode_png(8, 1, "L", b"\xff" * 8)
    media = spark.createDataFrame(
        [(0, "image", None, bytearray(blob), 8, 1, None, "png")], MEDIA_SCHEMA
    )
    [row] = extract_features(media, dim=8).collect()
    assert row["feature"] == [1.0] * 8  # white pixels → 255/255
    assert row["feature"] != _fake_feature(blob, 8)


def test_catalog_compact_small_files(spark, tmp_path):
    from weatherdatapipeline_spark.sources.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path))
    df = spark.range(1000).withColumnRenamed("id", "x")
    for _ in range(5):  # five appends -> many small files
        df.repartition(8).write.mode("append").parquet(cat.path("logs"))
    import glob

    before = len(glob.glob(f"{cat.path('logs')}/*.parquet"))
    assert before >= 40
    n = cat.compact("logs", target_file_bytes=10 * 1024 * 1024)
    after = len(glob.glob(f"{cat.path('logs')}/*.parquet"))
    assert n == 1 and after == 1
    assert spark.read.parquet(cat.path("logs")).count() == 5000


def test_zorder_layout_improves_two_column_locality(spark, tmp_path):
    """Z-ordered files must cover small rectangles in (a, b) space:
    the mean per-file min-max extent on EACH column must be far below
    the single-column-sorted layout's extent on its non-sorted column
    (where every file spans ~the full range)."""
    import pyarrow.parquet as pq
    import os

    from weatherdatapipeline_spark.sources.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path))
    n = 20_000
    df = spark.range(n).selectExpr(
        "id", "CAST(pmod(id * 2654435761, 100000) AS DOUBLE) AS a",
        "CAST(pmod(id * 40503, 100000) AS DOUBLE) AS b",
    )
    cat.write_zordered(df, "zorder", "a", "b", bits=10, n_ranges=16)
    cat.write_range_sorted(df, "asorted", "a", n_ranges=16)

    def mean_extent(table, col):
        root = cat.path(table)
        spans = []
        for f in os.listdir(root):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    full = 100000.0
    # z-order: both columns localized well below the full range
    assert mean_extent("zorder", "a") < 0.6 * full
    assert mean_extent("zorder", "b") < 0.6 * full
    # single-column sort: the sorted column is tight but the OTHER
    # column's per-file extent spans essentially everything
    assert mean_extent("asorted", "a") < 0.2 * full
    assert mean_extent("asorted", "b") > 0.9 * full
    # z-order beats the single-sort layout on the non-sorted column
    assert mean_extent("zorder", "b") < 0.7 * mean_extent("asorted", "b")


def test_multimodal_resize_geometry(spark):
    from weatherdatapipeline_spark.operators.multimodal import resize_images

    media = synthetic_media(spark, n=12)
    out = resize_images(media, max_side=16).collect()
    images = media.filter("modality = 'image'").count()
    assert len(out) == images and images > 0
    for r in out:
        # aspect-fit: longest side capped at 16, never upscaled, >= 1
        assert max(r["target_w"], r["target_h"]) <= max(16, 1)
        assert r["target_w"] >= 1 and r["target_h"] >= 1
        scale = min(1.0, 16 / max(r["width"], r["height"]))
        assert r["target_w"] == max(1, round(r["width"] * scale))
        assert r["target_h"] == max(1, round(r["height"] * scale))
        # synthetic blobs are not decodable images: blob passes through
        if r["resized"] == "passthrough":
            assert r["blob"] is not None and len(r["blob"]) == 64


def test_multimodal_resize_real_pixels(spark):
    # runs against whichever backend resolves: PIL when installed, the
    # stdlib PNG codec otherwise — never skipped
    from weatherdatapipeline_spark.operators.multimodal import (
        _pil_image_module,
        resize_images,
    )

    Image = _pil_image_module()
    import io

    img = Image.new("RGB", (40, 20), color=(9, 8, 7))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    pdf = pd.DataFrame(
        [
            {
                "media_id": 1, "modality": "image", "uri": None,
                "blob": buf.getvalue(), "width": 40, "height": 20,
                "duration_ms": None, "format": "png",
            }
        ]
    )
    from weatherdatapipeline_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(pdf, MEDIA_SCHEMA)
    row = resize_images(media, max_side=16).collect()[0]
    assert row["resized"] == "decoded"
    assert (row["target_w"], row["target_h"]) == (16, 8)
    back = Image.open(io.BytesIO(row["blob"]))
    assert back.size == (16, 8)


def test_audio_frame_features_known_signals(spark):
    """PCM16 DSP path is REAL (no codec needed): a full-scale square wave
    alternating every sample has rms=1, zcr=1, peak=1; silence has all zeros; a
    half-scale constant has rms=peak=0.5, zcr=0."""
    import numpy as np

    from weatherdatapipeline_spark.operators.multimodal import (
        audio_frame_features,
    )

    sr, frame_ms = 1000, 100  # frame_len = 100 samples
    square = (np.tile([32767, -32768], 150).astype("<i2"))  # 300 samples
    silence = np.zeros(250, dtype="<i2")
    half = np.full(120, 16384, dtype="<i2")
    rows = [
        (1, bytearray(square.tobytes())),
        (2, bytearray(silence.tobytes())),
        (3, bytearray(half.tobytes())),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, blob BINARY")
    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in audio_frame_features(df, sample_rate=sr, frame_ms=frame_ms).collect()
    }
    # square: 3 full frames; alternating sign flips every sample
    assert (1, 2) in got and (1, 3) not in got
    r = got[(1, 0)]
    assert r["peak"] == 1.0 and abs(r["rms"] - 1.0) < 1e-4
    assert abs(r["zcr"] - (99 / 99)) < 0.02  # flips at every adjacent pair
    # silence: 2 frames of zeros
    assert got[(2, 0)]["rms"] == 0.0 and got[(2, 0)]["zcr"] == 0.0
    assert got[(2, 1)]["peak"] == 0.0
    # constant half scale: 1 frame (120 // 100), no crossings
    assert (3, 1) not in got
    assert abs(got[(3, 0)]["rms"] - 0.5) < 1e-4 and got[(3, 0)]["zcr"] == 0.0


def _wav_bytes(n_frames=800, rate=8000, ch=1, amp=0.5):
    """Real WAV bytes via the stdlib wave module — ground truth for the
    RIFF parser."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(ch)
    w.setsampwidth(2)
    w.setframerate(rate)
    frames = b"".join(
        struct.pack(
            "<" + "h" * ch,
            *([int(amp * 32767 * math.sin(2 * math.pi * 440 * i / rate))] * ch),
        )
        for i in range(n_frames)
    )
    w.writeframes(frames)
    w.close()
    return buf.getvalue()


def test_wav_metadata_parses_stdlib_written_files(spark):
    from weatherdatapipeline_spark.operators.multimodal import parse_wav_metadata

    rows = [
        (1, _wav_bytes(n_frames=800, rate=8000, ch=1)),
        (2, _wav_bytes(n_frames=4410, rate=44100, ch=2)),
    ]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r["media_id"]: r.asDict() for r in parse_wav_metadata(media).collect()}
    assert got[1]["valid"] == 1
    assert (got[1]["n_channels"], got[1]["sample_rate"], got[1]["bits_per_sample"]) == (1, 8000, 16)
    assert got[1]["n_frames"] == 800
    assert abs(got[1]["duration_ms"] - 100.0) < 1e-9
    assert (got[2]["n_channels"], got[2]["sample_rate"]) == (2, 44100)
    assert got[2]["n_frames"] == 4410
    assert abs(got[2]["duration_ms"] - 100.0) < 1e-9


def test_wav_metadata_total_on_garbage(spark):
    from weatherdatapipeline_spark.operators.multimodal import parse_wav_metadata

    wav = _wav_bytes()
    rows = [
        (1, b"not a wav at all, definitely not 44 bytes of riff"),
        (2, None),
        (3, wav[:30]),          # truncated header
        (4, b"RIFF" + wav[4:8] + b"AIFF" + wav[12:]),  # wrong form type
        (5, wav),               # one good row among the wreckage
    ]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r["media_id"]: r["valid"] for r in parse_wav_metadata(media).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 0, 5: 1}
