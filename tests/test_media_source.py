"""binaryFile media-lake ingestion (sources/media.py) end-to-end with the
pure-stdlib PNG codec: files written by encode_png round-trip through
Spark's binaryFile source into MEDIA_SCHEMA rows with header-parsed
dimensions, then flow through the REAL decode arm of extract_features."""

from __future__ import annotations

import pytest

from weatherdatapipeline_spark.operators.multimodal import extract_features
from weatherdatapipeline_spark.operators.png import encode_png
from weatherdatapipeline_spark.sources.media import read_media_dir


@pytest.fixture()
def media_dir(tmp_path):
    d = tmp_path / "lake"
    d.mkdir()
    # three PNGs of distinct geometry + one WAV-ish + one junk file
    for i, (w, h) in enumerate([(4, 3), (8, 1), (2, 2)]):
        (d / f"img_{i}.png").write_bytes(
            encode_png(w, h, "L", bytes((7 * j + i) % 251 for j in range(w * h)))
        )
    (d / "clip.wav").write_bytes(b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + b"\x00" * 32)
    (d / "notes.bin").write_bytes(b"not a media file at all")
    return str(d)


def test_read_media_dir_sniffs_and_parses_headers(spark, media_dir):
    rows = {r["uri"].rsplit("/", 1)[-1]: r for r in read_media_dir(spark, media_dir).collect()}
    assert len(rows) == 5
    assert rows["img_0.png"]["modality"] == "image"
    assert rows["img_0.png"]["format"] == "png"
    assert (rows["img_0.png"]["width"], rows["img_0.png"]["height"]) == (4, 3)
    assert (rows["img_1.png"]["width"], rows["img_1.png"]["height"]) == (8, 1)
    assert rows["clip.wav"]["modality"] == "audio"
    assert rows["clip.wav"]["format"] == "wav"
    assert rows["notes.bin"]["modality"] == "unknown"
    assert rows["notes.bin"]["width"] is None
    # media_id is a pure function of the path: stable across re-reads
    again = {r["uri"]: r["media_id"] for r in read_media_dir(spark, media_dir).collect()}
    assert all(again[r["uri"]] == r["media_id"] for r in rows.values())


def test_glob_filter_restricts_files(spark, media_dir):
    got = read_media_dir(spark, media_dir, glob="*.png").collect()
    assert len(got) == 3 and all(r["format"] == "png" for r in got)


def test_ingested_pngs_flow_through_real_decode(spark, media_dir):
    media = read_media_dir(spark, media_dir, glob="img_1.png")
    [row] = extract_features(media, dim=8).collect()
    # img_1 is 8x1 grayscale with pixels (7j+1) % 251: the REAL decode arm
    # must return exactly those pixels normalized, not the byte-fold hash
    expected = [((7 * j + 1) % 251) / 255.0 for j in range(8)]
    assert row["feature"] == pytest.approx(expected, abs=1e-6)
