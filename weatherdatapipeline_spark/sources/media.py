"""Media-lake ingestion via Spark's native ``binaryFile`` source.

The multimodal operators (``operators/multimodal.py``) consume a typed
media frame (MEDIA_SCHEMA); this module produces that frame from a
directory tree of raw media files using ``spark.read.format
("binaryFile")`` — the built-in source a real 100 TB media lake starts
from (one row per file: path, modificationTime, length, content), with
all of Spark's file-source machinery for free: partition planning by
file size, ``pathGlobFilter`` predicate, recursive lookup.

Scale notes
-----------
- ``binaryFile`` caps single-file size at
  ``spark.sql.sources.binaryFile.maxLength`` (int32 max by default);
  bigger artifacts belong in the ``uri``-reference arm of MEDIA_SCHEMA,
  not inline.
- Metadata (PNG dims) comes from a HEADER-ONLY parse
  (``png.png_dimensions`` — 33 bytes in, no inflate), so the ingest scan
  stays IO-bound; full pixel decode happens only in downstream operators
  that need pixels.
- The modality/dims extraction is one Arrow-batched ``mapInPandas`` over
  the file rows — no shuffle; the output is immediately writable as a
  partitioned parquet media table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import MEDIA_SCHEMA

# magic-number sniffing: format detection must not trust file extensions
_MAGICS = [
    (b"\x89PNG\r\n\x1a\n", "image", "png"),
    (b"\xff\xd8\xff", "image", "jpeg"),
    (b"RIFF", "audio", "wav"),  # RIFF/WAVE checked further below
    (b"GIF8", "image", "gif"),
]


def _sniff(blob: bytes | None) -> tuple[str, str]:
    if not blob:
        return ("unknown", "unknown")
    for magic, modality, fmt in _MAGICS:
        if blob.startswith(magic):
            if fmt == "wav" and blob[8:12] != b"WAVE":
                continue
            return (modality, fmt)
    return ("unknown", "unknown")


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Directory of media files → MEDIA_SCHEMA frame.

    ``media_id`` is the xxhash64 of the file path — stable across runs
    and partitionings; modality/format come from magic-number sniffing
    and width/height from the header-only PNG parse (None for formats
    whose headers we don't parse; ``duration_ms`` is None here — audio
    duration needs the WAV fmt chunk, which
    ``multimodal.parse_wav_metadata`` extracts downstream).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.png import png_dimensions

        for pdf in batches:
            out = {
                "uri": [], "blob": [], "modality": [],
                "format": [], "width": [], "height": [],
            }
            for row in pdf.itertuples(index=False):
                blob = bytes(row.content) if row.content is not None else None
                modality, fmt = _sniff(blob)
                dims = png_dimensions(blob) if fmt == "png" else None
                out["uri"].append(row.path)
                out["blob"].append(blob)
                out["modality"].append(modality)
                out["format"].append(fmt)
                out["width"].append(dims[0] if dims else None)
                out["height"].append(dims[1] if dims else None)
            yield pd.DataFrame(out)

    sniffed = files.mapInPandas(
        fn,
        schema=(
            "uri string, blob binary, modality string, format string, "
            "width int, height int"
        ),
    )
    return sniffed.select(
        F.xxhash64("uri").alias("media_id"),
        "modality",
        "uri",
        "blob",
        "width",
        "height",
        F.lit(None).cast("int").alias("duration_ms"),
        "format",
    ).select([f.name for f in MEDIA_SCHEMA.fields])
