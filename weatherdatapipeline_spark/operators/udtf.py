"""Python UDTF surface (Spark 4 user-defined TABLE functions): one row
in, many typed rows out, invoked as a lateral join — the API for
fan-out transforms whose output count varies per row (the reference's
nearest analogue is the per-row dict explosion in its JSON flattening,
``pipeline.py`` nested-path handling).

Design stance, same as every Python surface in this repo: UDTFs are
registered with ``useArrow=True`` (Arrow-optimized interchange), the
logic stays pure per-row fan-out with no state, and each UDTF has a
relational twin the oracle runs — the UDTF earns its place by API
coverage and ergonomics, not by doing anything SQL cannot.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="seg_no: int, start_char: bigint, end_char: bigint, seg: string",
    useArrow=True,
)
class SegmentSpans:
    """Explode a text blob into numbered segments WITH character offsets
    for an arbitrary separator — the span bookkeeping an annotation/PII
    pipeline needs to map segment-level findings back into the original
    document (a plain split() loses the offsets). end_char is exclusive;
    the separator itself is outside the span."""

    def eval(self, text: str, sep: str):  # noqa: D401 - UDTF contract
        if text is None or not sep:
            return
        off = 0
        step = len(sep)
        for i, seg in enumerate(text.split(sep)):
            yield i, off, off + len(seg), seg
            off += len(seg) + step
