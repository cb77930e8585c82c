"""Fast double-array literals (r14, guide §1.2 per-task vs driver work).

``F.array(*[F.lit(x) for x in xs])`` costs one py4j round-trip per
element; the big literal tables this engine ships into expressions (PQ
codebooks: 1024 doubles, PCA components, sign-LSH planes, query
vectors) were paying 1-5 s of pure DRIVER time per query just to BUILD
the expression tree (measured: 1000 ``F.lit`` calls = 1.18 s, the same
array as one parsed expression = 0.005 s).

These helpers emit ONE ``F.expr`` string instead. Values are embedded
as ``CAST(repr(x) AS DOUBLE)``: Python ``repr`` prints the shortest
digits that round-trip the IEEE754 double, and Catalyst parses them
with ``Double.parseDouble`` (round-to-nearest), so the literal the JVM
sees is BIT-IDENTICAL to what ``F.lit(float(x))`` would have shipped —
verified by a 200-value randomized struct-pack comparison. Not for NaN
or infinities (assert below); none of the shipped tables contain them.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x) -> str:
    v = float(x)
    assert not (math.isnan(v) or math.isinf(v)), "non-finite literal"
    return f"CAST({v!r} AS DOUBLE)"


def darray(values) -> Column:
    """array<double> literal column from an iterable of floats."""
    return F.expr("array(" + ",".join(_d(v) for v in values) + ")")


def darray2(rows) -> Column:
    """array<array<double>> literal column from nested iterables."""
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(_d(v) for v in r) + ")" for r in rows)
        + ")"
    )
