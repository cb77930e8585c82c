"""PassJoin edit-distance join: brute-force parity on a corpus that
exercises every arm — planted typos (substitution / insert / delete),
identical strings, strings too short to partition (the broadcast
residual), and radii 1 and 2."""

from __future__ import annotations

import pytest

from weatherdatapipeline_spark.operators.dedup import passjoin_near_duplicates


def lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def corpus() -> list[tuple[int, str]]:
    words = ["small", "large", "red", "blue", "ring", "bolt", "gear", "gizmo"]
    strs = []
    k = 0
    for w1 in words:
        for w2 in words:
            s = f"{w1} {w2}"
            strs.append(s)
            # planted typos: substitution, deletion, insertion
            strs.append("x" + s[1:])
            strs.append(s[1:])
            strs.append(s[:3] + "q" + s[3:])
            k += 1
    # residual shorts (len <= 2) and an empty-adjacent case
    strs += ["a", "ab", "b", "zz", "small ring"]
    return list(enumerate(strs))


@pytest.mark.parametrize("d", [1, 2])
def test_passjoin_equals_brute_force(spark, d):
    rows = corpus()
    brute = {
        (i, j, lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and lev(a, b) <= d
    }
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in passjoin_near_duplicates(
            df, id_col="doc_id", text_col="text", max_dist=d
        ).collect()
    }
    assert got == brute


def test_passjoin_zero_radius_is_exact_dup(spark):
    rows = [(0, "abc"), (1, "abc"), (2, "abd"), (3, "abc")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r.doc_a, r.doc_b)
        for r in passjoin_near_duplicates(df, max_dist=0).collect()
    }
    assert got == {(0, 1), (0, 3), (1, 3)}
