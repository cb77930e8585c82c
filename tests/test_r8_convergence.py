"""Round-8: convergence-checked graph iterations (VERDICT r7 item 5).

Planted graphs DEEPER than the old fixed unrolls (8 peels / 4 hops)
prove the convergence-checked operators reach the true fixpoint where
a fixed-round run would silently return a superset / partial table —
and that exhausting the round cap raises instead of under-computing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherdatapipeline_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "a long, b long")


def _path_plus_triangle(n_path: int):
    """Path 0-1-...-n anchored to a triangle (n, n+1, n+2): 2-core
    peeling eats the free end one node per round -> n_path rounds,
    true 2-core = the triangle."""
    pairs = [(i, i + 1) for i in range(n_path)]
    t0 = n_path
    pairs += [(t0, t0 + 1), (t0 + 1, t0 + 2), (t0, t0 + 2)]
    return pairs


def test_kcore_deep_cascade_reaches_true_core(spark):
    # 20-node tail needs ~20 peeling rounds — far past the old unroll of 8
    e = _edges(spark, _path_plus_triangle(20))
    core = G.kcore(e, k=2, max_rounds=64)
    got = sorted(tuple(r) for r in core.collect())
    assert got == [(20, 21), (20, 22), (21, 22)]


def test_kcore_raises_when_cap_exhausted(spark):
    e = _edges(spark, _path_plus_triangle(20))
    with pytest.raises(RuntimeError, match="did not converge"):
        G.kcore(e, k=2, max_rounds=3)


def test_kcore_empty_core_converges(spark):
    # pure path: the 2-core is empty; the loop must terminate at the
    # empty fixpoint, not raise
    e = _edges(spark, [(i, i + 1) for i in range(6)])
    assert G.kcore(e, k=2, max_rounds=64).count() == 0


def test_sssp_converged_exact_on_deep_path(spark):
    # 16-hop path: the bounded-4-round contract reaches only 4 hops;
    # converge=True must return the full exact table
    e = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(16)], "a long, b long, w long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    full = G.minplus_sssp(e, seeds, rounds=64, converge=True)
    got = {r["n"]: r["d"] for r in full.collect()}
    assert got == {i: i for i in range(17)}

    bounded = G.minplus_sssp(e, seeds, rounds=4)
    got4 = {r["n"]: r["d"] for r in bounded.collect()}
    assert got4 == {i: i for i in range(5)}  # documented bounded-hop contract


def test_sssp_converged_raises_when_cap_exhausted(spark):
    e = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(16)], "a long, b long, w long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(RuntimeError, match="did not converge"):
        G.minplus_sssp(e, seeds, rounds=3, converge=True)


def test_sssp_converged_takes_cheaper_long_route(spark):
    # weighted correctness at the fixpoint: 0->3 direct costs 10, the
    # 3-edge detour costs 3; convergence must find the detour
    e = spark.createDataFrame(
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)], "a long, b long, w long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["n"]: r["d"] for r in G.minplus_sssp(e, seeds, rounds=16, converge=True).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
