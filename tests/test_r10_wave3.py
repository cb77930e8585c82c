"""Round-10 wave 3: semantic assertions for the paired/nonparametric test
battery, the Nelson-Aalen hazard, the stationary chain, and the CCF.
Oracle hash parity is covered by tools/check_oracle.py; these pin the MATH
against pure-Python replays and fixed-point properties the hashes can't
see."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import pytest

from pyspark.sql import functions as F

from weatherdatapipeline_spark.queries import QUERIES, _t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from weatherdatapipeline_spark.session import get_spark

    return get_spark("r10-wave3-tests")


@pytest.fixture(scope="module")
def events(spark):
    return [
        (r["user_id"], r["ts"], r["event_type"], r["value"])
        for r in _t(spark, SF, "events")
        .select("user_id", "ts", "event_type", "value")
        .collect()
    ]


def test_wilcoxon_matches_pure_python(spark, events):
    we_sum: dict = defaultdict(lambda: [Decimal(0), Decimal(0), 0, 0])
    for u, ts, _t_, v in events:
        if v is None:
            continue
        is_we = ts.weekday() >= 5  # Sat=5, Sun=6 == dayofweek in (1,7)
        acc = we_sum[u]
        if is_we:
            acc[0] += Decimal(repr(v))
            acc[2] = 1
        else:
            acc[1] += Decimal(repr(v))
            acc[3] = 1
    diffs = [
        a[0] - a[1] for a in we_sum.values() if a[2] and a[3] and a[0] != a[1]
    ]
    ads = sorted(abs(d) for d in diffs)
    # mid-ranks under ties
    rank_of: dict = {}
    i = 0
    while i < len(ads):
        j = i
        while j < len(ads) and ads[j] == ads[i]:
            j += 1
        rank_of[ads[i]] = (i + 1 + j) / 2.0
        i = j
    w_plus = sum(rank_of[abs(d)] for d in diffs if d > 0)
    n = float(len(diffs))
    tie_counts = defaultdict(int)
    for d in diffs:
        tie_counts[abs(d)] += 1
    t_sum = sum(k**3 - k for k in tie_counts.values())
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - t_sum / 48.0
    )
    row = QUERIES["wilcoxon_signed_rank_weekend"](spark, SF).collect()[0]
    assert row["n_pairs"] == len(diffs)
    assert row["w_plus_x2"] == round(w_plus * 2)
    assert row["z_q6"] == round(z * 1e6)


def test_mcnemar_matches_pure_python(spark, events):
    clk, pur = defaultdict(int), defaultdict(int)
    users = set()
    for u, _ts, t, _v in events:
        users.add(u)
        if t == "click":
            clk[u] = 1
        if t == "purchase":
            pur[u] = 1
    b = sum(1 for u in users if clk[u] and not pur[u])
    c = sum(1 for u in users if not clk[u] and pur[u])
    row = QUERIES["mcnemar_click_purchase"](spark, SF).collect()[0]
    assert (row["n_users"], row["b_cnt"], row["c_cnt"]) == (len(users), b, c)
    if b + c > 0:
        chi = (abs(b - c) - 1.0) ** 2 / (b + c)
        assert row["chi2_cc_q6"] == round(chi * 1e6)


def test_runs_test_matches_pure_python(spark, events):
    daily: dict = defaultdict(Decimal)
    for _u, ts, t, v in events:
        if t == "purchase" and v is not None:
            daily[ts.date()] += Decimal(repr(v))
    xs = {d: round(float(v), 6) for d, v in daily.items()}
    vals = sorted(xs.values())
    n = len(vals)
    med = (
        vals[n // 2]
        if n % 2 == 1
        else (vals[n // 2 - 1] + vals[n // 2]) / 2.0
    )
    signs = [int(xs[d] > med) for d in sorted(xs) if xs[d] != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = float(sum(signs)), float(len(signs) - sum(signs))
    nn = n1 + n2
    mu = 2 * n1 * n2 / nn + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - nn) / (nn * nn * (nn - 1))
    row = QUERIES["runs_test_daily_value"](spark, SF).collect()[0]
    assert (row["n_days"], row["n_above"], row["n_below"], row["runs"]) == (
        int(nn),
        int(n1),
        int(n2),
        runs,
    )
    assert row["z_q6"] == round((runs - mu) / math.sqrt(var) * 1e6)


def test_cochran_armitage_matches_pure_python(spark, events):
    ni, ri = defaultdict(int), defaultdict(int)
    for _u, ts, t, _v in events:
        ni[ts.hour] += 1
        ri[ts.hour] += int(t == "purchase")
    n = sum(ni.values())
    r = sum(ri.values())
    pbar = r / n
    t_stat = sum(w * ri[w] for w in ni) - pbar * sum(w * ni[w] for w in ni)
    var = (
        pbar
        * (1 - pbar)
        * (sum(w * w * ni[w] for w in ni) - sum(w * ni[w] for w in ni) ** 2 / n)
    )
    row = QUERIES["cochran_armitage_hour_trend"](spark, SF).collect()[0]
    assert (row["n_events"], row["n_purchases"]) == (n, r)
    assert row["z_q6"] == round(t_stat / math.sqrt(var) * 1e6)


def test_markov_stationary_is_fixed_point(spark):
    """pi P == pi (within quantization): checks the semantics via the
    independently-computed transition matrix query."""
    trans = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in QUERIES["event_transition_matrix"](spark, SF).collect()
    }
    types = ["click", "error", "purchase", "signup", "view"]
    row = QUERIES["markov_stationary_event_types"](spark, SF).collect()[0]
    pi = {t: row[f"pi_{t}_q6"] / 1e6 for t in types}
    assert abs(sum(pi.values()) - 1.0) < 1e-4
    row_tot = {a: sum(trans.get((a, b), 0) for b in types) for a in types}
    for b in types:
        nxt = sum(
            pi[a] * trans.get((a, b), 0) / row_tot[a] for a in types if row_tot[a]
        )
        assert abs(nxt - pi[b]) < 5e-4, b


def test_ccf_lag0_is_pearson(spark, events):
    x, y = defaultdict(int), defaultdict(int)
    for _u, ts, t, _v in events:
        if t == "purchase":
            x[ts.date()] += 1
        elif t == "error":
            y[ts.date()] += 1
    days = sorted(set(x) | set(y))
    xs = [x[d] for d in days]
    ys = [y[d] for d in days]
    n = len(days)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    r = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    rows = {
        r_["lag"]: r_ for r_ in QUERIES["ccf_leadlag_purchase_error"](spark, SF).collect()
    }
    assert rows[0]["n_days"] == n
    assert rows[0]["ccf_q6"] == round(r * 1e6)
    assert set(rows) == set(range(-3, 4))


def test_nelson_aalen_monotone_and_bounded(spark):
    rows = sorted(
        QUERIES["nelson_aalen_churn"](spark, SF).collect(), key=lambda r: r["t_hours"]
    )
    assert rows
    prev = 0
    for r in rows:
        step = round(r["churned"] / r["at_risk"] * 1e9)
        assert r["cum_hazard_q9"] >= prev
        assert r["cum_hazard_q9"] >= step
        prev = r["cum_hazard_q9"]


def test_local_clustering_on_planted_graph(spark):
    from weatherdatapipeline_spark.operators.graph import local_clustering

    # K4 on {0,1,2,3} plus a pendant 4-0 and an isolated edge 5-6
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 4), (5, 6)]
    df = spark.createDataFrame(edges, "a LONG, b LONG")
    got = {r.node: (r.deg, r.triangles, r.lcc) for r in local_clustering(df).collect()}
    assert got[1] == (3, 3, 1.0)  # inside K4: all neighbor pairs connected
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (3, 3, 1.0)
    d, t, lcc = got[0]
    assert (d, t) == (4, 3) and abs(lcc - 0.5) < 1e-12  # 3 of C(4,2)=6 closed
    assert got[4] == (1, 0, None)  # pendant: lcc undefined
    assert got[5] == (1, 0, None) and got[6] == (1, 0, None)


def test_friedman_matches_pure_python(spark, events):
    daily: dict = defaultdict(lambda: defaultdict(lambda: [Decimal(0), 0]))
    for _u, ts, t, v in events:
        if v is None:
            continue
        acc = daily[ts.date()][t]
        acc[0] += Decimal(repr(v))
        acc[1] += 1
    rank_sums: dict = defaultdict(float)
    n_days = 0
    tie_sum = 0.0
    for d, by_type in daily.items():
        xs = {t: round(float(s) / c, 6) for t, (s, c) in by_type.items()}
        n_days += 1
        vals = sorted(xs.values())
        for t, x in xs.items():
            below = sum(1 for v2 in vals if v2 < x)
            k = sum(1 for v2 in vals if v2 == x)
            rank_sums[t] += below + (k + 1) / 2.0
        seen = set()
        for x in xs.values():
            if x in seen:
                continue
            seen.add(x)
            k = sum(1 for v2 in xs.values() if v2 == x)
            tie_sum += k**3 - k
    k = len(rank_sums)
    n = float(n_days)
    sr2 = sum(r * r for r in rank_sums.values())
    raw = 12.0 / (n * k * (k + 1)) * sr2 - 3.0 * n * (k + 1)
    chi = raw / (1.0 - tie_sum / (n * k * (k * k - 1)))
    rows = QUERIES["friedman_daily_types"](spark, SF).collect()
    assert len(rows) == k
    for r in rows:
        assert r["n_days"] == n_days and r["n_types"] == k
        assert r["rank_sum_x2"] == round(rank_sums[r["event_type"]] * 2)
        assert r["chi2_q6"] == round(chi * 1e6)


def test_ljung_box_matches_pure_python(spark, events):
    daily: dict = defaultdict(lambda: [Decimal(0), 0])
    for _u, ts, t, v in events:
        if t == "purchase" and v is not None:
            daily[ts.date()][0] += Decimal(repr(v))
            daily[ts.date()][1] += 1
    xq = {
        d: round(round(float(s) / c, 6) * 1e4) for d, (s, c) in daily.items()
    }
    days = sorted(xq)
    xs = [xq[d] for d in days]
    n = len(xs)
    m = sum(xs)
    from datetime import timedelta

    def c_scaled(k):
        pairs = [
            (xq[d], xq[d + timedelta(days=k)])
            for d in days
            if d + timedelta(days=k) in xq
        ]
        sp = sum(a * b for a, b in pairs)
        h = sum(a for a, _ in pairs)
        t_ = sum(b for _, b in pairs)
        return n * n * sp - n * m * (h + t_) + (n - k) * m * m

    c0 = c_scaled(0)
    rhos = [c_scaled(k) / c0 for k in range(1, 6)]
    lb = sum(r * r / (n - k) for k, r in enumerate(rhos, 1)) * n * (n + 2)
    row = QUERIES["ljung_box_daily_value"](spark, SF).collect()[0]
    assert row["n_days"] == n
    for k, r in enumerate(rhos, 1):
        assert row[f"rho{k}_q6"] == round(r * 1e6), k
    assert abs(row["lb_q6"] - round(lb * 1e6)) <= 1


def test_hurst_matches_pure_python(spark, events):
    from weatherdatapipeline_spark.queries import _HURST_LN, _HURST_SIZES

    us = [
        int(ts.timestamp() * 1e6)
        for _u, ts, t, _v in events
        if t == "purchase"
    ]
    h0 = min(us) // 3_600_000_000
    h1 = max(us) // 3_600_000_000
    counts = defaultdict(int)
    for u in us:
        counts[u // 3_600_000_000 - h0] += 1
    xs = [counts[i] for i in range(h1 - h0 + 1)]
    ys = {}
    blocks = {}
    for m in _HURST_SIZES:
        lsum, nb = 0, 0
        for b0 in range(0, len(xs) - m + 1, m):
            blk = xs[b0 : b0 + m]
            s = sum(blk)
            sq = sum(v * v for v in blk)
            pref = 0
            mys = []
            for k, v in enumerate(blk):
                pref += v
                mys.append(m * pref - (k + 1) * s)
            var_scaled = m * sq - s * s
            if var_scaled <= 0:
                continue
            rs = (max(mys) - min(mys)) / math.sqrt(var_scaled)
            if rs > 0:
                lsum += round(math.log(rs) * 1e6)
                nb += 1
        ys[m] = lsum / (nb * 1e6)
        blocks[m] = nb
    lx = [_HURST_LN[m] for m in _HURST_SIZES]
    mx = sum(lx) / 3.0
    denom = sum((v - mx) ** 2 for v in lx)
    slope = sum((_HURST_LN[m] - mx) * ys[m] for m in _HURST_SIZES) / denom
    row = QUERIES["hurst_rescaled_range"](spark, SF).collect()[0]
    assert (row["blocks_32"], row["blocks_64"], row["blocks_128"]) == (
        blocks[32],
        blocks[64],
        blocks[128],
    )
    assert abs(row["hurst_q4"] - round(slope * 1e4)) <= 1


def test_ranking_eval_matches_pure_python(spark, events):
    from datetime import datetime

    cut = datetime(2024, 1, 16)
    tr_pos, tr_n = defaultdict(Decimal), defaultdict(int)
    for _u, ts, t, _v in events:
        if ts < cut:
            tr_n[ts.hour] += 1
            tr_pos[ts.hour] += Decimal(int(t == "purchase"))
    score = {h: round(float(tr_pos[h]) / tr_n[h], 4) for h in tr_n}
    blocks: dict = defaultdict(lambda: [0, 0])
    for _u, ts, t, _v in events:
        if ts >= cut and ts.hour in score:
            blocks[score[ts.hour]][0 if t == "purchase" else 1] += 1
    P = sum(p for p, _n in blocks.values())
    N = sum(n for _p, n in blocks.values())
    auc_num, ap_q9 = 0, 0
    for s in blocks:
        pos, neg = blocks[s]
        tp_before = sum(blocks[s2][0] for s2 in blocks if s2 > s)
        k_before = sum(sum(blocks[s2]) for s2 in blocks if s2 > s)
        neg_below = N - (k_before - tp_before) - neg
        auc_num += pos * (2 * neg_below + neg)
        ap_q9 += round(pos * (tp_before + pos) / (P * (k_before + pos + neg)) * 1e9)
    row = QUERIES["ranking_eval_purchase"](spark, SF).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (P, N)
    assert row["auc_q6"] == round(auc_num / (2.0 * P * N) * 1e6)
    assert row["ap_q6"] == round(ap_q9 / 1e3)
    # sanity: both metrics live in [0, 1]
    assert 0 <= row["auc_q6"] <= 1_000_000
    assert 0 <= row["ap_q6"] <= 1_000_000


def test_lpa_planted_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: min-tie LPA must give
    each clique one community and keep the two communities distinct
    (a single bridge cannot flip a clique's mode vote)."""
    from weatherdatapipeline_spark.queries import (
        _LPA_ROUNDS,
        QUERIES,  # noqa: F811 - explicit reimport for clarity
    )
    from pyspark.sql import functions as F

    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = k1 + k2 + [(3, 10)]
    e = spark.createDataFrame(edges, "a LONG, b LONG")
    bidir = e.select(F.col("a").alias("_src"), F.col("b").alias("_dst")).unionAll(
        e.select(F.col("b").alias("_src"), F.col("a").alias("_dst"))
    )
    labels = bidir.select(F.col("_src").alias("_node")).distinct().select(
        "_node", F.col("_node").alias("_label")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            bidir.join(
                labels.select(F.col("_node").alias("_dst"), "_label"), "_dst"
            )
            .groupBy("_src", "_label")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        labels = (
            votes.groupBy("_src")
            .agg(
                F.max(
                    F.struct(F.col("_cnt").alias("_c"), (-F.col("_label")).alias("_nl"))
                ).alias("_m")
            )
            .select(F.col("_src").alias("_node"), (-F.col("_m._nl")).alias("_label"))
        )
    got = {r._node: r._label for r in labels.collect()}
    c1 = {got[n] for n in range(4)}
    c2 = {got[n] for n in range(10, 14)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
