"""Round-13 wave: semantic assertions for the new analytics queries.
Oracle hash parity is covered by tools/check_oracle.py; these pin the
MATH against pure-Python / numpy replays and brute-force recomputations
the hashes can't see (e.g. the Pettitt midrank identity vs the O(n^2)
double sum, the Clark-Evans kNN ladder vs brute-force NN)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from weatherdatapipeline_spark.queries import QUERIES, _geo_side, _t

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from weatherdatapipeline_spark.session import get_spark

    return get_spark("r13-wave-tests")


@pytest.fixture(scope="module")
def events(spark):
    return [
        (r["user_id"], r["ts"], r["event_type"], r["value"])
        for r in _t(spark, SF, "events")
        .select("user_id", "ts", "event_type", "value")
        .collect()
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return [
        (r["source"], r["text"])
        for r in _t(spark, SF, "documents").select("source", "text").collect()
    ]


def _is_weekend(ts) -> bool:
    return ts.weekday() >= 5  # Sat=5 Sun=6 == Spark dayofweek in (1, 7)


def test_cochrans_q_matches_incidence_replay(spark, events):
    # subjects are (user, active-day) blocks — non-degenerate on this
    # corpus (per-user LIFETIME incidence is complete: every user hits
    # every type, denominator 0; the user-day framing is the real test)
    row = QUERIES["cochrans_q_event_types"](spark, SF).collect()[0]
    inc = defaultdict(set)
    for u, ts, t, _ in events:
        inc[(u, ts.date())].add(t)
    k = len({t for s in inc.values() for t in s})
    c = Counter(t for s in inc.values() for t in s)
    t_tot = sum(c.values())
    sr2 = sum(len(s) ** 2 for s in inc.values())
    assert k * t_tot != sr2  # non-degenerate on user-day subjects
    q = (k - 1) * (k * sum(v * v for v in c.values()) - t_tot * t_tot) / (
        k * t_tot - sr2
    )
    assert row["df"] == k - 1
    assert row["n_subjects"] == len(inc)
    assert abs(row["q_stat_q4"] / 1e4 - q) < 1e-3


def test_cliffs_delta_matches_brute_pairs(spark, events):
    row = QUERIES["cliffs_delta_weekend"](spark, SF).collect()[0]
    wk = sorted(v for _, ts, _, v in events if _is_weekend(ts))
    wd = sorted(v for _, ts, _, v in events if not _is_weekend(ts))
    import bisect

    gt = sum(bisect.bisect_left(wd, v) for v in wk)
    lt = sum(len(wd) - bisect.bisect_right(wd, v) for v in wk)
    delta = (gt - lt) / (len(wk) * len(wd))
    assert row["n_weekend"] == len(wk)
    assert row["n_weekday"] == len(wd)
    assert abs(row["delta_q6"] / 1e6 - delta) < 1e-5


def test_brunner_munzel_matches_placement_replay(spark, events):
    row = QUERIES["brunner_munzel_weekend"](spark, SF).collect()[0]
    wk = [v for _, ts, _, v in events if _is_weekend(ts)]
    wd = [v for _, ts, _, v in events if not _is_weekend(ts)]

    def midranks(vals, universe_sorted):
        # midrank of v within universe (1-based)
        import bisect

        return [
            (
                bisect.bisect_left(universe_sorted, v)
                + bisect.bisect_right(universe_sorted, v)
                + 1
            )
            / 2
            for v in vals
        ]

    comb = sorted(wk + wd)
    rkw = midranks(wk, comb)
    rkd = midranks(wd, comb)
    rww = midranks(wk, sorted(wk))
    rdd = midranks(wd, sorted(wd))
    nw, nd = len(wk), len(wd)
    pw = [a - b for a, b in zip(rkw, rww)]
    pd_ = [a - b for a, b in zip(rkd, rdd)]
    pbw, pbd = sum(pw) / nw, sum(pd_) / nd
    sw2 = sum((p - pbw) ** 2 for p in pw) / (nw - 1)
    sd2 = sum((p - pbd) ** 2 for p in pd_) / (nd - 1)
    rbw, rbd = sum(rkw) / nw, sum(rkd) / nd
    w = nd * nw * (rbw - rbd) / (nd + nw) / math.sqrt(nd * sd2 + nw * sw2)
    assert abs(row["bm_stat_q4"] / 1e4 - w) < 1e-3


def _daily_type_cells(events):
    cells = defaultdict(lambda: [0, 0])  # (type, day) -> [sum_q6, count]
    for _, ts, t, v in events:
        c = cells[(t, ts.date())]
        c[0] += round(v * 1e6)
        c[1] += 1
    return cells


def test_pettitt_matches_brute_double_sum(spark, events):
    out = {
        r["event_type"]: (r["cp_date"], r["k_stat"], r["n_days"])
        for r in QUERIES["pettitt_changepoint_daily"](spark, SF).collect()
    }
    cells = _daily_type_cells(events)
    series = defaultdict(list)
    for (t, d), (s, c) in cells.items():
        series[t].append((d, s, c))
    for t, rows in series.items():
        rows.sort()
        n = len(rows)

        def sgn(i, j):  # sgn(x_j - x_i) via exact cross-multiplication
            _, si, ci = rows[i]
            _, sj, cj = rows[j]
            lhs, rhs = sj * ci, si * cj
            return (lhs > rhs) - (lhs < rhs)

        best_k, best_d = -1, None
        for tt in range(1, n + 1):
            u = sum(
                sgn(i, j) for i in range(tt) for j in range(tt, n)
            )
            if abs(u) > best_k:
                best_k, best_d = abs(u), rows[tt - 1][0]
        cp, k_stat, n_days = out[t]
        assert n_days == n
        assert k_stat == best_k
        # the query reports the EARLIEST argmax day; brute scan keeps
        # the first too (strict > comparison)
        assert cp == best_d.strftime("%Y-%m-%d")


def test_quade_matches_textbook_replay(spark, events):
    row = QUERIES["quade_test_types_daily"](spark, SF).collect()[0]
    cells = _daily_type_cells(events)
    k = len({t for (t, _) in cells})
    by_day = defaultdict(dict)
    for (t, d), (s, c) in cells.items():
        by_day[d][t] = (s, c)
    days = [d for d, m in by_day.items() if len(m) == k]
    # within-day midranks by exact cross-multiplied means
    s4 = {}
    for d in days:
        items = list(by_day[d].items())
        for t, (s, c) in items:
            less = sum(
                1 for _, (s2, c2) in items if s2 * c < s * c2
            )
            eq = sum(1 for _, (s2, c2) in items if s2 * c == s * c2)
            s4[(d, t)] = 2 * less + eq + 1  # 2x midrank
    # block ranks by integer-divided mean range
    rng = {
        d: max((s * 1000) // c for s, c in by_day[d].values())
        - min((s * 1000) // c for s, c in by_day[d].values())
        for d in days
    }
    q2 = {}
    for d in days:
        less = sum(1 for d2 in days if rng[d2] < rng[d])
        eq = sum(1 for d2 in days if rng[d2] == rng[d])
        q2[d] = 2 * less + eq + 1
    s4v = {
        (d, t): q2[d] * (s4[(d, t)] - (k + 1)) for (d, t) in s4 if d in q2
    }
    a16 = sum(v * v for v in s4v.values())
    per_t = defaultdict(int)
    for (d, t), v in s4v.items():
        per_t[t] += v
    b16 = sum(v * v for v in per_t.values())
    n = len(days)
    f = (n - 1) * (b16 / n) / (a16 - b16 / n)
    assert row["n_days"] == n
    assert row["k_types"] == k
    assert abs(row["f_stat_q4"] / 1e4 - f) < 1e-3


def test_bartlett_welch_match_textbook(spark, events):
    groups = defaultdict(list)
    for _, _, t, v in events:
        groups[t].append(round(v * 1e6) / 1e6)
    ns = {t: len(v) for t, v in groups.items()}
    means = {t: sum(v) / len(v) for t, v in groups.items()}
    s2 = {
        t: sum((x - means[t]) ** 2 for x in v) / (len(v) - 1)
        for t, v in groups.items()
    }
    k = len(groups)
    nt = sum(ns.values())
    sp2 = sum((ns[t] - 1) * s2[t] for t in groups) / (nt - k)
    c = 1 + (sum(1 / (ns[t] - 1) for t in groups) - 1 / (nt - k)) / (
        3 * (k - 1)
    )
    chi2 = (
        (nt - k) * math.log(sp2)
        - sum((ns[t] - 1) * math.log(s2[t]) for t in groups)
    ) / c
    row = QUERIES["bartlett_variance_by_type"](spark, SF).collect()[0]
    assert row["k_types"] == k and row["n_total"] == nt
    assert abs(row["chi2_q4"] / 1e4 - chi2) < 0.01

    w = {t: ns[t] / s2[t] for t in groups}
    sw = sum(w.values())
    xt = sum(w[t] * means[t] for t in groups) / sw
    a = sum(w[t] * (means[t] - xt) ** 2 for t in groups) / (k - 1)
    h = sum((1 - w[t] / sw) ** 2 / (ns[t] - 1) for t in groups)
    f = a / (1 + 2 * (k - 2) / (k * k - 1) * h)
    row = QUERIES["welch_anova_by_type"](spark, SF).collect()[0]
    assert abs(row["f_stat_q4"] / 1e4 - f) < 0.01
    assert abs(row["df2_q2"] / 1e2 - (k * k - 1) / (3 * h)) < 0.5


def test_atkinson_matches_replay(spark):
    rows = [
        r["o_totalprice"]
        for r in _t(spark, SF, "orders").select("o_totalprice").collect()
    ]
    n = len(rows)
    mean = sum(round(x * 100) for x in rows) / 100 / n
    a05 = 1 - (sum(math.sqrt(x) for x in rows) / n) ** 2 / mean
    a10 = 1 - math.exp(sum(math.log(x) for x in rows) / n) / mean
    row = QUERIES["atkinson_inequality_orders"](spark, SF).collect()[0]
    assert row["n_orders"] == n
    assert abs(row["atkinson_05_q6"] / 1e6 - a05) < 1e-4
    assert abs(row["atkinson_10_q6"] / 1e6 - a10) < 1e-4
    # bounds: 0 <= A_0.5 <= A_1 < 1 (more aversion, more inequality felt)
    assert 0 <= row["atkinson_05_q6"] <= row["atkinson_10_q6"] < 1e6


def test_rich_club_is_monotone_in_threshold_filtering(spark):
    rows = QUERIES["rich_club_cosupply"](spark, SF).collect()
    byk = {r["k"]: r for r in rows}
    assert set(byk) == {2, 4, 8, 16}
    # node and edge counts can only shrink as the threshold rises
    for lo, hi in [(2, 4), (4, 8), (8, 16)]:
        assert byk[lo]["n_nodes"] >= byk[hi]["n_nodes"]
        assert byk[lo]["n_edges"] >= byk[hi]["n_edges"]
    # density bounded by 1
    for r in rows:
        if r["phi_q6"] is not None:
            assert 0 <= r["phi_q6"] <= 1_000_000


def test_yules_k_and_burstiness_match_replays(spark, docs):
    toks = defaultdict(list)
    for src, text in docs:
        toks[src].extend(w for w in text.strip().lower().split() if w)
    out = {r["source"]: r for r in QUERIES["yules_k_by_source"](spark, SF).collect()}
    for src, words in toks.items():
        c = Counter(words)
        n = len(words)
        s2 = sum(m * m for m in c.values())
        k = 1e4 * (s2 - n) / (n * n)
        assert out[src]["n_tokens"] == n
        assert out[src]["n_types"] == len(c)
        assert abs(out[src]["yules_k_q4"] / 1e4 - k) < 1e-3

    # burstiness: replay one term end-to-end
    rows = QUERIES["term_burstiness_top20"](spark, SF).collect()
    percol = defaultdict(Counter)
    ndocs = len(docs)
    for di, (_, text) in enumerate(docs):
        for w in text.strip().lower().split():
            if w:
                percol[w][di] += 1
    for r in rows[:3]:
        cnts = percol[r["term"]]
        tot = sum(cnts.values())
        mean = tot / ndocs
        var = (sum(v * v for v in cnts.values()) - tot * tot / ndocs) / (
            ndocs - 1
        )
        assert r["total_count"] == tot
        assert abs(r["vmr_q6"] / 1e6 - var / mean) < 1e-4


def _geo_xy(pid: int, side: int) -> tuple[int, int]:
    def h(tag):
        return (
            int(hashlib.md5(f"{tag}{pid}".encode()).hexdigest()[:12], 16)
            % side
        )

    return h("gx:"), h("gy:")


def test_morans_i_and_getis_match_cell_replay(spark):
    cust = {
        r["c_custkey"]: r["c_acctbal"]
        for r in _t(spark, SF, "customer")
        .select("c_custkey", "c_acctbal")
        .collect()
    }
    side = _geo_side(len(cust))
    cells = defaultdict(lambda: [0, 0])  # (cx,cy) -> [cents, n]
    for pid, bal in cust.items():
        x, y = _geo_xy(pid, side)
        c = cells[(x * 16 // side, y * 16 // side)]
        c[0] += round(bal * 100)
        c[1] += 1
    means = {k: v[0] / 100 / v[1] for k, v in cells.items()}
    ncells = len(means)
    xbar = sum(round(m * 1e6) for m in means.values()) / 1e6 / ncells
    dev = {k: m - xbar for k, m in means.items()}
    num = wpairs = 0
    for (cx, cy), di in dev.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                j = (cx + dx, cy + dy)
                if j in dev:
                    num += round(di * dev[j] * 1e6)
                    wpairs += 1
    den = sum(round(d * d * 1e6) for d in dev.values())
    mi = ncells / wpairs * num / den
    row = QUERIES["morans_i_customer_cells"](spark, SF).collect()[0]
    assert row["n_cells"] == ncells
    assert row["w_pairs"] == wpairs
    assert abs(row["morans_i_q6"] / 1e6 - mi) < 1e-5


def test_clark_evans_matches_bruteforce_nn(spark):
    cust = [
        r["c_custkey"]
        for r in _t(spark, SF, "customer").select("c_custkey").collect()
    ]
    side = _geo_side(len(cust))
    pts = [_geo_xy(pid, side) for pid in cust]
    # brute-force nearest neighbor (spatial-hash to keep the test fast)
    from collections import defaultdict as dd

    cell = side // 40 + 1
    grid = dd(list)
    for x, y in pts:
        grid[(x // cell, y // cell)].append((x, y))
    total6 = 0
    for x, y in pts:
        best = None
        ring = 1
        while best is None or best > ((ring - 1) * cell) ** 2:
            for gx in range(x // cell - ring, x // cell + ring + 1):
                for gy in range(y // cell - ring, y // cell + ring + 1):
                    for (px, py) in grid[(gx, gy)]:
                        if (px, py) == (x, y):
                            continue
                        d2 = (px - x) ** 2 + (py - y) ** 2
                        if best is None or d2 < best:
                            best = d2
            ring += 1
        total6 += round(math.sqrt(best) * 1e6)
    n = len(pts)
    obs = total6 / 1e6 / n
    exp = 0.5 * side / math.sqrt(n)
    row = QUERIES["clark_evans_nn_index"](spark, SF).collect()[0]
    assert row["n_points"] == n
    assert abs(row["mean_nn_q4"] / 1e4 - obs) < 1e-3
    assert abs(row["r_index_q6"] / 1e6 - obs / exp) < 1e-5


def test_granger_matches_numpy_lstsq(spark, events):
    import numpy as np

    daily = defaultdict(lambda: [0, 0])
    for _, ts, t, _ in events:
        d = ts.date()
        if t == "purchase":
            daily[d][0] += 1
        elif t == "error":
            daily[d][1] += 1
    days = sorted(daily)
    samples = [
        (daily[d][0], daily[p][0], daily[p][1])
        for d, p in zip(days[1:], days[:-1])
        if (d - p).days == 1
    ]
    y = np.array([s[0] for s in samples], dtype=float)
    l = np.array([s[1] for s in samples], dtype=float)
    x = np.array([s[2] for s in samples], dtype=float)
    n = len(y)
    xr = np.column_stack([np.ones(n), l])
    xu = np.column_stack([np.ones(n), l, x])
    rss_r = float(np.sum((y - xr @ np.linalg.lstsq(xr, y, rcond=None)[0]) ** 2))
    bu = np.linalg.lstsq(xu, y, rcond=None)[0]
    rss_u = float(np.sum((y - xu @ bu) ** 2))
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    row = QUERIES["granger_lag1_purchase_error"](spark, SF).collect()[0]
    assert row["n_samples"] == n
    assert abs(row["f_stat_q4"] / 1e4 - f) < 1e-2
    assert abs(row["b_error_lag_q6"] / 1e6 - float(bu[2])) < 1e-4


def test_breusch_pagan_matches_numpy(spark, events):
    import numpy as np

    v = np.array([round(val * 1e6) / 1e6 for _, _, _, val in events])
    h = np.array([ts.hour for _, ts, _, _ in events], dtype=float)
    n = len(v)
    xm = np.column_stack([np.ones(n), h])
    beta = np.linalg.lstsq(xm, v, rcond=None)[0]
    e2 = (v - xm @ beta) ** 2
    # the query quantizes squared residuals to 1e-6 before the aux fit
    e2q = np.round(e2 * 1e6) / 1e6
    g = np.linalg.lstsq(xm, e2q, rcond=None)[0]
    ssr = float(np.sum((xm @ g - e2q.mean()) ** 2))
    sst = float(np.sum((e2q - e2q.mean()) ** 2))
    lm = n * ssr / sst
    row = QUERIES["breusch_pagan_value_hour"](spark, SF).collect()[0]
    assert row["n_events"] == n
    assert abs(row["lm_stat_q4"] / 1e4 - lm) < 0.01


def test_dft_finds_planted_weekly_cycle_on_synthetic(spark):
    # construct a pure 7-day cycle; the periodogram must peak at T=7
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    for t in range(140):
        amp = 100 + 50 * math.cos(2 * math.pi * (t % 7) / 7)
        rows.append((t, base + dt.timedelta(days=t), "view", amp))
    df = spark.createDataFrame(
        [(i, ts, et, v) for i, (i2, ts, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    # inline replay of the query math over the synthetic frame
    from weatherdatapipeline_spark.queries import _dft_lut

    daily = defaultdict(int)
    for _, ts, _, v in rows:
        daily[ts.date()] += round(v * 1e6)
    days = sorted(daily)
    vbar = sum(daily[d] for d in days) / 1e6 / len(days)
    lut = {(t, p): (c, s) for t, p, c, s in _dft_lut()}
    best_t, best_amp = None, -1.0
    for t in range(2, 31):
        a = sum(
            round((daily[d] / 1e6 - vbar) * lut[(t, i % t)][0] * 1e6)
            for i, d in enumerate(days)
        )
        b = sum(
            round((daily[d] / 1e6 - vbar) * lut[(t, i % t)][1] * 1e6)
            for i, d in enumerate(days)
        )
        amp = 2 * math.sqrt((a / 1e6) ** 2 + (b / 1e6) ** 2) / len(days)
        if amp > best_amp:
            best_t, best_amp = t, amp
    assert best_t == 7
    assert abs(best_amp - 50) < 1.0  # recovers the planted amplitude


def test_cluster_quality_indices_match_numpy(spark):
    import numpy as np

    from weatherdatapipeline_spark.operators import embeddings as E

    emb = _t(spark, SF, "embeddings")
    out, cent = E.kmeans_lloyd_centroids(spark, emb, k=8, iters=2)
    assign = {
        r["vec_id"]: (r["cluster"], r["sq_dist"]) for r in out.collect()
    }
    cents = np.zeros((8, 64))
    for r in cent.collect():
        cents[r["cluster"]][r["dim"]] = r["val"]
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in _t(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    # Davies-Bouldin replay
    members = defaultdict(list)
    for vid, (cl, sd) in assign.items():
        members[cl].append(math.sqrt(sd))
    sigma = {cl: sum(v) / len(v) for cl, v in members.items()}
    rows = {
        r["cluster"]: r
        for r in QUERIES["davies_bouldin_clusters"](spark, SF).collect()
    }
    for i in sigma:
        rmax = max(
            (sigma[i] + sigma[j])
            / float(np.linalg.norm(cents[i] - cents[j]))
            for j in sigma
            if j != i
        )
        assert abs(rows[i]["r_q6"] / 1e6 - rmax) < 1e-3
        assert abs(rows[i]["sigma_q4"] / 1e4 - sigma[i]) < 1e-3
    # Calinski-Harabasz replay
    n = len(assign)
    k = len(sigma)
    w = sum(sd for _, sd in assign.values())
    gmean = np.mean(np.stack(list(vecs.values())), axis=0)
    b = sum(
        len(members[cl]) * float(np.sum((cents[cl] - gmean) ** 2))
        for cl in sigma
    )
    ch = (b / (k - 1)) / (w / (n - k))
    row = QUERIES["calinski_harabasz_clusters"](spark, SF).collect()[0]
    assert row["n_points"] == n and row["k_clusters"] == k
    assert abs(row["ch_q4"] / 1e4 - ch) / ch < 1e-3


def test_session_bounce_consistent_with_sessionizer(spark):
    bounce = QUERIES["session_bounce_by_hour"](spark, SF).collect()
    sess = QUERIES["sessionize_events_batch"](spark, SF).collect()
    assert sum(r["n_sessions"] for r in bounce) == len(sess)
    assert sum(r["n_bounces"] for r in bounce) == sum(
        1 for s in sess if s["n_events"] == 1
    )
    for r in bounce:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]


def test_bray_curtis_and_burrows_properties(spark, docs):
    bc = QUERIES["bray_curtis_source_pairs"](spark, SF).collect()
    assert all(0 <= r["bc_q6"] <= 1_000_000 for r in bc)
    # identical bags -> 0; replay one pair exactly
    toks = defaultdict(Counter)
    for src, text in docs:
        toks[src].update(w for w in text.strip().lower().split() if w)
    r0 = bc[0]
    a, b = toks[r0["source_a"]], toks[r0["source_b"]]
    smin = sum((a & b).values())
    expect = 1 - 2 * smin / (sum(a.values()) + sum(b.values()))
    assert abs(r0["bc_q6"] / 1e6 - expect) < 1e-5
    bd = QUERIES["burrows_delta_sources"](spark, SF).collect()
    assert len(bd) == len(bc)  # same 190 source pairs
    assert all(r["delta_q6"] >= 0 for r in bd)


def test_theils_u_matches_entropy_replay(spark, events):
    cells = Counter((t, ts.hour) for _, ts, t, _ in events)
    n = sum(cells.values())
    tm = Counter()
    hm = Counter()
    for (t, h), c in cells.items():
        tm[t] += c
        hm[h] += c
    ht = -sum(c / n * math.log(c / n) for c in tm.values())
    hc = -sum(
        c / n * math.log(c / hm[h]) for (t, h), c in cells.items()
    )
    row = QUERIES["theils_u_type_hour"](spark, SF).collect()[0]
    assert row["n_cells"] == len(cells)
    assert abs(row["h_type_q6"] / 1e6 - ht) < 1e-5
    assert abs(row["theils_u_q6"] / 1e6 - (ht - hc) / ht) < 1e-4
    assert 0 <= row["theils_u_q6"] <= 1_000_000


def test_msttr_matches_replay(spark, docs):
    per_src = defaultdict(list)
    for src, text in docs:
        words = [w for w in text.strip().lower().split() if w]
        for i in range(0, len(words) - len(words) % 50, 50):
            seg = words[i : i + 50]
            per_src[src].append(len(set(seg)) / 50)
    out = {r["source"]: r for r in QUERIES["msttr_by_source"](spark, SF).collect()}
    for src, ttrs in per_src.items():
        assert out[src]["n_segments"] == len(ttrs)
        assert abs(out[src]["msttr_q6"] / 1e6 - sum(ttrs) / len(ttrs)) < 1e-5


def test_brand_lift_matches_replay(spark):
    li = [
        (r["l_orderkey"], r["l_partkey"])
        for r in _t(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ]
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in _t(spark, SF, "part").select("p_partkey", "p_brand").collect()
    }
    baskets = defaultdict(set)
    for o, p in li:
        baskets[o].add(brand[p])
    n_orders = len(baskets)
    supp = Counter(b for s in baskets.values() for b in s)
    pair = Counter(
        (a, b)
        for s in baskets.values()
        for a in s
        for b in s
        if a < b
    )
    rows = QUERIES["brand_basket_lift"](spark, SF).collect()
    assert len(rows) == len(pair)
    for r in rows[:5]:
        key = (r["brand_a"], r["brand_b"])
        lift = pair[key] * n_orders / (supp[key[0]] * supp[key[1]])
        assert r["n_both"] == pair[key]
        assert abs(r["lift_q6"] / 1e6 - lift) < 1e-5


def test_spectral_entropy_consistent_with_periodogram(spark):
    amps = {
        r["period_days"]: r["amplitude_q4"]
        for r in QUERIES["dominant_period_dft"](spark, SF).collect()
    }
    row = QUERIES["spectral_entropy_daily"](spark, SF).collect()[0]
    assert row["n_periods"] == 29
    # the entropy query's argmax period must be the amplitude argmax
    best = max(amps, key=lambda t: (amps[t], -t))
    assert row["dominant_period"] == best
    assert 0 <= row["spectral_entropy_q6"] <= 1_000_000


def test_ansari_bradley_matches_rank_replay(spark, events):
    vals = sorted((v, _is_weekend(ts)) for _, ts, _, v in events)
    n = len(vals)
    # midscores over tie blocks of a(r) = min(r, N+1-r)
    scores = []
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        block = [min(r + 1, n - r) for r in range(i, j)]
        mid = sum(block) / len(block)
        scores.extend((mid, wk) for _, wk in vals[i:j])
        i = j
    ab = sum(s for s, wk in scores if wk)
    sa = sum(s for s, _ in scores)
    sa2 = sum(s * s for s, _ in scores)
    nw = sum(1 for _, wk in scores if wk)
    nd = n - nw
    e = nw * sa / n
    var = nw * nd * (n * sa2 - sa * sa) / (n * n * (n - 1))
    z = (ab - e) / math.sqrt(var)
    row = QUERIES["ansari_bradley_weekend"](spark, SF).collect()[0]
    assert row["n_weekend"] == nw and row["n_weekday"] == nd
    assert abs(row["ab_stat_q4"] / 1e4 - ab) < 0.01
    assert abs(row["z_q4"] / 1e4 - z) < 1e-3


def test_hopkins_matches_bruteforce(spark):
    cust = [
        r["c_custkey"]
        for r in _t(spark, SF, "customer").select("c_custkey").collect()
    ]
    side = _geo_side(len(cust))
    pts = [_geo_xy(pid, side) for pid in cust]

    def md(tag, v):
        return int(hashlib.md5(f"{tag}{v}".encode()).hexdigest()[:12], 16) % side

    probes = [(md("hx:", j), md("hy:", j)) for j in range(200)]
    su = sum(
        min((x - px) ** 2 + (y - py) ** 2 for x, y in pts)
        for px, py in probes
    )
    sel = sorted(
        cust, key=lambda p: (hashlib.md5(f"hs:{p}".encode()).hexdigest(), p)
    )[:200]
    selxy = {p: _geo_xy(p, side) for p in sel}
    sw = sum(
        min(
            (x - sx) ** 2 + (y - sy) ** 2
            for q, (x, y) in zip(cust, pts)
            if q != p
        )
        for p, (sx, sy) in selxy.items()
    )
    row = QUERIES["hopkins_statistic_geo"](spark, SF).collect()[0]
    assert row["n_points"] == len(pts)
    assert abs(row["hopkins_q6"] / 1e6 - su / (su + sw)) < 1e-5


def test_ripleys_k_consistent_with_radius_join(spark):
    rows = {r["radius"]: r for r in QUERIES["ripleys_k_customers"](spark, SF).collect()}
    assert set(rows) == {4000, 8000, 16000}
    # pair counts only grow with radius
    assert rows[4000]["n_pairs"] <= rows[8000]["n_pairs"] <= rows[16000]["n_pairs"]
    # the 8000 count must equal the standalone radius-join query's rows
    n8000 = QUERIES["geo_radius_pairs"](spark, SF).count()
    assert rows[8000]["n_pairs"] == n8000


def _daily_series(events):
    daily = defaultdict(int)
    for _, ts, _, v in events:
        daily[ts.date()] += round(v * 1e6)
    days = sorted(daily)
    return days, daily


def test_pacf_matches_durbin_levinson_replay(spark, events):
    days, daily = _daily_series(events)
    n = len(days)
    vbar = sum(daily[d] for d in days) / 1e6 / n
    dv = {d: daily[d] / 1e6 - vbar for d in days}
    import datetime as dt

    c = {0: sum(round(x * x * 1e6) for x in dv.values())}
    for k in range(1, 6):
        c[k] = sum(
            round(dv[d] * dv[d + dt.timedelta(days=k)] * 1e6)
            for d in days
            if d + dt.timedelta(days=k) in dv
        )
    r = {k: c[k] / c[0] for k in range(1, 6)}
    # Durbin-Levinson
    phi = {1: {1: r[1]}}
    for k in range(2, 6):
        prev = phi[k - 1]
        num = r[k] - sum(prev[j] * r[k - j] for j in range(1, k))
        den = 1 - sum(prev[j] * r[j] for j in range(1, k))
        pkk = num / den
        phi[k] = {j: prev[j] - pkk * prev[k - j] for j in range(1, k)}
        phi[k][k] = pkk
    out = {
        r2["lag"]: r2["pacf_q6"]
        for r2 in QUERIES["pacf_daily_value"](spark, SF).collect()
    }
    for k in range(1, 6):
        assert abs(out[k] / 1e6 - phi[k][k]) < 1e-4, k
    # lag-1 PACF IS the lag-1 autocorrelation
    assert abs(out[1] / 1e6 - r[1]) < 1e-5


def test_haar_variance_matches_replay(spark, events):
    days, daily = _daily_series(events)
    d0 = days[0]
    t = {d: (d - d0).days for d in days}
    out = {
        r["scale_days"]: r
        for r in QUERIES["haar_wavelet_variance_daily"](spark, SF).collect()
    }
    for s in (1, 2, 4, 8):
        blocks = defaultdict(lambda: [0, 0])
        for d in days:
            b = blocks[t[d] // s]
            b[0] += daily[d]
            b[1] += 1
        full = {k: v[0] / v[1] / 1e6 for k, v in blocks.items() if v[1] == s}
        sq6 = sum(
            round((full[k + 1] - full[k]) ** 2 * 1e6)
            for k in full
            if k + 1 in full
        )
        npairs = sum(1 for k in full if k + 1 in full)
        assert out[s]["n_pairs"] == npairs
        assert (
            abs(out[s]["haar_var_q4"] / 1e4 - sq6 / 1e6 / 2 / npairs) < 1e-3
        )


def _daily_mq_by_type(events):
    cells = defaultdict(lambda: [0, 0])
    for _, ts, t, v in events:
        c = cells[(t, ts.date())]
        c[0] += round(v * 1e6)
        c[1] += 1
    series = defaultdict(list)
    for (t, d), (s, c) in cells.items():
        series[t].append((d, (s * 1000) // c if s >= 0 else -((-s * 1000) // c)))
    return series


def test_record_highs_matches_replay(spark, events):
    series = _daily_mq_by_type(events)
    out = {
        r["event_type"]: r
        for r in QUERIES["record_highs_by_type"](spark, SF).collect()
    }
    for t, rows in series.items():
        rows.sort()
        best = None
        recs = 0
        for _, mq in rows:
            if best is None or mq > best:
                recs += 1
                best = mq
        n = len(rows)
        h = sum(round(1e12 / i) for i in range(1, n + 1)) / 1e12
        assert out[t]["n_days"] == n
        assert out[t]["n_records"] == recs
        assert abs(out[t]["expected_q4"] / 1e4 - h) < 1e-3


def test_turning_points_matches_replay(spark, events):
    series = _daily_mq_by_type(events)
    out = {
        r["event_type"]: r
        for r in QUERIES["turning_points_by_type"](spark, SF).collect()
    }
    for t, rows in series.items():
        rows.sort()
        mq = [m for _, m in rows]
        turns = sum(
            1
            for i in range(1, len(mq) - 1)
            if (mq[i] > mq[i - 1] and mq[i] > mq[i + 1])
            or (mq[i] < mq[i - 1] and mq[i] < mq[i + 1])
        )
        n = len(mq)
        assert out[t]["n_days"] == n
        assert out[t]["n_turns"] == turns
        z = (turns - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
        assert abs(out[t]["z_q4"] / 1e4 - z) < 1e-3


def test_embedding_anisotropy_matches_bruteforce_pairs(spark):
    import numpy as np

    vecs = [
        np.array(r["embedding"], dtype=float)
        for r in _t(spark, SF, "embeddings").select("embedding").collect()
    ]
    # replicate the quantized unit-vector path, then check the closed
    # form equals the O(n^2) brute-force mean pairwise cosine
    us = []
    for v in vecs:
        n2 = sum(round(x * x * 1e9) for x in v)
        if n2 > 0:
            us.append(v / math.sqrt(n2 / 1e9))
    n = len(us)
    m = np.stack(us)
    gram = m @ m.T
    brute = (gram.sum() - np.trace(gram)) / (n * (n - 1))
    row = QUERIES["embedding_anisotropy_cosine"](spark, SF).collect()[0]
    assert row["n_vectors"] == n
    assert abs(row["mean_cosine_q6"] / 1e6 - brute) < 1e-4


def test_effective_rank_matches_numpy_spectrum(spark):
    import numpy as np

    vecs = np.stack([
        np.array(r["embedding"], dtype=float)
        for r in _t(spark, SF, "embeddings").select("embedding").collect()
    ])
    c = np.cov(vecs.T, bias=True)
    lam = np.linalg.eigvalsh(c)
    pr = lam.sum() ** 2 / (lam ** 2).sum()
    row = QUERIES["embedding_effective_rank"](spark, SF).collect()[0]
    assert abs(row["trace_q6"] / 1e6 - lam.sum()) < 1e-3
    assert abs(row["effective_rank_q4"] / 1e4 - pr) / pr < 1e-3
    assert 1 <= row["effective_rank_q4"] / 1e4 <= vecs.shape[1]


def test_twonn_matches_numpy_neighbors(spark):
    import numpy as np

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in _t(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    ids = sorted(vecs)
    m = np.stack([vecs[i] for i in ids])
    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    sl9 = 0
    used = 0
    for i in range(len(ids)):
        m1 = d2[i].min()
        bigger = d2[i][d2[i] > m1]
        if m1 > 0 and len(bigger):
            m2 = bigger.min()
            sl9 += round(math.log(m2 / m1) / 2 * 1e9)
            used += 1
    row = QUERIES["intrinsic_dim_twonn"](spark, SF).collect()[0]
    assert row["n_used"] == used
    est = used / (sl9 / 1e9)
    assert abs(row["intrinsic_dim_q4"] / 1e4 - est) < 1e-3


def test_lorenz_deciles_properties_and_replay(spark):
    rows = sorted(
        QUERIES["lorenz_curve_deciles"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cust = _t(spark, SF, "customer").count()
    assert sum(r["n_customers"] for r in rows) == cust
    # deciles are revenue-ascending: shares must be non-decreasing
    shares = [r["share_q6"] for r in rows]
    assert shares == sorted(shares)
    assert rows[-1]["cum_share_q6"] == 1_000_000
    # exact replay of the top decile mass
    orders = _t(spark, SF, "orders").groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("r")
    )
    revs = sorted(
        [r["r"] for r in orders.collect()]
        + [0] * (cust - orders.count())
    )
    n = len(revs)
    top = revs[(9 * n) // 10 :]
    assert rows[-1]["n_customers"] == n - (9 * n) // 10
    assert rows[-1]["revenue_cents"] == sum(top)


def _probit(p):
    """Pure-Python Acklam inverse normal — the replay twin of
    queries._norminv_sql (same coefficients, same branch structure)."""
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)

    def horner(cf, q):
        acc = cf[0]
        for k in cf[1:]:
            acc = acc * q + k
        return acc

    if p < 0.02425:
        q = math.sqrt(-2 * math.log(p))
        return horner(c, q) / (horner(d, q) * q + 1)
    if p <= 0.97575:
        q = p - 0.5
        r = q * q
        return horner(a, r) * q / (horner(b, r) * r + 1)
    q = math.sqrt(-2 * math.log(1 - p))
    return -horner(c, q) / (horner(d, q) * q + 1)


def test_shapiro_francia_matches_replay(spark, events):
    norminv = _probit
    cells = defaultdict(lambda: [0, 0])
    for _, ts, t, v in events:
        c = cells[(t, ts.date())]
        c[0] += round(v * 1e6)
        c[1] += 1
    series = defaultdict(list)
    for (t, d), (s, c) in cells.items():
        series[t].append((s, c))
    out = {
        r["event_type"]: r
        for r in QUERIES["shapiro_francia_daily_by_type"](spark, SF).collect()
    }
    for t, sc in series.items():
        n = len(sc)
        xs = []
        for s, c in sc:
            less = sum(1 for s2, c2 in sc if s2 * c < s * c2)
            eq = sum(1 for s2, c2 in sc if s2 * c == s * c2)
            r2 = 2 * less + eq + 1
            m = norminv((r2 / 2.0 - 0.375) / (n + 0.25))
            xs.append((m, s / c / 1e6))
        smx = sum(m * x for m, x in xs)
        sm = sum(m for m, _ in xs)
        sx = sum(x for _, x in xs)
        smm = sum(m * m for m, _ in xs)
        sxx = sum(x * x for _, x in xs)
        num = smx - sm * sx / n
        den = (smm - sm * sm / n) * (sxx - sx * sx / n)
        w = num * num / den
        assert abs(out[t]["w_prime_q6"] / 1e6 - w) < 1e-4
        assert 0 < out[t]["w_prime_q6"] <= 1_000_000


def test_kpss_matches_replay(spark, events):
    cells = defaultdict(lambda: [0, 0])
    for _, ts, t, v in events:
        c = cells[(t, ts.date())]
        c[0] += round(v * 1e6)
        c[1] += 1
    series = defaultdict(list)
    for (t, d), (s, c) in cells.items():
        series[t].append((d, round(s / c)))
    out = {
        r["event_type"]: r
        for r in QUERIES["kpss_level_by_type"](spark, SF).collect()
    }
    for t, rows in series.items():
        rows.sort()
        n = len(rows)
        xbar = sum(x for _, x in rows) / n
        e = [round(x - xbar) for _, x in rows]
        st = []
        acc = 0
        for v in e:
            acc += v
            st.append(acc)
        ss2 = sum(round((s / 1e6) ** 2 * 1e2) for s in st)
        dates = [d for d, _ in rows]
        dset = {d: i for i, d in enumerate(dates)}
        import datetime as dt

        g = {}
        for k in range(0, 5):
            g[k] = sum(
                round((e[i] / 1e6) * (e[dset[d + dt.timedelta(days=k)]] / 1e6) * 1e6)
                for i, d in enumerate(dates)
                if d + dt.timedelta(days=k) in dset
            )
        s2w = round(1.0 * g[0]) + sum(
            round(2 * (1 - k / 5) * g[k]) for k in range(1, 5)
        )
        eta = (ss2 / 1e2 / (n * n)) / (s2w / 1e6 / n)
        assert abs(out[t]["kpss_q6"] / 1e6 - eta) < 1e-4


def test_seasonal_mk_matches_replay(spark, events):
    cells = defaultdict(lambda: [0, 0])
    for _, ts, _, v in events:
        c = cells[(ts.strftime("%Y-%m"), ts.date())]
        c[0] += round(v * 1e6)
        c[1] += 1
    months = defaultdict(list)
    for (m, d), (s, c) in cells.items():
        months[m].append((d, s, c))
    s_stat = 0
    v18 = 0
    for m, rows in months.items():
        rows.sort()
        nm = len(rows)
        for i in range(nm):
            for j in range(i + 1, nm):
                _, si, ci = rows[i]
                _, sj, cj = rows[j]
                s_stat += (sj * ci > si * cj) - (sj * ci < si * cj)
        ties = Counter((s * 1000) // c for _, s, c in rows)
        v18 += nm * (nm - 1) * (2 * nm + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
        )
    row = QUERIES["seasonal_mann_kendall_daily"](spark, SF).collect()[0]
    assert row["s_stat"] == s_stat
    assert row["var_x18"] == v18
    assert row["n_months"] == len(months)


def test_fligner_killeen_matches_replay(spark, events):
    from collections import Counter as C2

    groups = defaultdict(list)
    for _, _, t, v in events:
        groups[t].append(v)
    meds = {}
    for t, vals in groups.items():
        sv = sorted(vals)
        # exact lower median: smallest value whose cumulative count
        # reaches ceil(n/2)
        meds[t] = sv[(len(sv) - 1) // 2]
    devs = []
    for t, vals in groups.items():
        for v in vals:
            devs.append((t, round(abs(v - meds[t]) * 1e6)))
    pooled = sorted(d for _, d in devs)
    import bisect

    # midrank scores via the same Acklam probit the query injects (top
    # ranks push p past 0.97575, so the full branch structure matters)
    nn = len(pooled)
    probit = _probit
    scores = defaultdict(list)
    for t, d in devs:
        lo = bisect.bisect_left(pooled, d)
        hi = bisect.bisect_right(pooled, d)
        r2 = 2 * lo + (hi - lo) + 1  # 2x midrank
        p = 0.5 + r2 / (4.0 * (nn + 1))
        scores[t].append(probit(p))
    allsc = [s for v in scores.values() for s in v]
    abar = sum(allsc) / nn
    v_pool = sum((s - abar) ** 2 for s in allsc) / (nn - 1)
    chi = sum(
        len(v) * (sum(v) / len(v) - abar) ** 2 for v in scores.values()
    ) / v_pool
    row = QUERIES["fligner_killeen_by_type"](spark, SF).collect()[0]
    assert row["k_types"] == len(groups)
    assert row["n_total"] == nn
    assert abs(row["fk_chi2_q4"] / 1e4 - chi) < 0.01


def test_active_days_histogram_totals(spark, events):
    rows = QUERIES["active_days_histogram_monthly"](spark, SF).collect()
    # sum over histogram = distinct (month, user) pairs
    mu = {(ts.strftime("%Y-%m"), u) for u, ts, _, _ in events}
    assert sum(r["n_users"] for r in rows) == len(mu)
    # weighted sum = distinct (month, user, day) triples
    mud = {(ts.strftime("%Y-%m"), u, ts.date()) for u, ts, _, _ in events}
    assert sum(r["active_days"] * r["n_users"] for r in rows) == len(mud)
