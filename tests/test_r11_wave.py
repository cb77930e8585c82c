"""Round-11 wave: semantic assertions for the new analytics queries.
Oracle hash parity is covered by tools/check_oracle.py; these pin the
MATH against pure-Python replays and fixed-point properties the hashes
can't see."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from weatherdatapipeline_spark.queries import QUERIES, _t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from weatherdatapipeline_spark.session import get_spark

    return get_spark("r11-wave-tests")


@pytest.fixture(scope="module")
def events(spark):
    return [
        (r["user_id"], r["ts"], r["event_type"], r["value"])
        for r in _t(spark, SF, "events")
        .select("user_id", "ts", "event_type", "value")
        .collect()
    ]


def _daily_counts(events):
    daily: dict = defaultdict(lambda: defaultdict(int))
    for u, ts, t, v in events:
        daily[t][ts.date()] += 1
    return daily


def test_binseg_matches_pure_python(spark, events):
    got = {
        r["event_type"]: (r["n_days"], r["split_day"], r["gain_q6"])
        for r in QUERIES["binseg_changepoint_by_type"](spark, SF).collect()
    }
    for t, days in _daily_counts(events).items():
        xs = sorted(days.items())
        n = len(xs)
        pn = float(sum(c for _, c in xs))
        best = None
        p = 0.0
        for i, (d, c) in enumerate(xs[:-1], 1):
            p += c
            gain = p * p / i + (pn - p) * (pn - p) / (n - i) - pn * pn / n
            key = (-gain, d)
            if best is None or key < best[0]:
                best = (key, d, gain)
        exp = (n, best[1].isoformat(), round(best[2] * 1e6))
        assert got[t] == exp, (t, got[t], exp)


def test_grubbs_matches_pure_python(spark, events):
    got = {
        r["event_type"]: (r["n_days"], r["peak_day"], r["peak_count"], r["g_q6"])
        for r in QUERIES["grubbs_outlier_daily"](spark, SF).collect()
    }
    for t, days in _daily_counts(events).items():
        xs = sorted(days.items())
        n = len(xs)
        s = sum(c for _, c in xs)
        q = sum(c * c for _, c in xs)
        # integer argmax surrogate |n*x - S|, tie-break day asc
        peak = min(xs, key=lambda dc: (-abs(n * dc[1] - s), dc[0]))
        g = abs(peak[1] - s / n) / math.sqrt((q - s * s / n) / (n - 1.0))
        exp = (n, peak[0].isoformat(), peak[1], round(g * 1e6))
        assert got[t] == exp, (t, got[t], exp)


def test_evalue_matches_pure_python(spark, events):
    row = QUERIES["evalue_sensitivity_purchase"](spark, SF).collect()[0]
    n = [0, 0]
    c = [0, 0]
    for u, ts, t, v in events:
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        n[arm] += 1
        c[arm] += t == "purchase"
    rr = (c[1] / n[1]) / (c[0] / n[0])
    rs = max(rr, 1.0 / rr)
    ev = rs + math.sqrt(rs * (rs - 1.0))
    assert (row["n0"], row["n1"], row["c0"], row["c1"]) == (n[0], n[1], c[0], c[1])
    assert row["rr_q6"] == round(rr * 1e6)
    assert row["evalue_q6"] == round(ev * 1e6)
    assert row["evalue_q6"] >= 1_000_000  # E-value is always >= 1


def test_stickiness_matches_pure_python(spark, events):
    import datetime as dt

    got = {
        r["week"]: (r["n_days"], r["wau"], r["stickiness_q6"])
        for r in QUERIES["stickiness_dau_wau"](spark, SF).collect()
    }
    byweek: dict = defaultdict(lambda: (defaultdict(set), set()))
    for u, ts, t, v in events:
        d = ts.date()
        monday = d - dt.timedelta(days=d.weekday())
        days, users = byweek[monday.isoformat()]
        days[d].add(u)
        users.add(u)
    for wk, (days, users) in byweek.items():
        dau_sum = sum(len(s) for s in days.values())
        exp = (
            len(days),
            len(users),
            round(dau_sum / len(days) / len(users) * 1e6),
        )
        assert got[wk] == exp, (wk, got[wk], exp)
    assert set(got) == set(byweek)
    # stickiness is a ratio of per-day to per-week actives: (0, 1]
    assert all(0 < s <= 1_000_000 for _, _, s in got.values())


def test_herfindahl_matches_pure_python(spark):
    docs = [
        (r["source"], r["n_chars"])
        for r in _t(spark, SF, "documents").select("source", "n_chars").collect()
    ]
    per: dict = defaultdict(lambda: [0, 0])
    for s, m in docs:
        per[s][0] += 1
        per[s][1] += m
    tc = sum(v[0] for v in per.values())
    tm = sum(v[1] for v in per.values())
    hhi_docs = sum(v[0] * v[0] for v in per.values()) / (tc * tc)
    hhi_chars = sum(v[1] * v[1] for v in per.values()) / (tm * tm)
    row = QUERIES["herfindahl_source_concentration"](spark, SF).collect()[0]
    assert row["n_sources"] == len(per)
    assert row["hhi_docs_q6"] == round(hhi_docs * 1e6)
    assert row["hhi_chars_q6"] == round(hhi_chars * 1e6)
    # HHI is bounded by [1/K, 1]
    assert 1e6 / len(per) <= row["hhi_docs_q6"] <= 1e6


def test_assortativity_matches_pure_python(spark):
    from weatherdatapipeline_spark.queries import _cosupply_edges

    edges = [(r["a"], r["b"]) for r in _cosupply_edges(spark, SF).collect()]
    deg: dict = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    stubs = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    n = len(stubs)
    sx = sum(x for x, _ in stubs)
    sxx = sum(x * x for x, _ in stubs)
    sxy = sum(x * y for x, y in stubs)
    r_num = n * sxy - sx * sx
    r_den = n * sxx - sx * sx
    row = QUERIES["degree_assortativity_cosupply"](spark, SF).collect()[0]
    assert row["n_edges"] == len(edges)
    if r_den == 0:
        # degree-regular graph: assortativity undefined -> NULL
        assert row["assortativity_q6"] is None
    else:
        assert row["assortativity_q6"] == round(float(r_num) / float(r_den) * 1e6)
        assert -1_000_000 <= row["assortativity_q6"] <= 1_000_000


def test_rmst_bounds_and_population(spark, events):
    rows = QUERIES["rmst_churn_by_arm"](spark, SF).collect()
    assert {r["arm"] for r in rows} == {0, 1}
    users = {u for u, *_ in events}
    assert sum(r["n_users"] for r in rows) == len(users)
    for r in rows:
        assert r["tau_h"] == 240
        # RMST is an area under a [0,1] curve over [0, tau]
        assert 0 <= r["rmst_q6"] <= 240 * 1_000_000


def test_lang_confusion_totals_and_labels(spark):
    rows = QUERIES["lang_id_confusion"](spark, SF).collect()
    n_docs = _t(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["lang_pred"] for r in rows} <= {"de", "en", "es", "fr", "und"}


def test_perplexity_quintiles_partition_scored_docs(spark):
    rows = QUERIES["perplexity_quintile_mixture"](spark, SF).collect()
    got = {r["bucket"]: r for r in rows}
    assert set(got) == {1, 2, 3, 4, 5}
    # quintiles of a near-continuous score split the corpus near-evenly
    counts = [got[b]["n_docs"] for b in (1, 2, 3, 4, 5)]
    assert max(counts) - min(counts) <= max(3, 0.05 * sum(counts))
    # bucket means are monotone non-decreasing in bucket index
    means = [got[b]["avg_nll"] for b in (1, 2, 3, 4, 5)]
    assert means == sorted(means)


def test_excess_loss_weights_normalize_and_order(spark):
    rows = QUERIES["excess_loss_mixture_weights"](spark, SF).collect()
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) < 1e-4
    n = sum(r["n_docs"] for r in rows)
    # relative upweighting w/p = exp(L - Lbar)/Z is monotone in loss
    ratios = sorted(
        (r["loss"], r["weight"] / (r["n_docs"] / n)) for r in rows
    )
    rs = [x for _, x in ratios]
    assert rs == sorted(rs)


def test_keep_best_quality_beats_min_id(spark):
    from weatherdatapipeline_spark.operators.text import quality_score

    docs = _t(spark, SF, "documents")
    qual = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", quality_score(F.col("text")).alias("q")
        ).collect()
    }
    rows = QUERIES["dedup_keep_best_quality"](spark, SF).collect()
    for r in rows:
        assert r["size"] >= 2
        assert r["kept_quality"] == qual[r["kept_doc"]]
        # the kept doc's quality dominates the min-id doc's
        assert r["kept_quality"] >= qual[r["min_doc"]]
        assert r["differs_from_min_id"] == (r["kept_doc"] != r["min_doc"])


def test_randomized_response_matches_pure_python(spark, events):
    row = QUERIES["randomized_response_estimate"](spark, SF).collect()[0]
    # replay the integer mechanism: flip iff first-8-hex md5(event_id) % 4 == 0
    ev = _t(spark, SF, "events").select("event_id", "event_type").collect()
    n = len(ev)
    n_true = sum(r["event_type"] == "purchase" for r in ev)
    n_rep = 0
    for r in ev:
        t = int(r["event_type"] == "purchase")
        f = int(int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:8], 16) % 4 == 0)
        n_rep += abs(t - f)
    assert (row["n"], row["n_true_yes"], row["n_reported_yes"]) == (n, n_true, n_rep)
    pi_hat = (n_rep / n + 0.75 - 1.0) / 0.5
    assert row["pi_hat_q6"] == round(pi_hat * 1e6)
    # the debiased estimate should land near the true rate (not the noisy one)
    assert abs(row["pi_hat_q6"] - row["true_pi_q6"]) < abs(
        round(n_rep / n * 1e6) - row["true_pi_q6"]
    )


def test_ktruss3_matches_pure_python(spark):
    from weatherdatapipeline_spark.queries import _KTRUSS_ROUNDS, _cosupply_edges

    edges = {(r["a"], r["b"]) for r in _cosupply_edges(spark, SF).collect()}
    cur = set(edges)
    prev_n = None
    for _ in range(_KTRUSS_ROUNDS):
        adj = defaultdict(set)
        for a, b in cur:
            adj[a].add(b)
            adj[b].add(a)
        prev_n = len(cur)
        nxt = {}
        for a, b in cur:
            s = len(adj[a] & adj[b])
            if s >= 1:
                nxt[(a, b)] = s
        cur = set(nxt)
    got = {
        (r["a"], r["b"]): (r["support"], r["converged"])
        for r in QUERIES["ktruss3_cosupply"](spark, SF).collect()
    }
    assert set(got) == cur
    for (a, b), (s, conv) in got.items():
        assert s == nxt[(a, b)]
        assert conv == (len(cur) == prev_n)
    # every surviving edge sits in >= 1 triangle WITHIN the truss: closure
    adj = defaultdict(set)
    for a, b in cur:
        adj[a].add(b)
        adj[b].add(a)
    assert all(len(adj[a] & adj[b]) >= 1 for a, b in cur)


def test_seasonal_strength_matches_pure_python(spark, events):
    got = {
        r["event_type"]: (r["n_days"], r["eta2_q6"])
        for r in QUERIES["seasonal_strength_dow"](spark, SF).collect()
    }
    by_type: dict = defaultdict(lambda: defaultdict(int))
    for u, ts, t, v in events:
        by_type[t][ts.date()] += 1
    for t, days in by_type.items():
        groups: dict = defaultdict(list)
        for d, c in days.items():
            groups[d.weekday()].append(c)
        n = sum(len(g) for g in groups.values())
        s = sum(sum(g) for g in groups.values())
        q = sum(c * c for g in groups.values() for c in g)
        sb6 = sum(round(sum(g) * sum(g) / len(g) * 1e6) for g in groups.values())
        ss_total = q - s * s / n
        ss_between = sb6 / 1e6 - s * s / n
        exp = None if ss_total == 0 else round(ss_between / ss_total * 1e6)
        assert got[t] == (n, exp), (t, got[t], (n, exp))
        if exp is not None:
            assert -1000 <= exp <= 1_001_000  # eta^2 in [0,1] up to quantization


def test_overdispersion_matches_pure_python(spark, events):
    got = {
        r["event_type"]: (r["n_days"], r["dispersion_q6"], r["var_mean_ratio_q6"])
        for r in QUERIES["overdispersion_daily_counts"](spark, SF).collect()
    }
    by_type: dict = defaultdict(lambda: defaultdict(int))
    for u, ts, t, v in events:
        by_type[t][ts.date()] += 1
    for t, days in by_type.items():
        xs = list(days.values())
        n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        d = (n * q - s * s) / s
        vm = (q - s * s / n) / (n - 1.0) / (s / n)
        assert got[t] == (n, round(d * 1e6), round(vm * 1e6)), t
        # dispersion relates to var/mean by D = (n-1) * var/mean
        assert abs(d - (n - 1) * vm) < 1e-6 * max(1.0, d)


def test_entropy_rate_matches_pure_python(spark, events):
    row = QUERIES["entropy_rate_event_chain"](spark, SF).collect()[0]
    types = ["click", "error", "purchase", "signup", "view"]
    idx = {t: i for i, t in enumerate(types)}
    byuser: dict = defaultdict(list)
    for u, ts, t, v in events:
        byuser[u].append((ts, t))
    c = [[0] * 5 for _ in range(5)]
    n_tr = 0
    for u, evs in byuser.items():
        evs.sort()
        for (_, a), (_, b) in zip(evs, evs[1:]):
            c[idx[a]][idx[b]] += 1
            n_tr += 1
    p0 = []
    for i in range(5):
        tot = float(sum(c[i]))
        p0.append([0.2] * 5 if tot == 0 else [c[i][j] / tot for j in range(5)])
    p = [r[:] for r in p0]
    for _ in range(4):
        p = [
            [sum(p[i][m] * p[m][j] for m in range(5)) for j in range(5)]
            for i in range(5)
        ]
    pi = [sum(0.2 * p[i][j] for i in range(5)) for j in range(5)]
    h = -sum(
        pi[i] * sum(p0[i][j] * math.log(p0[i][j]) for j in range(5) if p0[i][j])
        for i in range(5)
    )
    assert row["n_transitions"] == n_tr
    assert abs(row["entropy_rate_q6"] - round(h * 1e6)) <= 1
    # entropy rate of a 5-state chain is bounded by ln 5
    assert 0 <= row["entropy_rate_q6"] <= round(math.log(5) * 1e6)
    assert abs(row["branching_factor_q6"] / 1e6 - math.exp(h)) < 1e-4


def test_max_drawdown_matches_pure_python(spark, events):
    got = {
        r["event_type"]: (r["trough_day"], r["max_drawdown_cents"], r["peak_cents"])
        for r in QUERIES["max_drawdown_daily_revenue"](spark, SF).collect()
    }
    daily: dict = defaultdict(lambda: defaultdict(int))
    for u, ts, t, v in events:
        if v is None:
            continue
        daily[t][ts.date()] += round(v * 100)
    for t, days in daily.items():
        cum, peak = 0, 0
        best = None
        for d, cents in sorted(days.items()):
            cum += cents
            peak = max(peak, cum)
            dd = peak - cum
            key = (-dd, d)
            if best is None or key < best[0]:
                best = (key, d, dd, peak)
        exp = (best[1].isoformat(), best[2], best[3])
        assert got[t] == exp, (t, got[t], exp)
        assert got[t][1] >= 0


def test_hellinger_matches_pure_python(spark, events):
    row = QUERIES["hellinger_weekend_shift"](spark, SF).collect()[0]
    per: dict = defaultdict(lambda: [0, 0])
    for u, ts, t, v in events:
        per[t][ts.weekday() >= 5] += 1
    nw = sum(v[True] for v in per.values())
    nd = sum(v[False] for v in per.values())
    bc9 = sum(
        round(math.sqrt((v[True] / nw) * (v[False] / nd)) * 1e9)
        for v in per.values()
    )
    bc = bc9 / 1e9
    assert (row["n_weekend"], row["n_weekday"]) == (nw, nd)
    assert row["bc_q6"] == round(bc * 1e6)
    assert row["hellinger_q6"] == round(math.sqrt(max(1.0 - bc, 0.0)) * 1e6)
    assert 0 <= row["bc_q6"] <= 1_000_000  # BC is a bounded coefficient


def test_propensity_matched_att_matches_pure_python(spark, events):
    row = QUERIES["propensity_matched_att"](spark, SF).collect()[0]
    per_user: dict = {}
    for u, ts, t, v in events:
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        st = per_user.setdefault(u, [arm, ts, 0])
        st[1] = min(st[1], ts)
        st[2] += t == "purchase"
    cells: dict = defaultdict(lambda: [0, 0, 0, 0])  # n, nt, yc, nc
    for arm, first_ts, y in per_user.values():
        c = cells[first_ts.hour]
        c[0] += 1
        c[1] += arm
        if arm == 0:
            c[2] += y
            c[3] += 1
    p = {h: c[1] / c[0] for h, c in cells.items()}
    match = {}
    for th in cells:
        best = min(
            ((abs(p[th] - p[ch]), ch) for ch, c in cells.items() if c[3] > 0),
        )
        ch = best[1]
        match[th] = (cells[ch][2] / cells[ch][3], best[0] <= 0.05)
    terms, n_matched, n_treated = [], 0, 0
    for arm, first_ts, y in per_user.values():
        if arm != 1:
            continue
        n_treated += 1
        ybar, ok = match[first_ts.hour]
        if ok:
            n_matched += 1
            terms.append(round((y - ybar) * 1e6))
    assert row["n_treated"] == n_treated
    assert (row["n_matched"], row["n_unmatched"]) == (
        n_matched,
        n_treated - n_matched,
    )
    if n_matched:
        assert row["att"] == round(sum(terms) / n_matched / 1e6, 6)
    else:
        assert row["att"] is None


def test_growth_accounting_identities_and_replay(spark, events):
    import datetime as dt

    rows = QUERIES["growth_accounting_weekly"](spark, SF).collect()
    got = {
        r["week"]: (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_resurrected"], r["n_churned_prev"],
        )
        for r in rows
    }
    weeks: dict = defaultdict(set)
    for u, ts, t, v in events:
        d = ts.date()
        weeks[d - dt.timedelta(days=d.weekday())].add(u)
    order = sorted(weeks)
    first_week: dict = {}
    for w in order:
        for u in weeks[w]:
            first_week.setdefault(u, w)
    for i, w in enumerate(order):
        prev = weeks[order[i - 1]] if i and order[i - 1] == w - dt.timedelta(7) else set()
        new = {u for u in weeks[w] if first_week[u] == w}
        retained = weeks[w] & prev
        resurrected = weeks[w] - new - retained
        churned = len(prev - weeks[w])
        exp = (len(weeks[w]), len(new), len(retained), len(resurrected), churned)
        assert got[w.isoformat()] == exp, (w, got[w.isoformat()], exp)
        # the ledger identities
        assert exp[1] + exp[2] + exp[3] == exp[0]
        assert exp[2] + exp[4] == len(prev)
    assert set(got) == {w.isoformat() for w in order}
