"""Property-based proof of the identity `isotonic_calibration_bins`
relies on: the MINIMAX formula ŷ_i = min_{v≥i} max_{u≤i} avg(y[u..v])
(Robertson, Wright & Dykstra 1988, Thm 1.4.4) equals the sequential
pool-adjacent-violators fit for ARBITRARY weighted inputs — not just
the one corpus the oracle check exercises. Pure Python on both sides
(no Spark session), so hypothesis can sweep hundreds of cases."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def minimax_fit(ys, ws):
    """The relational form: exact rational arithmetic so the property is
    about the MATH, not float luck."""
    n = len(ys)
    cy = [Fraction(0)] * (n + 1)
    cw = [Fraction(0)] * (n + 1)
    for i in range(n):
        cy[i + 1] = cy[i] + ys[i]
        cw[i + 1] = cw[i] + ws[i]

    def avg(u, v):  # inclusive bin range [u, v]
        return Fraction(cy[v + 1] - cy[u], cw[v + 1] - cw[u])

    out = []
    for i in range(n):
        out.append(min(max(avg(u, v) for u in range(i + 1)) for v in range(i, n)))
    return out


def pav_fit(ys, ws):
    pools = [[Fraction(y), Fraction(w)] for y, w in zip(ys, ws)]
    i = 0
    while i < len(pools) - 1:
        if pools[i][0] / pools[i][1] > pools[i + 1][0] / pools[i + 1][1]:
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    out = []
    # expand pool means back to the original positions by weight mass
    ws_frac = [Fraction(w) for w in ws]
    pi, acc = 0, Fraction(0)
    for w in ws_frac:
        out.append(pools[pi][0] / pools[pi][1])
        acc += w
        if acc == pools[pi][1]:
            pi, acc = pi + 1, Fraction(0)
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),   # y (successes)
            st.integers(min_value=1, max_value=50),   # w (weight > 0)
        ),
        min_size=1,
        max_size=12,
    ).filter(lambda rows: all(y <= w for y, w in rows))
)
def test_minimax_equals_pav(rows):
    ys = [y for y, _ in rows]
    ws = [w for _, w in rows]
    mm = minimax_fit(ys, ws)
    pav = pav_fit(ys, ws)
    assert mm == pav
    # and the fit is monotone + mass-preserving (exact rationals)
    assert all(a <= b for a, b in zip(mm, mm[1:]))
    assert sum(m * w for m, w in zip(mm, ws)) == sum(ys)
