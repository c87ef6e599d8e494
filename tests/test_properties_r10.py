"""Round-10 property checks: the algebraic identities the new operators
(and their DuckDB oracles) rely on, verified against brute-force pure-Python
references on hypothesis-generated inputs. No SparkSession — these pin the
ALGEBRA both engines implement, independent of either.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=200, deadline=None)


# --- B174: log-rank at-risk via cumulative-m == direct count -----------------


@given(
    users=st.lists(
        st.tuples(
            st.integers(0, 1),  # grp
            st.integers(0, 12),  # dur
            st.integers(0, 1),  # observed event at dur
        ),
        min_size=1,
        max_size=60,
    )
)
@_SETTINGS
def test_logrank_at_risk_identity_and_chi2_sign(users):
    durs = sorted({d for _, d, _ in users})
    o0 = e0 = v = 0.0
    for d in durs:
        n0 = sum(1 for g, du, _ in users if g == 0 and du >= d)
        n1 = sum(1 for g, du, _ in users if g == 1 and du >= d)
        d0 = sum(1 for g, du, ob in users if g == 0 and du == d and ob)
        d1 = sum(1 for g, du, ob in users if g == 1 and du == d and ob)
        # the operator's cumulative form: n_g - (cum_m_g - m_g)
        cum0 = sum(1 for g, du, _ in users if g == 0 and du <= d)
        m0 = sum(1 for g, du, _ in users if g == 0 and du == d)
        tot0 = sum(1 for g, _, _ in users if g == 0)
        assert tot0 - (cum0 - m0) == n0
        dt, n = d0 + d1, n0 + n1
        if dt == 0 or n == 0:
            continue
        o0 += d0
        e0 += dt * n0 / n
        if n > 1:
            v += dt * n0 * n1 * (n - dt) / (n * n * (n - 1))
    if v > 0:
        chi2 = (o0 - e0) * (o0 - e0) / v
        assert chi2 >= 0.0


# --- B175: denominator-cleared LTTB area comparator --------------------------


@given(
    left=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 1000)),
        min_size=1,
        max_size=6,
    ),
    right=st.lists(
        st.tuples(st.integers(60, 120), st.integers(0, 1000)),
        min_size=1,
        max_size=6,
    ),
    mid=st.lists(
        st.tuples(st.integers(51, 59), st.integers(0, 1000)),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
)
@_SETTINGS
def test_lttb_cleared_area_picks_true_max_area_point(left, right, mid):
    cl, cr = len(left), len(right)
    sxl = sum(x for x, _ in left)
    syl = sum(y for _, y in left)
    sxr = sum(x for x, _ in right)
    syr = sum(y for _, y in right)
    # exact rational mean anchors
    xl, yl = Fraction(sxl, cl), Fraction(syl, cl)
    xr, yr = Fraction(sxr, cr), Fraction(syr, cr)

    def true_area2(p):
        x, y = p
        return abs((xl - xr) * (y - yl) - (xl - x) * (yr - yl))

    def cleared(p):
        x, y = p
        return abs(
            (sxl * cr - sxr * cl) * (y * cl - syl)
            - (sxl - x * cl) * (syr * cl - syl * cr)
        )

    # same argmax under the deterministic (area desc, x asc) tiebreak
    pick_true = max(mid, key=lambda p: (true_area2(p), -p[0]))
    pick_cleared = max(mid, key=lambda p: (cleared(p), -p[0]))
    assert pick_true == pick_cleared
    # and the cleared value is exactly cl^2*cr times the true area
    for p in mid:
        assert cleared(p) == true_area2(p) * cl * cl * cr


# --- B176: rank-select median == sort median ---------------------------------


@given(
    xs=st.lists(
        st.integers(-10_000, 10_000), min_size=1, max_size=101
    )
)
@_SETTINGS
def test_rank_select_median_identity(xs):
    n = len(xs)
    s = sorted(xs)
    lo = (n + 1) // 2  # 1-based
    hi = n // 2 + 1
    sel = [s[lo - 1], s[hi - 1]]
    rank_med = (min(sel) + max(sel)) / 2
    import statistics

    assert rank_med == statistics.median(xs)


# --- B179: scaled BIGINT deviation walk == classic R/S range -----------------


@given(
    ys=st.lists(st.integers(0, 10_000), min_size=2, max_size=32)
)
@_SETTINGS
def test_hurst_scaled_walk_identity(ys):
    m = len(ys)
    sum_y = sum(ys)
    # classic cumulative deviation walk (rational)
    mu = Fraction(sum_y, m)
    z_classic = []
    acc = Fraction(0)
    for y in ys:
        acc += y - mu
        z_classic.append(acc)
    r_classic = max(z_classic) - min(z_classic)
    # operator's all-integer walk, scaled by m
    zi = []
    acci = 0
    for y in ys:
        acci += m * y - sum_y
        zi.append(acci)
    r_int = max(zi) - min(zi)
    assert Fraction(r_int, m) == r_classic


# --- B177: pooled z-test sign and degenerate guard ---------------------------


@given(
    n0=st.integers(1, 500),
    n1=st.integers(1, 500),
    data=st.data(),
)
@_SETTINGS
def test_proportion_ztest_sign_and_guard(n0, n1, data):
    c0 = data.draw(st.integers(0, n0))
    c1 = data.draw(st.integers(0, n1))
    import math

    p = (c0 + c1) / (n0 + n1)
    var = p * (1.0 - p) * (1.0 / n0 + 1.0 / n1)
    se = math.sqrt(var)
    if se == 0.0:
        # degenerate: all converted or none — the operator releases NULL
        assert c0 + c1 in (0, n0 + n1)
        return
    z = (c0 / n0 - c1 / n1) / se
    # sign agrees with the rate difference
    diff = c0 / n0 - c1 / n1
    assert (z > 0) == (diff > 0) and (z < 0) == (diff < 0)
