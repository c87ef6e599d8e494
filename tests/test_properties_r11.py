"""Round-11 property checks: the algebraic identities the new operators
(and their DuckDB oracles) rely on, verified against brute-force pure-Python
references on hypothesis-generated inputs. No SparkSession — these pin the
ALGEBRA both engines implement, independent of either (the round-10
convention, tests/test_properties_r10.py).
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=200, deadline=None)


# --- B190: seasonal recentering identity --------------------------------------


@given(
    series=st.lists(st.integers(-10**6, 10**6), min_size=7, max_size=60)
)
@_SETTINGS
def test_seasonal_recentered_index_sums_to_zero(series):
    """Σ_dow nd·(mean_detr_dow − grand_mean) == 0 exactly: recentering
    against the overall detrended mean makes the weighted seasonal
    indexes a zero-sum decomposition — the property that lets B190's
    forecast column use the grand daily mean as its level term."""
    days = list(range(len(series)))  # contiguous; dow class = d % 7
    detr = {}
    allv = []
    for i in range(3, len(series) - 3):
        d7 = 7 * series[i] - sum(series[i - 3 : i + 4])
        detr.setdefault(days[i] % 7, []).append(d7)
        allv.append(d7)
    if not allv:
        return
    grand = Fraction(sum(allv), 7 * len(allv))
    total = sum(
        len(v) * (Fraction(sum(v), 7 * len(v)) - grand)
        for v in detr.values()
    )
    assert total == 0
    assert sum(len(v) for v in detr.values()) == len(allv)


# --- B191: greedy earliest-occurrence == subsequence containment --------------


@given(
    seq=st.lists(st.integers(0, 3), min_size=0, max_size=25),
    pat=st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(0, 3)),
)
@_SETTINGS
def test_greedy_matching_equals_subsequence_containment(seq, pat):
    """The matching lemma B191 is built on: chaining 'first occurrence
    strictly after the previous match' decides length-3 subsequence
    containment exactly (greedy earliest match is never worse than any
    other embedding)."""
    a, b, c = pat
    # brute force: any i < j < k
    brute = any(
        seq[i] == a and seq[j] == b and seq[k] == c
        for i in range(len(seq))
        for j in range(i + 1, len(seq))
        for k in range(j + 1, len(seq))
    )
    # greedy: first a, first b after it, any c after that
    greedy = False
    try:
        i = seq.index(a)
        j = next(j for j in range(i + 1, len(seq)) if seq[j] == b)
        greedy = any(seq[k] == c for k in range(j + 1, len(seq)))
    except (ValueError, StopIteration):
        greedy = False
    assert greedy == brute


# --- B192: linear-credit conservation ------------------------------------------


@given(k=st.integers(1, 500))
@_SETTINGS
def test_linear_credit_floor_share_bounds(k):
    """k touches each get 1e6 div k micro-credit: the shares of one
    conversion sum to exactly 1e6 − (1e6 mod k) — never more than 1e6,
    never more than k−1 short (the deterministic dropped remainder the
    B192 docstring declares)."""
    share = 1_000_000 // k
    total = share * k
    assert total <= 1_000_000
    assert 1_000_000 - total == 1_000_000 % k < k


# --- B193: growth-accounting flow identity -------------------------------------


@given(
    activity=st.sets(
        st.tuples(st.integers(0, 8), st.integers(0, 14)), max_size=60
    )
)
@_SETTINGS
def test_lifecycle_flow_identity(activity):
    """n_active(d) == n_active(d−1) + new(d) + resurrected(d) − churned(d)
    for every day after the first — the self-auditing identity B193's
    docstring claims, checked against the operator's own classification
    rules (new = first day; retained = active d−1; resurrected = gap;
    churned at d = active d−1 but not d)."""
    if not activity:
        return
    by_user: dict[int, list[int]] = {}
    for u, d in activity:
        by_user.setdefault(u, []).append(d)
    days = sorted({d for _, d in activity})
    max_d = days[-1]
    stats: dict[int, dict[str, int]] = {}

    def stat(d):
        return stats.setdefault(
            d, {"active": 0, "new": 0, "ret": 0, "res": 0, "churn": 0}
        )

    for u, ds in by_user.items():
        ds = sorted(set(ds))
        for i, d in enumerate(ds):
            s = stat(d)
            s["active"] += 1
            if i == 0:
                s["new"] += 1
            elif ds[i - 1] == d - 1:
                s["ret"] += 1
            else:
                s["res"] += 1
            nxt = ds[i + 1] if i + 1 < len(ds) else None
            if (nxt is None and d < max_d) or (nxt is not None and nxt > d + 1):
                stat(d + 1)["churn"] += 1
    for d in sorted(stats):
        s = stats[d]
        prev = stats.get(d - 1, {"active": 0})
        if d == min(stats):
            continue
        assert (
            s["active"] == prev["active"] + s["new"] + s["res"] - s["churn"]
        ), (d, s, prev)
        assert s["active"] == s["new"] + s["ret"] + s["res"]


# --- B194: Bollinger z location invariance --------------------------------------


@given(
    xs=st.lists(st.integers(-10**6, 10**6), min_size=20, max_size=20),
    shift=st.integers(-10**6, 10**6),
)
@_SETTINGS
def test_bollinger_z_is_location_invariant(xs, shift):
    """The exact rational z (before the float cast) is invariant under a
    constant shift of the series and flips sign under negation — the
    properties that make the band an ADAPTIVE envelope (B194's docstring
    argument vs a global cut)."""
    def z_parts(v):
        n = len(v)
        sx = sum(v)
        sxx = sum(a * a for a in v)
        num = Fraction(n * v[-1] - sx, n)
        var = Fraction(n * sxx - sx * sx, n * (n - 1))
        return num, var

    n0, v0 = z_parts(xs)
    n1, v1 = z_parts([a + shift for a in xs])
    assert n0 == n1 and v0 == v1
    n2, v2 = z_parts([-a for a in xs])
    assert n2 == -n0 and v2 == v0


# --- A15: checkpoint rank identity ----------------------------------------------


@given(
    recs=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10**3)),
        min_size=1,
        max_size=80,
    )
)
@_SETTINGS
def test_lag_audit_rank_identity(recs):
    """records_behind == n − rn at the checkpoint row equals the count of
    records strictly after the checkpoint in (ts, event_id) order — with
    duplicate timestamps broken by the unique id, so the identity is
    exact (no second pass needed)."""
    rows = sorted((ts, i) for i, (_, ts) in enumerate(recs))
    n = len(rows)
    rn = max(1, (9 * n) // 10)
    ckpt = rows[rn - 1]
    behind = sum(1 for r in rows if r > ckpt)
    assert behind == n - rn


# --- B195: exact cv-squared class boundary ---------------------------------------


@given(
    qs=st.lists(st.integers(0, 10**4), min_size=2, max_size=24),
    k_num=st.sampled_from([1, 2]),
)
@_SETTINGS
def test_abc_xyz_cv_cross_inequality(qs, k_num):
    """cv < k ⟺ k²·n·(n·Σq² − S²) < (n−1)·S² — the integer form B195
    classifies with, checked against exact rational cv² (k = 1/2 for X,
    1 for Y; S = 0 degenerates to cv undefined, where the inequality is
    correctly false — zero-demand parts are Z)."""
    n = len(qs)
    s = sum(qs)
    qq = sum(q * q for q in qs)
    k = Fraction(k_num, 2)
    # cv < k  ⟺  4·n·(n·Σq² − S²) < k_num²·(n−1)·S²   (k = k_num/2)
    lhs_int = 4 * n * (n * qq - s * s) < (k_num * k_num) * (n - 1) * s * s
    if s == 0:
        assert not lhs_int
        return
    var = Fraction(n * qq - s * s, n * (n - 1))
    mean = Fraction(s, n)
    assert lhs_int == (var < (k * mean) ** 2)


# --- B197: rolling-origin backtest error algebra -------------------------------


@given(series=st.lists(st.integers(1, 10**9), min_size=2, max_size=40))
@_SETTINGS
def test_backtest_error_algebra(series):
    """Pins B197's three constructions on a contiguous daily series:
    naive errors are exactly the first differences, seasonal-naive
    errors are exactly the within-dow-class first differences, and the
    floor-div expanding-mean prediction sits within 1 cent BELOW the
    exact rational mean (the documented convention: both engines use
    the SAME floor value, so the bound is about the convention's
    distance from the textbook method, not about engine agreement)."""
    n = len(series)
    naive = [series[i] - series[i - 1] for i in range(1, n)]
    assert sum(abs(e) for e in naive) == sum(
        abs(series[i] - series[i - 1]) for i in range(1, n)
    )
    snaive = [series[i] - series[i - 7] for i in range(7, n)]
    by_dow = {}
    sn2 = []
    for i, y in enumerate(series):
        cls = by_dow.setdefault(i % 7, [])
        if cls:
            sn2.append(y - cls[-1])
        cls.append(y)
    assert sorted(snaive) == sorted(sn2)
    for i in range(1, n):
        exact = Fraction(sum(series[:i]), i)
        pred = sum(series[:i]) // i
        assert 0 <= exact - pred < 1
        # hence the floored-pred error exceeds the textbook error by <1 cent
        assert 0 <= (series[i] - pred) - (series[i] - exact) < 1


# --- B199: cohort LTV triangle conservation + floor release --------------------


@given(
    orders=st.lists(
        st.tuples(
            st.integers(0, 8),      # customer
            st.integers(0, 11),     # month index
            st.integers(1, 10**7),  # cents
        ),
        min_size=1,
        max_size=60,
    )
)
@_SETTINGS
def test_cohort_ltv_triangle_algebra(orders):
    """Pins B199's construction: (a) the triangle cells conserve total
    revenue, (b) each cohort's final cumulative equals the cohort's
    total, (c) the floor LTV release satisfies
    0 <= cum - size*ltv < size (the exact-integer convention that
    replaced the measured .575-halfway round(2) release)."""
    first = {}
    for c, m, _ in orders:
        first[c] = min(first.get(c, m), m)
    sizes = {}
    for c, m0 in first.items():
        sizes[m0] = sizes.get(m0, 0) + 1
    cells = {}
    for c, m, cents in orders:
        key = (first[c], m - first[c])
        cells[key] = cells.get(key, 0) + cents
    assert sum(cells.values()) == sum(c for _, _, c in orders)
    for m0 in sizes:
        ages = sorted(a for (g, a) in cells if g == m0)
        cum = 0
        for a in ages:
            cum += cells[(m0, a)]
            ltv = cum // sizes[m0]
            assert 0 <= cum - sizes[m0] * ltv < sizes[m0]
        assert cum == sum(v for (g, _), v in cells.items() if g == m0)


# --- B198: zero-filled variance from observed rows alone ------------------------


@given(
    obs=st.lists(st.integers(0, 10**6), min_size=1, max_size=30),
    n_zero=st.integers(0, 30),
)
@_SETTINGS
def test_safety_stock_zero_week_variance_identity(obs, n_zero):
    """var over the FULL zero-filled series == (span·Q − S²)/(span·(span−1))
    computed from observed rows alone — the identity that lets B198 skip
    materializing the |parts|×|weeks| grid (zero weeks add 0 to both S
    and Q but still count in span)."""
    span = len(obs) + n_zero
    if span < 2:
        return
    full = obs + [0] * n_zero
    s, qq = sum(obs), sum(q * q for q in obs)
    mean = Fraction(s, span)
    brute = sum((Fraction(x) - mean) ** 2 for x in full) / (span - 1)
    assert brute == Fraction(span * qq - s * s, span * (span - 1))


# --- B200: price-volume bridge identity -----------------------------------------


@given(
    r0=st.integers(1, 10**10),
    r1=st.integers(1, 10**10),
    q0=st.integers(1, 10**6),
    q1=st.integers(1, 10**6),
)
@_SETTINGS
def test_pvm_bridge_identity(r0, r1, q0, q1):
    """price + volume == delta exactly in rationals under the standard
    anchors, and the truncated integer releases are each within 1 cent
    of their rational value (so their sum is within 2 of delta) — the
    exact-release convention B200 ships."""
    price = Fraction(r1) - Fraction(q1 * r0, q0)
    volume = Fraction((q1 - q0) * r0, q0)
    assert price + volume == r1 - r0

    def trunc_div(a, b):
        q, r = divmod(a, b)
        return q + 1 if q < 0 and r else q  # toward zero, like div / //

    pe = trunc_div(r1 * q0 - q1 * r0, q0)
    ve = trunc_div((q1 - q0) * r0, q0)
    assert abs(Fraction(pe) - price) < 1
    assert abs(Fraction(ve) - volume) < 1
    assert abs((pe + ve) - (r1 - r0)) <= 2


# --- B201: OLS slope invariances --------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(-10**6, 10**6), st.integers(-10**6, 10**6)),
        min_size=3,
        max_size=30,
    ),
    cx=st.integers(-10**6, 10**6),
    cy=st.integers(-10**6, 10**6),
)
@_SETTINGS
def test_elasticity_slope_shift_invariance(pts, cx, cy):
    """The exact rational OLS slope is invariant under constant shifts of
    either regressor — the property that makes B201's re-center escape
    hatch (docstring overflow note) a pure no-op on the statistic."""
    def slope(ps):
        n = len(ps)
        sx = sum(x for x, _ in ps)
        sy = sum(y for _, y in ps)
        sxy = sum(x * y for x, y in ps)
        sxx = sum(x * x for x, _ in ps)
        den = n * sxx - sx * sx
        if den == 0:
            return None
        return Fraction(n * sxy - sx * sy, den)

    s0 = slope(pts)
    s1 = slope([(x + cx, y + cy) for x, y in pts])
    assert s0 == s1


# --- B202: Little's law conservation identity ------------------------------------


@given(
    spans=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 30)),
        min_size=1,
        max_size=50,
    )
)
@_SETTINGS
def test_littles_law_conservation(spans):
    """Σ_days open(d) == Σ_intervals (e − s + 1) exactly (inclusive-day
    convention), via the +1/−1 net-change walk B202 computes it with —
    so the whole-horizon lw_over_l ratio is exactly 1 and monthly
    deviations are pure boundary effects."""
    iv = [(s, s + d) for s, d in spans]
    net = {}
    for s, e in iv:
        net[s] = net.get(s, 0) + 1
        net[e + 1] = net.get(e + 1, 0) - 1
    days = sorted(net)
    area = 0
    open_now = 0
    for i, d in enumerate(days):
        open_now += net[d]
        run = (days[i + 1] if i + 1 < len(days) else d + 1) - d
        area += open_now * run
    assert area == sum(e - s + 1 for s, e in iv)


# --- C170: zero-expansion pairwise-distance identity ------------------------------


@given(
    vecs=st.lists(
        st.lists(st.integers(-64, 64), min_size=3, max_size=3),
        min_size=2,
        max_size=12,
    )
)
@_SETTINGS
def test_pairwise_distance_zero_expansion_identity(vecs):
    """Σ over unordered pairs of ‖x−y‖² == n·Σ‖x‖² − ‖Σx‖² exactly — the
    identity that lets C170 (and B198 in scalar form) audit dispersion
    without materializing a single pair."""
    n = len(vecs)
    brute = sum(
        sum((a - b) ** 2 for a, b in zip(vecs[i], vecs[j]))
        for i in range(n)
        for j in range(i + 1, n)
    )
    sumsq = sum(sum(x * x for x in v) for v in vecs)
    dim_sums = [sum(v[d] for v in vecs) for d in range(3)]
    norm2 = sum(s * s for s in dim_sums)
    assert brute == n * sumsq - norm2


# --- B203: Holt integer fold — linear series are exact fixed points ---------------


def _holt_step(l, b, y_milli):
    def tdiv(a, d):
        q, r = divmod(a, d)
        return q + 1 if q < 0 and r else q  # truncate toward zero

    l2 = tdiv(y_milli + 3 * (l + b), 4)
    b2 = tdiv(l2 - l + 3 * b, 4)
    return l2, b2


@given(a=st.integers(-10**6, 10**6), c=st.integers(-10**4, 10**4),
       n=st.integers(3, 40))
@_SETTINGS
def test_holt_linear_series_is_exact_fixed_point(a, c, n):
    """On y_t = a + c·t the milli-cent Holt fold never truncates:
    l_t = 1000·y_t and b_t = 1000·c exactly at every step, so the h-step
    forecast l + h·b is exact — the property that makes B203's integer
    lattice a faithful Holt, not an approximation with drift."""
    ys = [a + c * t for t in range(1, n + 1)]
    l, b = 1000 * ys[0], 1000 * (ys[1] - ys[0])
    for y in ys[1:]:
        assert 1000 * y - (l + b) == 0  # one-step forecast is exact too
        l, b = _holt_step(l, b, 1000 * y)
        assert l == 1000 * y and b == 1000 * c


# --- B205: CUPED preserves the pooled mean ---------------------------------------


@given(
    users=st.lists(
        st.tuples(
            st.booleans(),              # arm
            st.integers(0, 10**6),      # pre metric x
            st.integers(0, 10**6),      # post metric y
        ),
        min_size=4,
        max_size=40,
    ),
)
@_SETTINGS
def test_cuped_adjustment_preserves_pooled_mean(users):
    """Σ_arms n_a·(ȳ_a − θ·(x̄_a − x̄)) == Σ_arms n_a·ȳ_a exactly (the
    weighted arm deviations from the pooled covariate mean cancel), so
    CUPED shifts variance between arms but never the experiment's
    overall level — the unbiasedness identity B205's adjusted column
    relies on, exact in rationals for ANY θ."""
    arms = {}
    for a, x, y in users:
        arms.setdefault(a, []).append((x, y))
    if len(arms) < 2:
        return
    n = len(users)
    xbar = Fraction(sum(x for _, x, _ in users), n)
    theta = Fraction(7, 3)  # arbitrary θ — the identity holds for any
    lhs = 0
    rhs = 0
    for a, rows in arms.items():
        na = len(rows)
        ybar = Fraction(sum(y for _, y in rows), na)
        xbar_a = Fraction(sum(x for x, _ in rows), na)
        lhs += na * (ybar - theta * (xbar_a - xbar))
        rhs += na * ybar
    assert lhs == rhs


# --- A16: Herfindahl bounds against the top share --------------------------------


@given(
    counts=st.lists(st.integers(1, 10**4), min_size=1, max_size=50)
)
@_SETTINGS
def test_hotkey_hhi_bracketed_by_top_share(counts):
    """max_share² ≤ HHI ≤ max_share exactly (Σp² ≤ max·Σp = max, and the
    top term alone gives the lower bound) — the sanity bracket that
    makes A16's two released concentration numbers mutually checkable."""
    tot = sum(counts)
    top = max(counts)
    hhi = Fraction(sum(c * c for c in counts), tot * tot)
    top_share = Fraction(top, tot)
    assert top_share ** 2 <= hhi <= top_share
