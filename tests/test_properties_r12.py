"""Round-12 property checks: the algebraic identities the new operators
(and their DuckDB oracles) rely on, verified against brute-force pure-Python
references on hypothesis-generated inputs. No SparkSession — these pin the
ALGEBRA both engines implement, independent of either (the round-10/11
convention).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=200, deadline=None)


# --- B208: Holt-Winters multiplicative integer-lattice walk -------------------


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark `div` / DuckDB `//`, D7-pinned)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


_HW_S_MIN = 62_500
_HW_S_MAX = 16_000_000


def _sclamp(x: int) -> int:
    return min(_HW_S_MAX, max(_HW_S_MIN, x))


def hw_mul_reference(ys, m=7):
    """Pure-Python rendering of the B208 lattice walk — the ONE recurrence
    both engines execute (operators/timeseries.py `_hw_step`): seasonal
    indices clamp to [1/16x, 16x] ppm, the one-step error accumulates in
    DESEASONED milli-cents, positivity is the caller's guard."""
    if len(ys) < 2 * m or min(ys) <= 0:
        return None
    l = _tdiv(1000 * sum(ys[:m]), m)
    b = _tdiv(1000 * (sum(ys[m : 2 * m]) - sum(ys[:m])), m * m)
    s = [_sclamp(_tdiv(1000 * y * 1_000_000, max(l, 1))) for y in ys[:m]]
    e = 0
    for y in ys[m:]:
        s1 = s[0]
        deseason = _tdiv(1000 * y * 1_000_000, s1)
        lnew = _tdiv(deseason + 3 * (l + b), 4)
        bnew = _tdiv((lnew - l) + 3 * b, 4)
        snew = _sclamp(
            _tdiv(_tdiv(1000 * y * 1_000_000, max(lnew, 1)) + 3 * s1, 4)
        )
        e = e + abs(deseason - (l + b))
        l, b, s = lnew, bnew, s[1:] + [snew]
    return l, b, s, e, len(ys)


def hw_forecast_cents(l: int, b: int, s: list, h: int) -> int:
    """The B208 release formula: (milli div 1000) x (ppm div 1000) div
    1000 — the split that keeps the product in BIGINT range."""
    sf = s[(h - 1) % 7]
    return _tdiv(_tdiv(l + h * b, 1000) * _tdiv(sf, 1000), 1000)


@given(
    ys=st.lists(st.integers(1, 10**7), min_size=14, max_size=80),
)
@_SETTINGS
def test_hw_mul_seasonal_queue_invariants(ys):
    """The rotating seasonal queue keeps exactly m entries, every index
    stays inside the [1/16x, 16x] clamp (the bound that guards both the
    deseason division and the BIGINT product range), and the MAE
    accumulator is monotone non-negative — the structural invariants the
    fold relies on at any positive input."""
    out = hw_mul_reference(ys)
    assert out is not None
    l, b, s, e, n = out
    assert len(s) == 7
    assert all(62_500 <= x <= 16_000_000 for x in s)
    assert e >= 0


@given(
    scale=st.integers(1, 10**6),
    reps=st.integers(2, 8),
)
@_SETTINGS
def test_hw_mul_flat_series_learns_flat_forecast(scale, reps):
    """On a perfectly flat series y_t = c the multiplicative decomposition
    must converge to level ~ 1000c, trend ~ 0, seasonal indices ~ 10^6 —
    so every forecast is within integer-truncation distance of the series
    value itself (the sanity anchor for the lattice arithmetic: ppm scale,
    milli scale and the final double division compose to identity)."""
    ys = [scale] * (7 * reps)
    l, b, s, e, n = hw_mul_reference(ys)
    assert b == 0
    assert abs(l - 1000 * scale) <= 4 * 7 * reps  # per-step <=4 truncation
    for h in range(1, 15):
        forecast = hw_forecast_cents(l, b, s, h)
        # the (div 1000)^2 release split truncates at per-mille grain
        assert abs(forecast - scale) <= max(3, scale // 500)


def test_hw_mul_weekly_pattern_recovered():
    """A strict ×2 Friday spike on an otherwise flat series: after 20
    seasons the Friday seasonal index must sit near 2e6/1.14 relative to
    the other days — i.e. the index for the spiked slot is at least 1.7x
    any other slot, and forecasts for the spiked slot exceed the flat
    slots. Deterministic, no hypothesis."""
    base = 1_000_00  # cents
    ys = []
    for week in range(20):
        for dow in range(7):
            ys.append(base * 2 if dow == 4 else base)
    l, b, s, e, n = hw_mul_reference(ys)
    # queue order: s[0] is the season for t = n+1, i.e. dow (n % 7) = 0
    spiked = s[4]
    others = [x for i, x in enumerate(s) if i != 4]
    assert spiked > 1.7 * max(others)
    f_spike = hw_forecast_cents(l, b, s, 5)
    f_flat = hw_forecast_cents(l, b, s, 4)
    assert f_spike > 1.5 * f_flat


# --- B209: Croston intermittent-demand lattice walk ----------------------------


def croston_reference(events):
    """Pure-Python rendering of the B209 walk: events = [(day, cents)]
    sorted, >= 2 entries; returns (z_milli, p_milli)."""
    z = 1000 * events[0][1]
    p = -1
    prev_d = events[0][0]
    for d, y in events[1:]:
        q = d - prev_d
        z = _tdiv(1000 * y + 3 * z, 4)
        p = 1000 * q if p < 0 else _tdiv(1000 * q + 3 * p, 4)
        prev_d = d
    return z, p


@given(
    c=st.integers(1, 10**9),
    k=st.integers(1, 400),
    n=st.integers(2, 60),
)
@_SETTINGS
def test_croston_regular_demand_converges_to_rate(c, k, n):
    """Perfectly regular demand (value c every k days) must converge to
    z ~ 1000c, p == 1000k exactly (every interval equals the init copy,
    an EWMA fixed point), so the forecast rate is c/k within per-step
    truncation."""
    events = [(i * k, c) for i in range(n)]
    z, p = croston_reference(events)
    assert p == 1000 * k
    assert abs(z - 1000 * c) <= 4 * n
    rate = _tdiv(1000 * z, p)
    assert abs(rate - _tdiv(1000 * c, k)) <= _tdiv(4 * n * 1000, 1000 * k) + 4


@given(
    days=st.lists(st.integers(1, 100), min_size=2, max_size=40),
    vals=st.lists(st.integers(1, 10**6), min_size=40, max_size=40),
)
@_SETTINGS
def test_croston_init_by_copy_is_t2_ewma_fixed_point(days, vals):
    """The sentinel init (p copies the first interval) must equal running
    the EWMA update at t=2 with p0 = 1000*q2 — the algebraic identity the
    Spark fold and the DuckDB recursive base rely on to coincide."""
    d = [0]
    for step in days:
        d.append(d[-1] + step)
    events = list(zip(d, vals[: len(d)]))
    z_a, p_a = croston_reference(events)
    # explicit t=2-EWMA variant
    z = 1000 * events[0][1]
    q2 = events[1][0] - events[0][0]
    p = 1000 * q2
    prev_d = events[0][0]
    for dd, y in events[1:]:
        q = dd - prev_d
        z = _tdiv(1000 * y + 3 * z, 4)
        p = _tdiv(1000 * q + 3 * p, 4)
        prev_d = dd
    assert (z_a, p_a) == (z, p)
