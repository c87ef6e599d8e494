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


def hw_mul_reference(ys, m=7):
    """Pure-Python rendering of the B208 lattice walk — the ONE recurrence
    both engines execute (operators/timeseries.py `_hw_step`)."""
    if len(ys) < 2 * m:
        return None
    l = _tdiv(1000 * sum(ys[:m]), m)
    b = _tdiv(1000 * (sum(ys[m : 2 * m]) - sum(ys[:m])), m * m)
    s = [max(1, _tdiv(1000 * y * 1_000_000, max(l, 1))) for y in ys[:m]]
    e = 0
    for y in ys[m:]:
        s1 = s[0]
        deseason = _tdiv(1000 * y * 1_000_000, max(s1, 1))
        lnew = _tdiv(deseason + 3 * (l + b), 4)
        bnew = _tdiv((lnew - l) + 3 * b, 4)
        snew = max(
            1, _tdiv(_tdiv(1000 * y * 1_000_000, max(lnew, 1)) + 3 * s1, 4)
        )
        e = e + abs(1000 * y - _tdiv((l + b) * s1, 1_000_000))
        l, b, s = lnew, bnew, s[1:] + [snew]
    return l, b, s, e, len(ys)


@given(
    ys=st.lists(st.integers(1, 10**7), min_size=14, max_size=80),
)
@_SETTINGS
def test_hw_mul_seasonal_queue_invariants(ys):
    """The rotating seasonal queue keeps exactly m entries, every index
    stays >= 1 (the clamp that guards the deseason division), and the MAE
    accumulator is monotone non-negative — the three structural invariants
    the fold relies on at any input."""
    out = hw_mul_reference(ys)
    assert out is not None
    l, b, s, e, n = out
    assert len(s) == 7
    assert all(x >= 1 for x in s)
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
        sf = s[(h - 1) % 7]
        forecast_cents = _tdiv(_tdiv((l + h * b) * sf, 1_000_000), 1000)
        assert abs(forecast_cents - scale) <= max(2, scale // 10_000)


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
    f_spike = _tdiv(_tdiv((l + 5 * b) * s[4], 1_000_000), 1000)
    f_flat = _tdiv(_tdiv((l + 4 * b) * s[3], 1_000_000), 1000)
    assert f_spike > 1.5 * f_flat
