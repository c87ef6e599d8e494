"""Round-14 property checks: the algebraic identities the new operators
(and their DuckDB oracles) rely on, verified against brute-force pure-Python
references on hypothesis-generated inputs. No SparkSession — these pin the
ALGEBRA both engines implement, independent of either (the round-10..13
convention).
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=200, deadline=None)


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark `div` / DuckDB `//`, D7-pinned)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --- B213: MACD on the integer cents lattice -----------------------------------

_MACD_FAST, _MACD_SLOW, _MACD_SIG = 12, 26, 9


def macd_reference(ys):
    """Pure-Python rendering of the B213 recurrence (init-by-copy at bar
    1). Returns (macd, sig, up, down, first_cross_index or None)."""
    f = s = ys[0]
    sig, up, down, fci = 0, 0, 0, None
    for i, y in enumerate(ys[1:], start=1):
        om, osig = f - s, sig
        f = f + _tdiv(y - f, _MACD_FAST)
        s = s + _tdiv(y - s, _MACD_SLOW)
        nm = f - s
        sig = sig + _tdiv(nm - sig, _MACD_SIG)
        if nm > sig and om <= osig:
            up += 1
            if fci is None:
                fci = i
        elif nm < sig and om >= osig:
            down += 1
    return f - s, sig, up, down, fci


@given(st.integers(-(10**12), 10**12), st.integers(2, 60))
@_SETTINGS
def test_macd_flat_series_is_identically_zero(y, n):
    """A constant series never moves any of the three EWMAs off the
    init-by-copy seed: macd = signal = 0, zero crossings — the guard the
    crossover CASEs rely on (strict > / <, so 0 vs 0 never fires)."""
    macd, sig, up, down, fci = macd_reference([y] * n)
    assert (macd, sig, up, down, fci) == (0, 0, 0, 0, None)


@given(st.lists(st.integers(-(10**9), 10**9), min_size=2, max_size=120))
@_SETTINGS
def test_macd_crossings_alternate(ys):
    """Bullish and bearish crossings strictly alternate (each requires the
    PREVIOUS relation to be on the other side), so their counts differ by
    at most one — the sanity bound a monitoring readout leans on."""
    _, _, up, down, _ = macd_reference(ys)
    assert abs(up - down) <= 1


@given(st.lists(st.integers(-(10**9), 10**9), min_size=2, max_size=120))
@_SETTINGS
def test_macd_ewmas_stay_in_hull(ys):
    """The truncating-div EWMA E += (x−E) div a can never leave the hull
    of observed values (|step| <= |x−E|), so |macd| is bounded by the
    series range — the no-overflow argument for the cents lattice."""
    lo, hi = min(ys), max(ys)
    f = s = ys[0]
    for y in ys[1:]:
        f = f + _tdiv(y - f, _MACD_FAST)
        s = s + _tdiv(y - s, _MACD_SLOW)
        assert lo <= f <= hi and lo <= s <= hi
    macd, _, _, _, _ = macd_reference(ys)
    assert abs(macd) <= hi - lo


@given(st.integers(-(10**9), 10**9), st.integers(1, 10**7))
@_SETTINGS
def test_macd_first_cross_on_jump_up(base, jump):
    """A flat series with one large upward jump fires its FIRST crossing
    as bullish at the jump bar: fast outruns slow immediately, and the
    signal (div {_MACD_SIG} of the new positive macd) lags below it when
    the jump is large enough to survive truncation."""
    ys = [base] * 10 + [base + jump * 1000] * 5
    _, _, up, down, fci = macd_reference(ys)
    if fci is not None:
        assert fci == 10
        assert up >= 1


# --- C177: RIFF offset table vs an independent struct.pack encoding -----------


def _le(b: bytes, off1: int, n: int) -> int:
    """The parser's little-endian read, 1-based offset (the SQL form)."""
    return sum(b[off1 - 1 + i] * 256**i for i in range(n))


@given(
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    data=st.binary(min_size=0, max_size=200),
)
@_SETTINGS
def test_wav_offsets_match_struct_pack(ch, rate, data):
    """The WAV offset table (channels@23 LE16, rate@25 LE32, byte-rate@29
    LE32, bits@35 LE16, data size@41 LE32) read back from a header encoded
    INDEPENDENTLY with struct.pack's canonical 44-byte layout — pins the
    parser's offsets/endianness against the spec, not our own writer."""
    bits = 16
    block = ch * bits // 8
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,
        ch,
        rate,
        rate * block,
        block,
        bits,
        b"data",
        len(data),
    )
    b = hdr + data
    assert b[8:12] == b"WAVE"
    assert _le(b, 23, 2) == ch
    assert _le(b, 25, 4) == rate
    assert _le(b, 29, 4) == rate * block
    assert _le(b, 35, 2) == bits
    assert _le(b, 41, 4) == len(data)
    if rate * block:
        assert _tdiv(1000 * len(data), rate * block) == (
            1000 * len(data)
        ) // (rate * block)


@given(
    w=st.integers(1, 16383),
    h=st.integers(1, 16383),
    scale=st.integers(0, 3),
)
@_SETTINGS
def test_webp_vp8_dims_mask_14_bits(w, h, scale):
    """The VP8 lossy dims are 14-bit fields inside LE16 slots whose top 2
    bits carry scaling hints — the parser's % 16384 mask must recover the
    dims for ANY hint value (pins the mask against struct.pack)."""
    hdr = struct.pack(
        "<4sI4s4sI",
        b"RIFF",
        20,
        b"WEBP",
        b"VP8 ",
        10,
    ) + b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack(
        "<HH", w | (scale << 14), h | (scale << 14)
    )
    assert hdr[8:12] == b"WEBP"
    assert hdr[23:26] == b"\x9d\x01\x2a"
    assert _le(hdr, 27, 2) % 16384 == w
    assert _le(hdr, 29, 2) % 16384 == h


# --- C178: the /Count locate's closed-form offset ------------------------------


def test_pdf_count_offset_closed_form():
    """Rebuild the synthesized PDF prefix in pure Python for every pad
    value and check the oracle's closed-form count_offset equals the
    actual 1-based position of '/Count ' — the C175 sof_offset
    discipline applied to the text-structured container."""
    from spark_kinesis_sql_asl_spark.llm.multimodal import (
        _PDF_COUNT_BASE,
        _PDF_OBJ1,
        _PDF_OBJ2_PRE,
    )

    for doc_id in range(40):
        minor = 1 + doc_id % 7
        pad = doc_id % 9
        pages = 1 + doc_id % 100
        s = (
            f"%PDF-1.{minor}\n"
            + "%" + "x" * pad + "\n"
            + _PDF_OBJ1
            + _PDF_OBJ2_PRE
            + f"/Count {pages}>>endobj\n"
            + "tail /Count 999 content"  # decoy AFTER the real one
        )
        assert s.index("/Count ") + 1 == _PDF_COUNT_BASE + pad
        assert s[5] == "1" and s[7] == str(minor)


# --- A20: billing-lattice identities -------------------------------------------


@given(st.lists(st.integers(1, 10**12), min_size=1, max_size=16))
@_SETTINGS
def test_cost_share_ppm_sums_to_million_minus_floor_loss(costs):
    """Per-shard share_ppm = floor(1e6·c_i / total): the floor loses less
    than one ppm per shard, so the shares sum into (1e6 − n_shards, 1e6]
    — the reconciliation bound an attribution table is audited against."""
    total = sum(costs)
    shares = [(10**6 * c) // total for c in costs]
    assert 10**6 - len(costs) < sum(shares) <= 10**6


@given(st.lists(st.integers(0, 200_000), min_size=1, max_size=50))
@_SETTINGS
def test_cost_put_units_ceil_div_superadditive(sizes):
    """Per-record PUT units sum >= the units of the concatenated bytes
    (rounding up happens per record — the reason the billing column must
    ceil per record, not on the shard total)."""
    unit = 25_600
    per_record = sum((b + unit - 1) // unit for b in sizes)
    pooled = (sum(sizes) + unit - 1) // unit
    assert per_record >= pooled


@given(st.integers(0, 10**15))
@_SETTINGS
def test_cost_extended_hours_identity(lag_us):
    """extended_hours = max(0, ceil_hours(lag) − 24) on the micros
    lattice: zero iff the replay need fits the 24 h service floor."""
    hr = 3_600_000_000
    ceil_h = (lag_us + hr - 1) // hr
    ext = max(0, ceil_h - 24)
    if lag_us <= 24 * hr:
        assert ext == 0
    if ext > 0:
        assert lag_us > 24 * hr
        assert ext == ceil_h - 24


# --- B214: Wilder ATR on the milli-cent lattice --------------------------------

_ATR_N = 14


def atr_reference(bars):
    """Pure-Python rendering of the B214 recurrence (init-by-copy at bar
    1: atr = 1000·(h1−l1)). bars = [(h, l, c)]. Returns (atr, mx, pc)."""
    h1, l1, c1 = bars[0]
    pc, atr, mx = c1, 1000 * (h1 - l1), h1 - l1
    for h, lo, c in bars[1:]:
        tr = max(h - lo, abs(h - pc), abs(lo - pc))
        atr = _tdiv((_ATR_N - 1) * atr + 1000 * tr, _ATR_N)
        mx = max(mx, tr)
        pc = c
    return atr, mx, pc


def _bars_strategy():
    """(h, l, c) bars with the structural invariant l <= c <= h the daily
    OHLC build guarantees (close is one of the bar's observed cents)."""
    def mk(a, b, t):
        lo, hi = min(a, b), max(a, b)
        return (hi, lo, lo + (hi - lo) * t // 1000)

    return st.lists(
        st.builds(
            mk,
            st.integers(-(10**9), 10**9),
            st.integers(-(10**9), 10**9),
            st.integers(0, 1000),
        ),
        min_size=2,
        max_size=120,
    )


@given(_bars_strategy())
@_SETTINGS
def test_atr_nonnegative_and_bounded_by_max_tr(bars):
    """atr and every true range are non-negative (so truncating div ==
    floor div — the cross-engine argument), and the Wilder average can
    never exceed the largest true range seen: atr' = ((n-1)·atr +
    1000·tr) div n stays <= max(atr, 1000·tr) inductively."""
    atr, mx, _ = atr_reference(bars)
    assert atr >= 0 and mx >= 0
    assert atr <= 1000 * mx


@given(st.integers(-(10**9), 10**9), st.integers(2, 80))
@_SETTINGS
def test_atr_flat_bars_are_identically_zero(c, n):
    """Degenerate h = l = c bars: every true range is zero, so the ATR is
    identically zero at every step — the flat-series guard, and the case
    where natr's close>0 gate is the ONLY thing between the readout and a
    division by zero."""
    atr, mx, pc = atr_reference([(c, c, c)] * n)
    assert (atr, mx, pc) == (0, 0, c)


@given(
    st.integers(0, 10**8),
    st.integers(1, 10**7),
    st.integers(2, 40),
)
@_SETTINGS
def test_atr_gap_dominates_range(base, gap, n):
    """An overnight GAP between flat bars is invisible to high−low but
    NOT to true range: tr at the jump bar is exactly the gap (that is the
    point of Wilder's max-of-three form), so max_tr == gap and the
    smoothed atr moves off zero iff 1000·gap survives div {_ATR_N}."""
    bars = [(base, base, base)] * n + [(base + gap, base + gap, base + gap)]
    atr, mx, _ = atr_reference(bars)
    assert mx == gap
    assert atr == _tdiv(1000 * gap, _ATR_N)


@given(_bars_strategy())
@_SETTINGS
def test_atr_tr_at_least_plain_range(bars):
    """Every bar's true range >= its plain high−low range, so the folded
    max_tr is >= the widest plain range — the 'gap folding only widens'
    monotonicity the docstring claims."""
    _, mx, _ = atr_reference(bars)
    assert mx >= max(h - lo for h, lo, _ in bars)


# --- B215: stochastic oscillator %K/%D ----------------------------------------

_STO_N, _STO_D = 14, 3


def k_ppm(c: int, l14: int, h14: int):
    """The %K formula both engines implement (floor-div, flat guard)."""
    if h14 <= l14:
        return None
    return (1000000 * (c - l14)) // (h14 - l14)


@given(
    st.integers(-(10**9), 10**9),
    st.integers(0, 10**9),
    st.integers(0, 1000),
)
@_SETTINGS
def test_stochastic_k_in_ppm_range(lo, spread, t):
    """With l14 <= c <= h14 (the frame contains the current bar, whose
    low <= close <= high), %K lands in [0, 1e6] exactly — the numerator
    is non-negative so truncating div == floor div cross-engine."""
    hi = lo + spread
    c = lo + spread * t // 1000
    k = k_ppm(c, lo, hi)
    if spread == 0:
        assert k is None
    else:
        assert 0 <= k <= 1000000


@given(
    st.integers(-(10**6), 10**6),
    st.integers(1, 10**6),
    st.integers(0, 1000),
    st.integers(0, 1000),
)
@_SETTINGS
def test_stochastic_k_monotone_in_close(lo, spread, t1, t2):
    """For a fixed envelope, %K is monotone in the close — the property
    that makes it an oscillator (a higher close never reads as weaker)."""
    hi = lo + spread
    c1 = lo + spread * min(t1, t2) // 1000
    c2 = lo + spread * max(t1, t2) // 1000
    assert k_ppm(c1, lo, hi) <= k_ppm(c2, lo, hi)


@given(st.lists(st.integers(0, 10**6), min_size=3, max_size=3))
@_SETTINGS
def test_stochastic_d_stays_in_k_hull(ks):
    """%D (the floor 3-bar mean) can never leave the hull of its three
    %K inputs: min <= (a+b+c) div 3 <= max."""
    d = sum(ks) // _STO_D
    assert min(ks) <= d <= max(ks)


def test_stochastic_dense_gate_excludes_gapped_frames():
    """The dense-calendar gate (B211 lesson): a 14-ROW frame whose day
    span exceeds 13 releases NULL. Construct days with one gap — every
    frame containing the gap is excluded, frames fully before/after it
    qualify."""
    days = list(range(20)) + list(range(25, 45))  # gap 20..24
    qualifying = []
    for i in range(len(days)):
        if i >= _STO_N - 1:
            frame = days[i - (_STO_N - 1) : i + 1]
            if frame[-1] - frame[0] == _STO_N - 1:
                qualifying.append(days[i])
    # frames entirely inside [0,19] qualify (days 13..19), the gap kills
    # every frame straddling it, then [25,44] re-qualifies from day 38
    assert qualifying == list(range(13, 20)) + list(range(38, 45))


# --- A21: KPL aggregation-efficiency on the 25 KB quantum ----------------------

_PUT_Q = 25_600
_SUB_O = 8
_AGG_O = 20


def _ceil_div(a: int, q: int) -> int:
    return (a + q - 1) // q


@given(st.lists(st.integers(1, 200_000), min_size=1, max_size=50))
@_SETTINGS
def test_kpl_packing_subadditive_without_overhead(sizes):
    """ceil((a+b)/q) <= ceil(a/q) + ceil(b/q): absent framing overhead,
    packing records into one aggregate can never cost MORE units than
    sending them alone — the direction the savings readout leans on."""
    assert _ceil_div(sum(sizes), _PUT_Q) <= sum(
        _ceil_div(b, _PUT_Q) for b in sizes
    )


@given(st.lists(st.integers(1, 200_000), min_size=1, max_size=50))
@_SETTINGS
def test_kpl_overhead_excess_is_bounded(sizes):
    """WITH framing overhead the aggregate can cost more than the raw
    records (sparse-shard honesty), but the excess is bounded by the
    units the overhead bytes alone occupy: agg_units <= raw_units +
    ceil((n·sub + agg)/q) — the bound that keeps saved_units' negative
    tail explainable in the audit."""
    raw = sum(_ceil_div(b, _PUT_Q) for b in sizes)
    agg_bytes = _AGG_O + sum(b + _SUB_O for b in sizes)
    agg = _ceil_div(agg_bytes, _PUT_Q)
    overhead_units = _ceil_div(len(sizes) * _SUB_O + _AGG_O, _PUT_Q)
    assert agg <= raw + overhead_units
    assert agg >= 1


@given(
    st.lists(st.integers(1, 200_000), min_size=1, max_size=30),
    st.lists(st.integers(1, 200_000), min_size=1, max_size=30),
)
@_SETTINGS
def test_kpl_merging_flushes_never_costs_more(a, b):
    """Coarsening the flush window (merging two adjacent flush cells into
    one aggregate) never increases agg units: one envelope fewer AND the
    ceil is subadditive — the monotone dial the n_oversize readout trades
    against."""
    def agg_units(sizes):
        return _ceil_div(_AGG_O + sum(x + _SUB_O for x in sizes), _PUT_Q)

    assert agg_units(a + b) <= agg_units(a) + agg_units(b)


# --- C179: MP4 box walk vs an independent struct.pack encoding ----------------

_MP4_TIMESCALES = (600, 1000, 44100, 90000)
_MP4_MAX_LEAD = 4
_MP4_MVHD_SIZE = 108


def _mp4_payload(doc_id: int, text: bytes) -> bytes:
    """Independent struct.pack rebuild of the C179 synthesis (big-endian
    box sizes, version-0 mvhd) — NOT the SQL concat, so an arithmetic
    slip in either side breaks the agreement."""
    out = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0x200)
    for j in range(doc_id % _MP4_MAX_LEAD):
        plen = 1 + (doc_id + 5 * j) % 8
        out += struct.pack(">I", 8 + plen) + b"free" + b"Z" * plen
    ts = _MP4_TIMESCALES[doc_id % 4]
    dur = 1 + (doc_id * 37) % 1000000
    mvhd = (
        struct.pack(">I", _MP4_MVHD_SIZE)
        + b"mvhd"
        + b"\x00" * 12
        + struct.pack(">II", ts, dur)
        + b"\x00" * (_MP4_MVHD_SIZE - 28)
    )
    out += struct.pack(">I", 8 + _MP4_MVHD_SIZE) + b"moov" + mvhd
    out += struct.pack(">I", 8 + len(text)) + b"mdat" + text
    return out


def _mp4_walk(b: bytes):
    """Independent parser: top-level walk to moov (0-based cursor), then
    the mvhd reads — returns (moov_offset_1based, skips, ts, dur)."""
    assert b[4:8] == b"ftyp"
    pos, skips = 0, 0
    for _ in range(8):
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        cc = b[pos + 4 : pos + 8]
        if cc == b"moov":
            break
        if cc != b"ftyp":
            skips += 1
        pos += size
    child = pos + 8
    assert b[child + 4 : child + 8] == b"mvhd" and b[child + 8] == 0
    ts, dur = struct.unpack(">II", b[child + 20 : child + 28])
    return pos + 1, skips, ts, dur


def _mp4_lead_total(doc_id: int) -> int:
    return sum(
        9 + (doc_id + 5 * j) % 8 for j in range(doc_id % _MP4_MAX_LEAD)
    )


@given(st.integers(0, 10**9), st.binary(min_size=0, max_size=120))
@_SETTINGS
def test_mp4_walk_matches_closed_form(doc_id, text):
    """The walk-found moov offset equals the oracle's closed form
    17 + lead_total, the skip count equals doc_id % 4, and the
    timescale/duration land exactly where child+12/child+16 read them."""
    b = _mp4_payload(doc_id, text)
    moov1, skips, ts, dur = _mp4_walk(b)
    assert moov1 == 17 + _mp4_lead_total(doc_id)
    assert skips == doc_id % _MP4_MAX_LEAD
    assert ts == _MP4_TIMESCALES[doc_id % 4]
    assert dur == 1 + (doc_id * 37) % 1000000


@given(st.integers(0, 10**9))
@_SETTINGS
def test_mp4_duration_ms_floor_identity(doc_id):
    """duration_ms = (1000·ticks) div timescale is an exact non-negative
    floor division — and inverting it brackets the tick count, the
    round-trip sanity both engines must agree on."""
    ts = _MP4_TIMESCALES[doc_id % 4]
    dur = 1 + (doc_id * 37) % 1000000
    ms = (1000 * dur) // ts
    assert 0 <= ms
    assert ms * ts <= 1000 * dur < (ms + 1) * ts
