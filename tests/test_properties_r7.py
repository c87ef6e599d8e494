"""Round-7 property checks: the mathematical identities the new operators
(and their DuckDB oracles) both rely on, verified against brute-force
pure-Python references on hypothesis-generated inputs. No SparkSession —
these pin the ALGEBRA both engines implement, independent of either.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=200, deadline=None)


# --- B131: CUSUM fold == prefix-sum / running-min identity -------------------


@given(
    xs=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    mu=st.integers(-10, 10),
    slack=st.integers(0, 5),
)
@_SETTINGS
def test_cusum_prefix_identity(xs, mu, slack):
    # fold form (the Spark aggregate): S_t = max(0, S + x - mu - slack),
    # best = max S_t, day = first index attaining best
    s = best = 0
    best_i = None
    for i, x in enumerate(xs):
        s = max(0, s + x - mu - slack)
        if s > best:
            best, best_i = s, i
    # windowed form (the DuckDB oracle): S_t = P_t - min(0, min_{j<=t} P_j)
    p = 0
    run_min = 0
    w_best = 0
    w_best_i = None
    for i, x in enumerate(xs):
        p += x - mu - slack
        run_min = min(run_min, p)
        s_t = p - min(0, run_min)
        if s_t > w_best:
            w_best, w_best_i = s_t, i
    assert (best, best_i) == (w_best, w_best_i)


# --- C111: island sweep == brute-force interval union ------------------------


@given(
    ivs=st.lists(
        st.tuples(st.integers(1, 60), st.integers(0, 15)).map(
            lambda t: (t[0], t[0] + t[1])
        ),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_interval_union_sweep_equals_bruteforce(ivs):
    ivs = sorted(set(ivs))  # DISTINCT is part of the operator's contract
    # sweep (the C111 form): sort by (s, e); new island when s > running max e
    covered_sweep = 0
    cur_s = cur_e = None
    for s, e in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered_sweep += cur_e - cur_s + 1
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered_sweep += cur_e - cur_s + 1
    brute = len({x for s, e in ivs for x in range(s, e + 1)})
    assert covered_sweep == brute


# --- C117: max-min lattice is monotone and within 1 ppm of true PAVA ---------


@given(
    buckets=st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).map(
            lambda t: (t[0], min(t[0], t[1]))
        ),
        min_size=1,
        max_size=10,
    )
)
@_SETTINGS
def test_isotonic_lattice_monotone_and_close_to_pava(buckets):
    n = [b[0] for b in buckets]
    p = [b[1] for b in buckets]
    k = len(buckets)
    # the operator's form: iso_i = max_{j<=i} min_{k>=i} floor_ppm(mean(j..k))
    def vq(j, kk):
        num = sum(p[j : kk + 1])
        den = sum(n[j : kk + 1])
        return (1_000_000 * num) // den

    iso = [
        max(min(vq(j, kk) for kk in range(i, k)) for j in range(i + 1))
        for i in range(k)
    ]
    assert all(iso[i] <= iso[i + 1] for i in range(k - 1)), "not monotone"
    # true PAVA by pooling (exact rational means)
    pools = []  # (sum_p, sum_n)
    for i in range(k):
        pools.append((p[i], n[i]))
        while len(pools) >= 2:
            (p2, n2), (p1, n1) = pools[-1], pools[-2]
            if p1 * n2 > p2 * n1:  # mean decreases -> pool
                pools[-2:] = [(p1 + p2, n1 + n2)]
            else:
                break
    pava = []
    for sp, sn in pools:
        pava.extend([(1_000_000 * sp) / sn] * 0)  # lengths handled below
    # expand pools to per-bucket values
    pava = []
    idx = 0
    for sp, sn in pools:
        # pool covers buckets until its n-mass is consumed
        consumed = 0
        while consumed < sn:
            consumed += n[idx]
            pava.append(1_000_000 * sp / sn)
            idx += 1
    assert len(pava) == k
    for a, b in zip(iso, pava):
        assert abs(a - b) <= 1.0 + 1e-6, (iso, pava)


# --- C119: Bloom filter has no false negatives -------------------------------

_M, _K = 1024, 2


def _slots(h: int) -> set[int]:
    h1 = h % _M
    h2 = 1 + (h // _M) % (_M - 1)
    return {(h1 + i * h2) % _M for i in range(_K)}


@given(
    ins=st.sets(st.integers(0, 2**60 - 1), min_size=1, max_size=200),
    probes=st.sets(st.integers(0, 2**60 - 1), min_size=1, max_size=50),
)
@_SETTINGS
def test_bloom_no_false_negatives(ins, probes):
    bits = {s for h in ins for s in _slots(h)}
    for h in ins:
        assert _slots(h) <= bits  # every inserted key tests positive
    # and membership compares against the key's own distinct slot count
    for h in probes - ins:
        verdict = _slots(h) <= bits
        n_set = len(_slots(h) & bits)
        assert verdict == (n_set == len(_slots(h)))


# --- C110: diagonal-run length == shared-span length identity ----------------


@given(
    pre_a=st.integers(0, 6),
    pre_b=st.integers(0, 6),
    span_len=st.integers(8, 30),
    base=st.integers(10**6, 2 * 10**6),
    stride=st.integers(1, 97),
)
@_SETTINGS
def test_diagonal_run_recovers_planted_span(pre_a, pre_b, span_len, base, stride):
    # plant a shared span of DISTINCT tokens inside two otherwise-disjoint
    # docs (a span with internal repeats is self-similar and legitimately
    # matches on several diagonals — C110 reports each such run; the
    # single-diagonal identity below holds only for repeat-free spans)
    k = 8
    span = [base + i * stride for i in range(span_len)]
    doc_a = [-(i + 1) for i in range(pre_a)] + span + [-100 - i for i in range(3)]
    doc_b = [-(1000 + i) for i in range(pre_b)] + span + [-2000 - i for i in range(3)]

    def shingles(doc):
        return {
            (i, tuple(doc[i : i + k])) for i in range(len(doc) - k + 1)
        }

    hits = [
        (ia, ib)
        for ia, sa in shingles(doc_a)
        for ib, sb in shingles(doc_b)
        if sa == sb
    ]
    # all hits lie on one diagonal, and the maximal run has exactly
    # span_len - k + 1 entries => recovered span length == span_len
    diags = {ia - ib for ia, ib in hits}
    assert len(diags) == 1
    run = sorted(ia for ia, _ in hits)
    assert run == list(range(run[0], run[0] + span_len - k + 1))
    assert (len(run) + k - 1) == span_len
