"""Adversarial fixture generator (round-3 verification infrastructure).

Synthesizes the ten FIXTURES.md tables with the hostile cases
``/root/testdata`` lacks — the round-2 lesson was that locally-green queries
can fail the driver on content the local fixtures never exercise. Hostile
cases included:

* NULLs in every non-key, non-ordering column (text, value, props, prices,
  balances, categorical domains).
* Empty, whitespace-only, multi-space, leading/trailing-space, and
  exact-duplicate document texts.
* Ties in ORDER BY columns (duplicate timestamps per user, duplicate
  revenue values) — forces every window/rank query to have a deterministic
  tiebreak.
* Negative, huge (1e15), tiny (1e-7), and high-precision doubles, plus
  exact predicate-boundary values (25.0/50.0/75.0, quantity 30, discount
  0.05).
* Timestamps exactly 7 days apart (the B88/D4 RANGE-frame boundary), month
  boundaries, and identical order dates.
* Dangling foreign keys (orders→customer, nation→region) so outer joins see
  unmatched rows on both sides.

Deliberately NOT included, with reasons:

* NULL keys / NULL ordering timestamps — Spark orders NULLS FIRST by
  default where DuckDB orders NULLS LAST, so any window over a NULL-bearing
  ORDER BY column diverges for engine-semantic reasons, not query bugs; the
  driver's fixtures (FIXTURES.md: "no column contains NULLs") never
  exercise this.
* NULL / variable-length embedding arrays — FIXTURES.md pins the embedding
  contract to non-null float[64]; operators are entitled to assume it.

Layout, row counts, and dtypes mirror FIXTURES.md exactly (int32 for
INTEGER columns, timestamp[us], list<float32> embeddings).
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH = dt.datetime(2024, 1, 1)
_DAY = dt.timedelta(days=1)
_WEEK = dt.timedelta(days=7)

# Values engineered to sit on predicate boundaries used by the queries.
# Magnitudes are capped at 1e6: IEEE float summation is order-dependent,
# and mixing ~1e15 with ~1e0 values makes Spark's partial-aggregation sum
# and DuckDB's sequential sum legitimately differ at the ULP — an
# engine-fundamental property no output convention can fix, and one the
# bounded driver domain (prices/values ~1e2) never exercises. At ≤1e6 the
# ULP noise stays far below every round(..., N) the queries emit.
_HOSTILE_DOUBLES = [
    None,
    0.0,
    -0.0,
    25.0,  # q_fn_case boundary
    50.0,  # canary filter boundary
    75.0,  # q_fn_case boundary
    -123.456,
    1e6,
    1e-7,
    0.1 + 0.2,  # 0.30000000000000004
    2.675,  # classic round-half float trap
    99.999999,
]

_HOSTILE_TEXTS = [
    None,
    "",
    " ",
    "   ",
    "join filter  window",  # double space
    " leading space",
    "trailing space ",
    "solo",
    "join join join join join join join join",  # repetitive
    "join filter window group order limit",
    "the quick brown fox jumps over the lazy dog",
    "join filter window group order limit",  # exact duplicate of above-1
]


def _write(path, names_arrays: list[tuple[str, pa.Array]]) -> None:
    pq.write_table(
        pa.table({n: a for n, a in names_arrays}), path, compression="snappy"
    )


def write_adversarial(out_dir: str) -> None:
    rng = random.Random(7)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    # region: duplicate name + NULL name
    _write(
        f"{out_dir}/region.parquet",
        [
            ("r_regionkey", pa.array([0, 1, 2, 3, 4], pa.int32())),
            (
                "r_name",
                pa.array(
                    ["ASIA", "ASIA", None, "EUROPE", "AFRICA"], pa.string()
                ),
            ),
        ],
    )

    # nation: one dangling FK (99), one NULL name
    nk = list(range(25))
    _write(
        f"{out_dir}/nation.parquet",
        [
            ("n_nationkey", pa.array(nk, pa.int32())),
            (
                "n_name",
                pa.array(
                    [None if k == 3 else f"NATION{k:02d}" for k in nk],
                    pa.string(),
                ),
            ),
            (
                "n_regionkey",
                pa.array(
                    [99 if k == 7 else k % 5 for k in nk], pa.int32()
                ),
            ),
        ],
    )

    # customer: NULL/negative/high-precision balances, duplicate names,
    # customers with no orders (keys 50+)
    ck = list(range(60))
    _write(
        f"{out_dir}/customer.parquet",
        [
            ("c_custkey", pa.array(ck, pa.int64())),
            (
                "c_name",
                pa.array(
                    ["Customer#DUP" if k % 13 == 0 else f"Customer#{k}" for k in ck],
                    pa.string(),
                ),
            ),
            ("c_nationkey", pa.array([k % 25 for k in ck], pa.int32())),
            (
                "c_acctbal",
                pa.array(
                    [_HOSTILE_DOUBLES[k % len(_HOSTILE_DOUBLES)] for k in ck],
                    pa.float64(),
                ),
            ),
            (
                "c_mktsegment",
                pa.array(
                    [None if k % 17 == 0 else segs[k % 5] for k in ck],
                    pa.string(),
                ),
            ),
        ],
    )

    # supplier
    sk = list(range(20))
    _write(
        f"{out_dir}/supplier.parquet",
        [
            ("s_suppkey", pa.array(sk, pa.int64())),
            ("s_name", pa.array([f"Supplier#{k}" for k in sk], pa.string())),
            ("s_nationkey", pa.array([k % 25 for k in sk], pa.int32())),
            (
                "s_acctbal",
                pa.array(
                    [_HOSTILE_DOUBLES[(k + 3) % len(_HOSTILE_DOUBLES)] for k in sk],
                    pa.float64(),
                ),
            ),
        ],
    )

    # part: zero/negative sizes, NULL type
    pk = list(range(30))
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    _write(
        f"{out_dir}/part.parquet",
        [
            ("p_partkey", pa.array(pk, pa.int64())),
            ("p_name", pa.array([f"part {k}" for k in pk], pa.string())),
            (
                "p_brand",
                pa.array([f"Brand#{1 + k % 25}" for k in pk], pa.string()),
            ),
            (
                "p_type",
                pa.array(
                    [None if k % 11 == 0 else types[k % 6] for k in pk],
                    pa.string(),
                ),
            ),
            (
                "p_size",
                pa.array([(-5 if k % 9 == 0 else k % 50) for k in pk], pa.int32()),
            ),
            (
                "p_retailprice",
                pa.array(
                    [_HOSTILE_DOUBLES[(k + 5) % len(_HOSTILE_DOUBLES)] for k in pk],
                    pa.float64(),
                ),
            ),
        ],
    )

    # orders: dangling custkeys, duplicate dates (ties), month boundaries,
    # NULL / hostile totals
    ok = list(range(100))
    base = dt.datetime(1995, 1, 1)
    dates = []
    for k in ok:
        if k % 10 == 0:
            d = base  # massive tie on the epoch itself
        elif k % 10 == 1:
            d = base + _WEEK * (k // 10)  # exact 7-day lattice
        elif k % 10 == 2:
            d = dt.datetime(1995 + (k % 6), ((k * 7) % 12) + 1, 1)  # month start
        else:
            d = base + dt.timedelta(days=rng.randrange(0, 2400), hours=k % 24)
        dates.append(d)
    _write(
        f"{out_dir}/orders.parquet",
        [
            ("o_orderkey", pa.array(ok, pa.int64())),
            (
                "o_custkey",
                pa.array(
                    [999 if k % 21 == 0 else k % 50 for k in ok], pa.int64()
                ),
            ),
            (
                "o_orderstatus",
                pa.array(["FOP"[k % 3] for k in ok], pa.string()),
            ),
            (
                "o_totalprice",
                pa.array(
                    [_HOSTILE_DOUBLES[k % len(_HOSTILE_DOUBLES)] for k in ok],
                    pa.float64(),
                ),
            ),
            (
                "o_orderdate",
                pa.array(dates, pa.timestamp("us")),
            ),
            (
                "o_orderpriority",
                pa.array(
                    [None if k % 23 == 0 else prios[k % 5] for k in ok],
                    pa.string(),
                ),
            ),
        ],
    )

    # lineitem: boundary quantities (exactly 30) and discounts (exactly
    # 0.05), NULL prices, tied revenues, tied ship dates
    n_li = 200
    li = list(range(n_li))
    _write(
        f"{out_dir}/lineitem.parquet",
        [
            ("l_orderkey", pa.array([k % 100 for k in li], pa.int64())),
            ("l_partkey", pa.array([k % 30 for k in li], pa.int64())),
            ("l_suppkey", pa.array([k % 20 for k in li], pa.int64())),
            ("l_linenumber", pa.array([k // 100 + 1 for k in li], pa.int32())),
            (
                "l_quantity",
                pa.array(
                    [30.0 if k % 7 == 0 else float(1 + k % 50) for k in li],
                    pa.float64(),
                ),
            ),
            (
                "l_extendedprice",
                pa.array(
                    [
                        None
                        if k % 31 == 0
                        else (1000.0 if k % 5 == 0 else round(100.0 + k * 1.37, 2))
                        for k in li
                    ],
                    pa.float64(),
                ),
            ),
            (
                "l_discount",
                pa.array(
                    [0.05 if k % 4 == 0 else round((k % 10) * 0.01, 2) for k in li],
                    pa.float64(),
                ),
            ),
            (
                "l_tax",
                pa.array([round((k % 8) * 0.01, 2) for k in li], pa.float64()),
            ),
            (
                "l_returnflag",
                pa.array(["ANR"[k % 3] for k in li], pa.string()),
            ),
            ("l_linestatus", pa.array(["FO"[k % 2] for k in li], pa.string())),
            (
                "l_shipdate",
                pa.array(
                    [
                        base + dt.timedelta(days=(k % 40) * 7)  # 7-day lattice
                        for k in li
                    ],
                    pa.timestamp("us"),
                ),
            ),
        ],
    )

    # events: per-user duplicate timestamps (ties), exact 7-day pairs,
    # NULL values/types/props, boundary values
    n_ev = 150
    ev = list(range(n_ev))
    etypes = ["click", "view", "purchase", "signup", "error"]
    ts = []
    for k in ev:
        u = k % 12
        if k % 5 == 0:
            t = _EPOCH + _DAY * u  # tie: same instant per user, many rows
        elif k % 5 == 1:
            t = _EPOCH + _DAY * u + _WEEK  # exactly 7 days later
        else:
            t = _EPOCH + dt.timedelta(
                days=rng.randrange(0, 29),
                seconds=rng.randrange(0, 86_400),
                microseconds=rng.randrange(0, 1_000_000),
            )
        ts.append(t)
    _write(
        f"{out_dir}/events.parquet",
        [
            ("event_id", pa.array(ev, pa.int64())),
            ("ts", pa.array(ts, pa.timestamp("us"))),
            ("user_id", pa.array([k % 12 for k in ev], pa.int64())),
            (
                "event_type",
                pa.array(
                    [None if k % 29 == 0 else etypes[k % 5] for k in ev],
                    pa.string(),
                ),
            ),
            (
                "value",
                pa.array(
                    [_HOSTILE_DOUBLES[k % len(_HOSTILE_DOUBLES)] for k in ev],
                    pa.float64(),
                ),
            ),
            (
                "props",
                pa.array(
                    [
                        None
                        if k % 19 == 0
                        else ("{}" if k % 19 == 1 else '{"k": %d}' % (k % 100))
                        for k in ev
                    ],
                    pa.string(),
                ),
            ),
        ],
    )

    # documents: the hostile text list cycled + filler with tiny vocab
    n_doc = 80
    vocab = ["join", "filter", "window", "group", "order", "scan", "sort"]
    texts, langs, sources = [], [], []
    for k in range(n_doc):
        if k < len(_HOSTILE_TEXTS):
            t = _HOSTILE_TEXTS[k]
        else:
            t = " ".join(
                rng.choice(vocab) for _ in range(rng.randrange(1, 30))
            )
        texts.append(t)
        langs.append(None if k % 27 == 0 else ["en", "de", "es", "fr", "zh"][k % 5])
        sources.append(None if k % 26 == 0 else f"src{k % 20}")
    _write(
        f"{out_dir}/documents.parquet",
        [
            ("doc_id", pa.array(list(range(n_doc)), pa.int64())),
            ("text", pa.array(texts, pa.string())),
            ("lang", pa.array(langs, pa.string())),
            ("source", pa.array(sources, pa.string())),
            (
                "n_chars",
                pa.array(
                    [None if t is None else len(t) for t in texts], pa.int64()
                ),
            ),
        ],
    )

    # embeddings: contract-conformant (non-null float[64]) but hostile
    # values — zero vector, duplicate vectors, one-hot, huge/tiny magnitudes,
    # a singleton label, one NULL label
    n_emb = 60
    vecs = []
    for k in range(n_emb):
        if k == 0:
            v = [0.0] * 64  # zero vector: norm 0, cosine denominator 0
        elif k in (1, 2):
            v = [0.1] * 64  # exact duplicates of each other
        elif k == 3:
            v = [0.0] * 63 + [1.0]  # one-hot
        elif k == 4:
            v = [1e3] * 64  # huge vs N(0,0.1) peers, but ULP-safe in sums
        elif k == 5:
            v = [1e-10] * 64
        else:
            v = [rng.gauss(0, 0.1) for _ in range(64)]
        vecs.append([float(x) for x in v])
    _write(
        f"{out_dir}/embeddings.parquet",
        [
            ("vec_id", pa.array(list(range(n_emb)), pa.int64())),
            ("embedding", pa.array(vecs, pa.list_(pa.float32()))),
            (
                "label",
                pa.array(
                    [None if k == 59 else (9 if k == 58 else k % 9) for k in range(n_emb)],
                    pa.int32(),
                ),
            ),
        ],
    )
