"""Shared pytest fixtures + the DuckDB cross-check helper.

``assert_matches_oracle`` mirrors the driver's t2 gate (row-count + schema +
order-insensitive value comparison, SURVEY.md §5.2): nothing is declared in
``queries()`` until it passes here at sf0.01.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import pytest

from spark_kinesis_sql_asl_spark.session import get_session
from spark_kinesis_sql_asl_spark.tables import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


def duck_relation(con: duckdb.DuckDBPyConnection, sql: str, sf_dir: str):
    """Run oracle SQL with the 10 fixture views registered, like the driver."""
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql)


def _cell(v) -> str:
    """Canonicalize one value to a comparison string."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == 0.0:
            v = 0.0  # -0.0 → 0.0
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_cell(x)}" for k, x in sorted(v.items())) + "}"
    # numpy scalars and everything else
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return _cell(float(v))
        if isinstance(v, np.integer):
            return _cell(int(v))
        if isinstance(v, np.bool_):
            return _cell(bool(v))
        if isinstance(v, np.ndarray):
            return _cell(list(v))
    except ImportError:
        pass
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: columns sorted by name, then rows
    sorted — mirrors the driver's value-hash semantics."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(spark_df, ddb_con, oracle_sql: str, sf_dir: str = SF_ORACLE):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)

    cur = duck_relation(ddb_con, oracle_sql, sf_dir)
    d_cols = [c[0] for c in cur.description]
    d_rows = [tuple(r) for r in cur.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"schema mismatch:\n  spark : {sorted(s_cols)}\n  duckdb: {sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:5]
        cols_sorted = sorted(s_cols)
        msg = [f"value mismatch ({len(diffs)}+ differing rows); columns={cols_sorted}"]
        for i, a, b in diffs:
            msg.append(f"  row {i}:\n    spark : {a}\n    duckdb: {b}")
        raise AssertionError("\n".join(msg))


def sf_oracle_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_ORACLE)
