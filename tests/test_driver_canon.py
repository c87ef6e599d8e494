"""The round-3 verification gate: every registered query through the
driver-canon replica (tests/driver_canon.py) on BOTH the real testdata and
the adversarial fixtures (tests/adversarial_fixtures.py).

Round 2's lesson: the pure-Python repr canon in conftest.py passed 8 queries
the driver failed, because the driver's pandas-based canonicalizer is
dtype-sensitive (int64 vs float64) and crashes on complex cells. This suite
closes that observability gap:

* ``test_driver_canon_testdata`` — Spark vs DuckDB through the strict
  pandas-shaped canon at sf0.001 (the sf0.01 sweep is
  ``scripts/driver_check.py``, run per-milestone; it covered all 120 oracled
  queries green before this round's registry freeze).
* ``test_driver_canon_adversarial`` — same comparison over synthesized
  hostile fixtures: NULLs, empty/duplicate texts, ORDER BY ties, boundary
  doubles, 7-day timestamp lattices. A query that is green on both datasets
  has no fixture-tuned behavior and no dtype/canon fragility left to find
  locally.
* Rows-only queries (no SQL oracle) still run Spark-side on both datasets
  and must produce canon-hashable (flat, driver-safe) output — the
  q_llm_fingerprint ERR class.
"""

from __future__ import annotations

import pytest

from spark_kinesis_sql_asl_spark.registry import all_oracles, all_queries
from spark_kinesis_sql_asl_spark.tables import TABLES

from .driver_canon import canon_hash, compare, spark_to_pandas

SF_SMOKE = "/root/testdata/sf0.001"

_QUERIES = all_queries()
_ORACLES = all_oracles()
_ORACLED = [n for n in _QUERIES if n in _ORACLES]
_ROWS_ONLY = [n for n in _QUERIES if n not in _ORACLES]


@pytest.fixture(scope="session")
def adv_dir(tmp_path_factory):
    from .adversarial_fixtures import write_adversarial

    d = tmp_path_factory.mktemp("adversarial")
    write_adversarial(str(d))
    return str(d)


def _duck_df(ddb, sql: str, sf_dir: str):
    for t in TABLES:
        ddb.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return ddb.execute(sql).df()


def _check(spark, ddb, name: str, sf_dir: str) -> None:
    s_pdf = spark_to_pandas(_QUERIES[name](spark, sf_dir))
    d_pdf = _duck_df(ddb, _ORACLES[name], sf_dir)
    problems = compare(s_pdf, d_pdf)
    assert not problems, f"{name} @ {sf_dir}:\n" + "\n".join(problems[:5])


# Round 15: the sf0.001 strict-canon sweep is slow-tier — its coverage is
# subsumed in the default tier by test_oracle's sf0.01 sweep (same queries,
# real data, conftest canon) plus test_driver_canon_adversarial (same
# strict pandas canon, hostile fixtures), which both stay default.
@pytest.mark.slow
@pytest.mark.parametrize("name", _ORACLED)
def test_driver_canon_testdata(spark, ddb, name):
    _check(spark, ddb, name, SF_SMOKE)


@pytest.mark.parametrize("name", _ORACLED)
def test_driver_canon_adversarial(spark, ddb, name, adv_dir):
    _check(spark, ddb, name, adv_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_output_is_driver_safe(spark, name, adv_dir):
    # No oracle — but the output must still survive the driver's pandas
    # canonicalizer on both datasets (flat hashable cells, stable schema).
    for sf_dir in (SF_SMOKE, adv_dir):
        pdf = spark_to_pandas(_QUERIES[name](spark, sf_dir))
        canon_hash(pdf)  # raises CanonError on driver-crashing output


# Oracle correctness can be SCALE-DEPENDENT: overlap between the exact- and
# near-dup drop sets (survivors), recursive-CTE convergence depth (cluster),
# and spine re-execution (recursive_spine) only exercise their edge cases
# once the corpus is big enough. The sf0.01 gate missed a DuckDB 1.0.0
# UNION-in-recursive-WITH dedup bug that sf0.1 exposed — so the slow tier
# runs the FULL oracled registry at sf0.1 (promoted from a 3-query
# scale-sensitive list in round 4; ~10 min, deselect with -m "not slow").
# Script equivalent:
# SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.1 python scripts/driver_check.py


@pytest.mark.slow
@pytest.mark.parametrize("name", _ORACLED)
def test_driver_canon_sf01(spark, ddb, name):
    _check(spark, ddb, name, "/root/testdata/sf0.1")
