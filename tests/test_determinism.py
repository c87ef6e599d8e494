"""Determinism stress: every query new this round runs TWICE in
one session and must produce byte-identical canonical output.

Motivated by the C111 island-split bug: two window evaluations over a
non-total sort order let tied rows swap between them, so a query could be
driver-green on one run and wrong on the next — the nastiest failure class
because every single-run gate (oracle tests, driver canon, bench) can pass
on the lucky draw. A double-run hash check at sf0.001 is cheap and turns
"flaky wrong" into "red now".
"""

from __future__ import annotations

import pytest

from spark_kinesis_sql_asl_spark.registry import all_queries

from .driver_canon import canon_hash, spark_to_pandas
from .test_registry_rotation import (
    LAST_DRIVER_ROUND,
    REWIRED,
    ROUND14_NEW_THIS_ROUND,
    _rows_through,
)

SF = "/root/testdata/sf0.001"


def _never_sampled() -> set[str]:
    """Queries with no driver row in any committed CORRECTNESS artifact —
    recomputed, so a new @query joins this stress list automatically."""
    from spark_kinesis_sql_asl_spark import registry

    registry.load_all()
    return set(registry._QUERIES) - set(_rows_through(LAST_DRIVER_ROUND))


# Every query the driver is about to HASH for the first time this round:
# the never-sampled backlog (this round's additions by construction), the
# rewired tranche (new oracle or materially changed implementation, so
# the next hash is effectively a first), plus the staged additions. A
# driver-green-on-the-lucky-draw query is the failure class this file
# exists to catch, so stress exactly those rows.
_FIRST_SAMPLED_THIS_ROUND = sorted(
    ROUND14_NEW_THIS_ROUND | REWIRED | _never_sampled()
)


@pytest.mark.parametrize("name", _FIRST_SAMPLED_THIS_ROUND)
def test_double_run_is_identical(spark, name):
    q = all_queries()[name]
    h1 = canon_hash(spark_to_pandas(q(spark, SF)))
    h2 = canon_hash(spark_to_pandas(q(spark, SF)))
    assert h1 == h2, f"{name}: nondeterministic output across two runs"
