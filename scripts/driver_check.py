"""Run queries through the driver-canon replica: Spark vs DuckDB oracle.

Usage: python scripts/driver_check.py [query ...]    (default: all oracled)
Env:   SPARK_GRAFT_ORACLE_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import duckdb  # noqa: E402

from driver_canon import compare, spark_to_pandas  # noqa: E402
from spark_kinesis_sql_asl_spark.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)
from spark_kinesis_sql_asl_spark.session import get_session  # noqa: E402
from spark_kinesis_sql_asl_spark.tables import TABLES  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    queries = all_queries()
    oracles = all_oracles()
    names = sys.argv[1:] or [n for n in queries if n in oracles]

    spark = get_session("driver-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    for name in names:
        if name not in oracles:
            print(f"SKIP  {name} (no oracle)")
            continue
        try:
            s_pdf = spark_to_pandas(queries[name](spark, sf_dir))
            d_pdf = con.execute(oracles[name]).df()
            problems = compare(s_pdf, d_pdf)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL  {name}")
            for p in problems[:3]:
                print(f"      {p}")
        else:
            print(f"ok    {name}")
    print(f"\n{len(names) - n_fail}/{len(names)} driver-canon green")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
