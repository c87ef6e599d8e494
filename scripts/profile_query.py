#!/usr/bin/env python
"""Round-14 optimization tooling: run queries bench-style (noop sink) with
the UI enabled and dump per-job wall times + per-stage task metrics from
the Spark REST API, so optimization targets the stage that actually costs.

Usage: python scripts/profile_query.py q_name [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_UI", "1")

from pyspark.sql import SparkSession  # noqa: E402

from spark_kinesis_sql_asl_spark.registry import all_queries  # noqa: E402


def get_ui_session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .getOrCreate()
    )


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4055/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_ui_session()
    queries = all_queries()
    app_id = spark.sparkContext.applicationId

    # warm like bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    for name in sys.argv[1:]:
        jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [
            j
            for j in _api(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        print(f"\n=== {name}: total {total:.2f}s (build {t_build:.2f}s, {len(jobs)} jobs)")
        stage_rows = []
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            sub = time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
            try:
                done = time.mktime(time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                dur = done - sub
            except (KeyError, ValueError):
                dur = -1
            print(
                f"  job {j['jobId']:4d} {dur:6.0f}s tasks={j['numCompletedTasks']:4d} {j.get('description', '')[:60]}"
            )
            stage_rows.extend(j["stageIds"])
        stages = _api(f"applications/{app_id}/stages?status=complete")
        mine = [s for s in stages if s["stageId"] in set(stage_rows)]
        mine.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print("  top stages by executorRunTime:")
        for s in mine[:12]:
            print(
                f"    stage {s['stageId']:4d} run={s['executorRunTime']/1000.0:7.1f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:7.1f}s tasks={s['numCompleteTasks']:4d} "
                f"in={s.get('inputBytes', 0)>>20}MB sh_r={s.get('shuffleReadBytes', 0)>>20}MB "
                f"sh_w={s.get('shuffleWriteBytes', 0)>>20}MB  {s['name'][:50]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
