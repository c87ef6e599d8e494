"""B68: arbitrary stateful streaming operators, API-adaptive.

PySpark ships two arbitrary-stateful APIs:

- ``transformWithStateInPandas`` (PySpark 4 ``StatefulProcessor``): the
  modern path — typed state variables (ValueState/ListState/MapState),
  timers, TTL, and RocksDB state-store support. Its Python worker speaks a
  protobuf state-server protocol, so it requires the ``google.protobuf``
  pip package at runtime.
- ``applyInPandasWithState`` (legacy ``GroupState``): no extra runtime
  dependency; tuple-typed state only.

``running_count`` exposes ONE operator semantics — per-key monotone running
event count, emitted once per key per micro-batch — and picks the best
available engine path at call time. On a production cluster with protobuf
installed it runs the modern API (RocksDB-friendly, timer-capable); in a
minimal container it degrades to the legacy API with bit-identical output.
The returned ``api`` string lets callers/tests record which path ran.

At 100 TB: state is partitioned by the grouping key across executors; both
APIs shuffle once on the key and then update state partition-locally. The
RocksDB provider (modern path) keeps per-executor state out of the JVM heap,
which is the difference between a 10 M-key and a 10 B-key keyspace.
"""

from __future__ import annotations

import pandas as pd

_OUT_SCHEMA = "user_id bigint, running_n bigint"


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _modern(grouped):
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState(
                "cnt", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self._cnt.get()[0] if self._cnt.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._cnt.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "running_n": [n]})

        def close(self) -> None:
            pass

    return grouped.transformWithStateInPandas(
        RunningCount(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def _legacy(grouped):
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def running(key, pdfs, state: GroupState):
        cnt = state.get[0] if state.exists else 0
        for pdf in pdfs:
            cnt += len(pdf)
        state.update((cnt,))
        yield pd.DataFrame({"user_id": [key[0]], "running_n": [cnt]})

    return grouped.applyInPandasWithState(
        running,
        outputStructType=_OUT_SCHEMA,
        stateStructType="cnt bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_count(stream_df, key_col: str = "user_id"):
    """Per-key running event count over a stream; returns ``(df, api)``.

    ``api`` is ``"transformWithStateInPandas"`` when the modern path ran,
    else ``"applyInPandasWithState"``.
    """
    grouped = stream_df.groupBy(key_col)
    if _protobuf_available():
        return _modern(grouped), "transformWithStateInPandas"
    return _legacy(grouped), "applyInPandasWithState"
