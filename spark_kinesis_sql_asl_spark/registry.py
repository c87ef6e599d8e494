"""Query registry: the single source of truth behind ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers itself with the :func:`query`
decorator, pairing the PySpark implementation with its DuckDB oracle SQL
(or ``oracle=None`` for rows-only checks such as approximate operators).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries at import time.
_MODULES = (
    "operators.scans",
    "operators.filters",
    "operators.joins",
    "operators.aggregates",
    "operators.windows",
    "operators.sorts_sets",
    "functions.strings",
    "functions.datetime_math",
    "functions.nested",
    "functions.udfs",
    "streaming.windows",
    "sources.kinesis_queries",
    "llm.dedup",
    "llm.similarity",
    "llm.text",
    "llm.multimodal",
    "llm.pipeline",
)

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        try:
            importlib.import_module(f"{__package__}.{mod}")
        except ModuleNotFoundError as e:
            # Tolerate not-yet-written modules during incremental build, but
            # re-raise genuine import errors inside existing modules.
            if e.name and e.name.startswith(__package__):
                continue
            raise
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(_ORACLES)
