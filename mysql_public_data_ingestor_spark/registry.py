"""Central query registry backing ``__spark_entry__.py``.

Every implemented operator registers a named query:
  - ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
  - ``oracle`` — equivalent ANSI SQL for the DuckDB oracle (or ``None``
    for genuinely non-SQL-expressible ops → driver runs rows-only check).

Column names of the Spark result and the oracle result MUST match
(driver sorts columns by name then value-hashes). Aggregate/computed
doubles are rounded identically on both sides so FP summation order
cannot flip the hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module so its @register calls run."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        advanced,
        dedup,
        multimodal,
        pipeline,
        relational,
        similarity,
        text,
        tpch,
        windows,
    )
    from .streaming import batch_equivalents  # noqa: F401

    _LOADED = True
