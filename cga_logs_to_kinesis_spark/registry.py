"""Query registry: every engine operator, bound to its DuckDB oracle.

Each :class:`QuerySpec` carries a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (when the semantics are ANSI-SQL-expressible) the
equivalent DuckDB SQL over the fixture views.  The driver contract
(``__spark_entry__.py``) and the local checker (``tools/check.py``)
both consume this registry, so adding an operator in one place wires it
into smoke, correctness, and bench.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None            # None → non-SQL-expressible (rows-only)
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side-effect: registration)."""
    from cga_logs_to_kinesis_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        pipeline_ops,
        relational,
        relational2,
        relational3,
        similarity,
        temporal,
        text,
        tpch_shapes,
    )
    return dict(_REGISTRY)
