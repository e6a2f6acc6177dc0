"""Physical-plan inspection helpers.

Tests use these to assert scale-relevant plan properties — that a
filter reached the parquet scan (predicate pushdown), that a projection
pruned the read schema, that a dimension join is broadcast rather than
shuffled, and that expressions stay inside whole-stage codegen.  These
are the properties that decide whether a plan survives a 100x scale-up,
so they are asserted in CI, not eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears in the scan's PushedFilters list."""
    plan = formatted_plan(df)
    pushed = "".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    return all(frag in pushed for frag in fragments)


def scan_read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names in each parquet scan's ReadSchema (pruning check)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen regions in the plan."""
    ids = re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))
    return len(set(ids))
