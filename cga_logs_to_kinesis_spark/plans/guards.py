"""Double-evaluation contract enforcement.

Several operators evaluate their input frame TWICE by construction —
:func:`~cga_logs_to_kinesis_spark.functions.buckets.bucket_bounded`
(count fold + probe side) and
:func:`~cga_logs_to_kinesis_spark.operators.line_dedup.scrub_with_fps`
(line explode + final per-doc join).  For a plain scan that is two
cheap re-reads; for a computed subtree (a join, an aggregate, an
explode) it silently doubles the most expensive part of the plan.  The
contract used to be docstring-only ("pass a localCheckpoint'ed frame");
r14 verdict #3 asked for enforcement: a computed front passed
un-checkpointed must either auto-materialize or fail loudly.

:func:`cheap_front` does both — it localCheckpoints the offending
frame (so the caller is CORRECT and pays the recompute once) and emits
a :class:`DoubleEvaluationWarning` (so the caller learns to checkpoint
at the right boundary themselves; the guard's checkpoint materializes
the frame at an arbitrary point, which may be wider than the caller's
ideal cut).

Detection is structural, not cost-based: the optimized logical plan is
walked line-by-line for node types whose recompute is a shuffle, a
sort, or a fan-out.  Leaf-rooted plans — parquet relations under
Project/Filter, LogicalRDD (a checkpoint), LocalRelation — pass
through untouched, so store-backed readers keep their deliberate
re-scan behavior and no existing caller pays a new materialization.
"""

from __future__ import annotations

import re
import warnings

from pyspark.sql import DataFrame

# Node types whose re-evaluation is expensive (shuffle / sort /
# iteration / Python round-trip), matched at line start after the plan
# tree's drawing characters so a string literal inside an expression
# can never false-match.  Generate (explode) is deliberately NOT here:
# a row-local fan-out over a cheap subtree is the documented
# recompute-don't-materialize pattern (re-exploding from a checkpoint
# beats caching the exploded corpus — see scrub_with_fps and the
# simhash block explode), and an explode over an EXPENSIVE subtree
# still flags via the node beneath it.
_EXPENSIVE = (
    "Aggregate", "Join", "Window", "Expand", "Sort",
    "Deduplicate", "Intersect", "Except", "GlobalLimit",
    "Repartition", "RepartitionByExpression", "CoGroup", "MapGroups",
    "FlatMapGroupsInPandas", "MapInPandas",
)
_NODE_RE = re.compile(
    r"^[\s:+\-*(\d)]*(" + "|".join(_EXPENSIVE) + r")\b",
    re.MULTILINE)


class DoubleEvaluationWarning(UserWarning):
    """A frame that will be evaluated twice arrived un-checkpointed."""


def is_cheap_front(df: DataFrame) -> bool:
    """True when re-evaluating ``df`` costs only a leaf re-read plus
    row-local work (scan/LogicalRDD/LocalRelation under
    Project/Filter) — the shapes the double-evaluation operators may
    re-run freely."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return _NODE_RE.search(plan) is None


def cheap_front(df: DataFrame, caller: str) -> DataFrame:
    """Return ``df`` if it is cheap to re-evaluate, else a LAZY
    localCheckpoint of it — with a :class:`DoubleEvaluationWarning`
    naming ``caller`` so the cost is visible, not silent.

    ``eager=False`` matters: the guard fires during PLAN CONSTRUCTION
    (inside bucket_bounded / scrub_with_fps), and an eager checkpoint
    there would run a full Spark job — and pin its blocks in executor
    storage — for a caller that only wanted to inspect the plan
    (formatted_plan, the plan-test sweeps).  Lazy keeps plan building
    free; the materialization happens at the first real action, which
    is when the double-evaluation saving is actually needed."""
    if is_cheap_front(df):
        return df
    warnings.warn(
        f"{caller} evaluates its input twice, but the frame passed is "
        f"a computed subtree (join/aggregate/shuffle in its plan — "
        f"explode alone is exempt, the documented "
        f"recompute-don't-materialize pattern) — auto-materializing "
        f"with a lazy localCheckpoint.  Checkpoint the frame yourself "
        f"at the narrowest boundary to choose what is cached.",
        DoubleEvaluationWarning, stacklevel=3)
    return df.localCheckpoint(eager=False)
