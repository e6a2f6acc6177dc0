"""Bounded-global-window inventory (r14 verdict #5).

A Window with no partition spec funnels its whole input through ONE
task — fine above a bounded subtree (a top-k list, a decile curve, a
per-source weight table), fatal above anything corpus-sized.  The full
sweeps show "No Partition Defined for Window" warnings that were
adjudicated by eyeball each round; this test closes the class
mechanically:

* the SET of registry queries containing a partition-less Window is
  pinned — a new one failing here must either partition the window or
  be added to the allowlist with its boundedness argument;
* for every allowed query, each global window's CHILD subtree is
  materialized directly (Dataset.ofRows on the optimized child plan)
  and its cardinality asserted tiny — the subtree really is bounded,
  not just believed to be.
"""

from __future__ import annotations

import pytest

from cga_logs_to_kinesis_spark.registry import all_queries

SF_SMOKE = "/root/testdata/sf0.001"

# query -> (n global windows, max input rows at SF_SMOKE).  Bounds are
# corpus-size-INDEPENDENT by construction, which is the adjudication:
#   share_of_total        - input grouped by return-flag (|domain| ~ 3)
#   vocab_coverage        - top-k vocabulary list (LIMIT upstream)
#   bm25_topk             - top-k scored docs (LIMIT upstream)
#   dedup_threshold_sweep - one row per threshold in the sweep grid
#   mixture_weights       - one row per source (curated dimension)
#   mixture_apply         - same per-source fold (rates table)
#   novelty_curve         - 10 decile rows
#   cluster_mixture       - one row per k-means cluster (k = 8)
ALLOWED: dict[str, tuple[int, int]] = {
    "share_of_total": (1, 8),
    "vocab_coverage": (1, 40),
    "bm25_topk": (1, 12),
    "dedup_threshold_sweep": (1, 8),
    "mixture_weights": (1, 24),
    "mixture_apply": (1, 24),
    "novelty_curve": (1, 12),
    "cluster_mixture": (1, 8),
}


def _global_window_children(df):
    """Optimized-plan walk: the child node of every Window whose
    partitionSpec is empty.  (Window nodes in this repo live in the
    main tree, never inside subquery expressions — the walk follows
    children() only.)"""
    out = []

    def walk(node):
        if node.getClass().getSimpleName() == "Window" \
                and node.partitionSpec().size() == 0:
            out.append(node.child())
        cs = node.children()
        for i in range(cs.length()):
            walk(cs.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def test_global_window_inventory_is_closed(spark):
    """No registry query outside ALLOWED may plan a partition-less
    Window, and the allowed ones must have exactly the pinned count."""
    found: dict[str, int] = {}
    for name, spec in all_queries().items():
        n = len(_global_window_children(spec.fn(spark, SF_SMOKE)))
        if n:
            found[name] = n
    assert found == {k: v[0] for k, v in ALLOWED.items()}, (
        "global-window inventory drifted: a new partition-less Window "
        "must be re-partitioned or adjudicated into ALLOWED with a "
        "boundedness argument")


@pytest.mark.parametrize("name", sorted(ALLOWED))
def test_global_window_inputs_are_bounded(spark, name):
    """Materialize each allowed global window's child subtree and
    assert the single-task input really is tiny."""
    jvm = spark._jvm
    df = all_queries()[name].fn(spark, SF_SMOKE)
    children = _global_window_children(df)
    assert len(children) == ALLOWED[name][0]
    for child in children:
        jds = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, child)
        n = jds.count()
        assert n <= ALLOWED[name][1], (
            f"{name}: global window input {n} rows exceeds the "
            f"adjudicated bound {ALLOWED[name][1]}")
