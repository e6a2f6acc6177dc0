"""connected_components: pointer-doubling convergence guarantees.

Min-label propagation alone converges in O(diameter) rounds — a
diameter-30 chain (templated-spam near-dups at crawl scale are exactly
this shape) would silently mislabel under a 25-round cap.  Pointer
doubling makes it O(log diameter); these tests pin both the speed and
the loud-failure contract when the cap genuinely exhausts.
"""

from __future__ import annotations

import pytest

from cga_logs_to_kinesis_spark.operators.dedup import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_chain_diameter_30_fully_labeled(spark):
    # 0-1-2-...-30: one component, min label 0, diameter 30.  The
    # pre-doubling implementation needed 30 propagation rounds and
    # would return wrong labels for the far end under max_iters=25.
    chain = _edges(spark, [(i, i + 1) for i in range(30)])
    got = {r.doc: r.comp for r in connected_components(chain).collect()}
    assert got == {i: 0 for i in range(31)}


def test_chain_converges_in_log_rounds(spark):
    # log2(30) ~ 5; doubling + one-hop should land well inside 8
    # rounds.  If this raises, the doubling step regressed to linear.
    chain = _edges(spark, [(i, i + 1) for i in range(30)])
    got = {r.doc: r.comp
           for r in connected_components(chain, max_iters=8).collect()}
    assert got == {i: 0 for i in range(31)}


def test_disjoint_components_and_offsets(spark):
    # two components with interleaved ids: {1,3,5,7} chained and
    # {2,4,6} chained — labels must be each component's min, never
    # bleed across.
    e = _edges(spark, [(1, 3), (3, 5), (5, 7), (2, 4), (4, 6)])
    got = {r.doc: r.comp for r in connected_components(e).collect()}
    assert got == {1: 1, 3: 1, 5: 1, 7: 1, 2: 2, 4: 2, 6: 2}


def test_ring_collapses_to_min(spark):
    ring = _edges(spark, [(i, (i + 1) % 12) for i in range(12)])
    got = {r.doc: r.comp for r in connected_components(ring).collect()}
    assert got == {i: 0 for i in range(12)}


def test_exhausted_iterations_raise_loudly(spark):
    # A too-small cap must RAISE, not return partial labels — silent
    # mislabeling corrupts every downstream survivor/repair table.
    chain = _edges(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=1)
