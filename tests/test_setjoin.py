"""setjoin_prefix: the EXACT set-similarity join.

The whole point of the operator is zero false negatives, so the tests
attack exactly that: a brute-force all-pairs reference over
adversarial corpora (heavy shared boilerplate — the shape where
prefix filtering earns or loses its guarantee), plus plan pins for
the scale properties (column pruning, no cartesian candidates,
join-not-collect candidate generation).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cga_logs_to_kinesis_spark.operators.dedup import SHINGLE_K
from cga_logs_to_kinesis_spark.operators.setjoin import (
    SETJOIN_TDEN,
    SETJOIN_TNUM,
    setjoin_pairs,
)
from cga_logs_to_kinesis_spark.registry import all_queries
from tests.conftest import SF_SMOKE

SPECS = all_queries()


def _shingle_set(text: str | None) -> frozenset[str]:
    if text is None:
        return frozenset()
    toks = re.sub(r"[ \t\n\x0B\f\r]+", " ", text.strip()).lower().split(" ")
    if len(toks) < SHINGLE_K:
        return frozenset()
    return frozenset(
        " ".join(toks[i:i + SHINGLE_K])
        for i in range(len(toks) - SHINGLE_K + 1))


def brute_force_pairs(docs: list[tuple[int, str | None]]):
    """All-pairs word-shingle Jaccard >= TNUM/TDEN, exact integers."""
    sets = {i: s for i, s in ((i, _shingle_set(t)) for i, t in docs) if s}
    out = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * SETJOIN_TDEN >= union * SETJOIN_TNUM:
                out[(a, b)] = (inter, union)
    return out


# Sentences built from a tiny phrase pool so hypothesis reliably
# produces near-dup pairs AND hot boilerplate shared by most docs —
# the adversarial prefix-key-skew shape the module docstring calls
# out.  Shingle granularity: SHINGLE_K-word windows, so overlapping
# phrase reuse creates partial (not just all-or-nothing) overlap.
_PHRASES = st.sampled_from([
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox leaps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "all rights reserved contact us terms of service",
    "short",
    "",
])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.one_of(st.none(),
                          st.lists(_PHRASES, min_size=0, max_size=3)),
                min_size=2, max_size=20))
def test_setjoin_matches_brute_force(spark, doc_phrases):
    docs = [(i, None if ps is None else " ".join(ps))
            for i, ps in enumerate(doc_phrases)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): (r.n_inter, r.n_union)
           for r in setjoin_pairs(sdf).collect()}
    assert got == brute_force_pairs(docs)


def test_setjoin_finds_lsh_misses(spark):
    """A pair at Jaccard exactly the threshold must appear — no
    banding luck involved (the property LSH members cannot promise)."""
    # 4 tokens -> 2 shingles each; sharing 2 of 3 distinct shingles
    # needs overlap; construct J == 1/2: sets {ab,bc} and {bc,cd}
    # share 1 of 3 -> 1/3 < 1/2; use {ab,bc,cd} vs {bc,cd,de}:
    # inter 2, union 4 -> exactly 1/2.
    a = "a b c d e"      # shingles: abc bcd cde
    b = "b c d e f"      # shingles: bcd cde def  -> inter 2, union 4
    sdf = spark.createDataFrame([(1, a), (2, b)],
                                "doc_id long, text string")
    rows = setjoin_pairs(sdf).collect()
    assert [(r.doc_a, r.doc_b, r.n_inter, r.n_union)
            for r in rows] == [(1, 2, 2, 4)]
    assert abs(rows[0].jaccard - 0.5) == 0.0


def test_setjoin_plan_properties(spark):
    """Scale pins: the scan reads only (doc_id, text); candidates come
    from a join (never a per-bucket collect + explode); no cartesian
    product anywhere."""
    from cga_logs_to_kinesis_spark.plans import (
        formatted_plan,
        scan_read_schema_columns,
    )

    df = SPECS["setjoin_prefix"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "collect_list(doc_id" not in plan
    # The query's front is localCheckpointed (the scan runs eagerly,
    # so the final plan shows ExistingRDD) — assert pruning on the
    # front subtree itself.
    from cga_logs_to_kinesis_spark.operators.setjoin import (
        shingle_fp_sets,
    )
    from cga_logs_to_kinesis_spark.sources import load_table

    front = shingle_fp_sets(load_table(spark, SF_SMOKE, "documents"))
    scans = scan_read_schema_columns(front)
    assert scans and all(set(c) <= {"doc_id", "text"} for c in scans)


def test_lsh_recall_exact_consistent_with_parts(spark):
    """n_truth equals the exact join's own pair count; n_found never
    exceeds it; recall is their exact ratio."""
    row = SPECS["lsh_recall_exact"].fn(spark, SF_SMOKE).collect()[0]
    n_pairs = SPECS["setjoin_prefix"].fn(spark, SF_SMOKE).count()
    assert row.n_truth == n_pairs
    assert 0 <= row.n_found <= row.n_truth
    assert row.recall == row.n_found / row.n_truth


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.one_of(st.none(),
                          st.lists(_PHRASES, min_size=0, max_size=3)),
                min_size=2, max_size=20))
def test_setjoin_incremental_matches_brute_force(spark, doc_phrases):
    """The fp-order incremental form is exactly the cross-set subset
    of the brute-force pairs: batch docs (id % 4 == 3) against seen
    docs (id % 4 < 3), nothing more, nothing less."""
    from cga_logs_to_kinesis_spark.operators.setjoin import (
        setjoin_incremental,
        shingle_fp_sets,
    )

    docs = [(i, None if ps is None else " ".join(ps))
            for i, ps in enumerate(doc_phrases)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    sets = shingle_fp_sets(sdf).localCheckpoint()
    got = {(r.batch_doc, r.seen_doc): (r.n_inter, r.n_union)
           for r in setjoin_incremental(
               sets.filter("doc_id % 4 < 3"),
               sets.filter("doc_id % 4 = 3")).collect()}
    want = {}
    for (a, b), iu in brute_force_pairs(docs).items():
        for batch, seen in ((a, b), (b, a)):
            if batch % 4 == 3 and seen % 4 < 3:
                want[(batch, seen)] = iu
    assert got == want


def test_setjoin_incremental_reads_pre_pos_index(spark):
    """Store migration (r19): an index persisted BEFORE the
    positional-filter column exists (doc_id, n, fp — no pos) must
    still be readable and produce byte-identical results — the
    operator treats missing pos as 1, the loosest sound bound, so
    migration costs pruning, never correctness."""
    from cga_logs_to_kinesis_spark.operators.setjoin import (
        prefix_entries,
        setjoin_incremental_from_index,
        shingle_fp_sets,
    )

    docs = [(i, t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog tonight",
        "a b c d e f g h i j", "completely different text here now",
        "the quick brown fox jumps over the lazy dog today",
        "b c d e f g h i j k"])]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    sets = shingle_fp_sets(sdf).localCheckpoint()
    seen = sets.filter("doc_id % 2 = 0")
    batch = sets.filter("doc_id % 2 = 1")
    new_idx = prefix_entries(seen)
    assert set(new_idx.columns) == {"doc_id", "n", "pos", "fp"}
    old_idx = new_idx.drop("pos")          # the pre-r19 store schema
    key = ["batch_doc", "seen_doc", "n_inter", "n_union", "jaccard"]
    got_new = sorted(tuple(r[k] for k in key) for r in
                     setjoin_incremental_from_index(
                         new_idx, seen, batch).collect())
    got_old = sorted(tuple(r[k] for k in key) for r in
                     setjoin_incremental_from_index(
                         old_idx, seen, batch).collect())
    assert got_new == got_old and got_new  # non-vacuous: pairs exist


def test_lsh_recall_curve_bands_and_consistency(spark, tmp_path):
    """On a corpus with pairs at different Jaccard levels the curve
    separates them into the right decile bands, every band's
    n_found <= n_truth, and the bands sum to lsh_recall_exact's
    totals."""
    from cga_logs_to_kinesis_spark.operators.setjoin import (
        q_lsh_recall_curve,
        setjoin_pairs,
    )
    import math
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # pair 1: identical docs -> J = 1.0 (band 9)
    # pair 2: J = 2/4 = 0.5  (band 5) — the construction from
    # test_setjoin_finds_lsh_misses
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (10, "a b c d e"),
        (11, "b c d e f"),
        (20, "entirely different words with no overlap at all here"),
    ]
    d = {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows],
         "lang": ["en"] * len(rows), "source": ["s"] * len(rows),
         "n_chars": [len(r[1]) for r in rows]}
    tmp = str(tmp_path / "recall_curve")
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.table(d), f"{tmp}/documents.parquet")

    curve = {r.jband: (r.n_truth, r.n_found, r.recall)
             for r in q_lsh_recall_curve(spark, tmp).collect()}
    assert set(curve) == {5, 9}
    assert curve[9][0] == 1 and curve[5][0] == 1
    for nt, nf, rec in curve.values():
        assert 0 <= nf <= nt
        assert rec == nf / nt or (math.isnan(rec) if nt == 0 else False)
    # identical docs share every band bucket -> always found
    assert curve[9][1] == 1
    # totals agree with the whole-corpus truth
    n_pairs = setjoin_pairs(
        spark.read.parquet(f"{tmp}/documents.parquet")).count()
    assert sum(nt for nt, _, _ in curve.values()) == n_pairs == 2
