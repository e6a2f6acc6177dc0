"""Exact-substring dedup (Lee et al. n-gram formulation): planted
duplicated spans must be found at exact offsets, maximal (adjacent
duplicated grams merged), and nothing else reported."""

from __future__ import annotations

from cga_logs_to_kinesis_spark.operators.dedup import (
    SUBSTRING_L,
    duplicated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_span_found_at_exact_offsets(spark):
    """A 25-token passage shared by two docs (L=20) is exactly the
    maximal duplicated region: 6 duplicated grams merge into ONE span
    of length 25 at the planted 1-based start in each doc."""
    shared = _words("dup", 25)
    docs = _docs(spark, [
        (1, _words("a", 10) + " " + shared + " " + _words("b", 10)),
        (2, _words("c", 30) + " " + shared),
    ])
    spans = {r.doc_id: r for r in
             duplicated_spans(docs, spark, l=SUBSTRING_L).collect()}
    assert set(spans) == {1, 2}
    assert (spans[1].span_start, spans[1].span_len,
            spans[1].n_dup_grams) == (11, 25, 6)
    assert (spans[2].span_start, spans[2].span_len,
            spans[2].n_dup_grams) == (31, 25, 6)


def test_intra_document_repeat_detected(spark):
    """Lee et al.'s definition counts any repeat, including within one
    document: a doc containing the same 20-token run twice reports
    both occurrences (two islands — the copies are > L apart)."""
    run = _words("x", SUBSTRING_L)
    docs = _docs(spark, [
        (1, run + " " + _words("mid", 30) + " " + run),
    ])
    spans = sorted(duplicated_spans(docs, spark).collect(),
                   key=lambda r: r.span_start)
    assert [(r.span_start, r.span_len) for r in spans] == [
        (1, SUBSTRING_L), (SUBSTRING_L + 31, SUBSTRING_L)]


def test_unique_docs_report_nothing(spark):
    docs = _docs(spark, [
        (1, _words("p", 60)),
        (2, _words("q", 60)),
        (3, _words("r", SUBSTRING_L - 1)),   # shorter than L: no grams
    ])
    assert duplicated_spans(docs, spark).collect() == []


def test_overlapping_shared_regions_merge_into_one_maximal_span(spark):
    """A 40-token shared run yields 21 duplicated grams that must
    merge into one maximal span of 40, not a span per gram."""
    shared = _words("s", 40)
    docs = _docs(spark, [
        (1, shared + " " + _words("u", 5)),
        (2, _words("v", 5) + " " + shared),
    ])
    spans = {r.doc_id: r for r in
             duplicated_spans(docs, spark).collect()}
    assert (spans[1].span_start, spans[1].span_len,
            spans[1].n_dup_grams) == (1, 40, 21)
    assert (spans[2].span_start, spans[2].span_len,
            spans[2].n_dup_grams) == (6, 40, 21)


def test_apply_keeps_first_occurrence_strips_later_copies(spark):
    """Removal policy (Lee et al.): the first corpus occurrence of a
    duplicated span survives, every later copy is stripped, unique
    text is untouched."""
    from cga_logs_to_kinesis_spark.operators.dedup import (
        q_dedup_substring_apply,
    )

    shared = _words("dup", SUBSTRING_L)            # exactly one gram
    d1 = _words("a", 5) + " " + shared + " " + _words("b", 5)
    d2 = _words("c", 5) + " " + shared + " " + _words("d", 5)
    docs = _docs(spark, [(1, d1), (2, d2), (3, _words("e", 40))])
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        # reuse the registered query end-to-end against this corpus
        out = {r.doc_id: r for r in
               q_dedup_substring_apply(spark, td).collect()}
    # doc 1 holds the first occurrence: fully intact
    assert out[1].n_removed == 0
    assert out[1].dedup_text == d1
    # doc 2's copy is stripped, its unique flanks survive
    assert out[2].n_removed == SUBSTRING_L
    assert out[2].dedup_text == _words("c", 5) + " " + _words("d", 5)
    # untouched doc: identical
    assert out[3].n_removed == 0 and out[3].dedup_text == _words("e", 40)


def test_apply_intra_doc_repeat_keeps_first_copy(spark):
    from cga_logs_to_kinesis_spark.operators.dedup import (
        q_dedup_substring_apply,
    )

    run = _words("x", SUBSTRING_L)
    import os
    import tempfile
    docs = _docs(spark, [(1, run + " " + _words("mid", 30) + " " + run)])
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        [row] = q_dedup_substring_apply(spark, td).collect()
    assert row.n_removed == SUBSTRING_L
    assert row.dedup_text == run + " " + _words("mid", 30)


def test_substring_plan_shuffles_digests_not_text(spark):
    """The scale contract: both semantic exchanges (digest window,
    per-doc island window) carry only (doc_id, pos, digest) ints.
    The one exchange allowed to carry text is the explicit pre-explode
    fan-out repartition (the spark.cga.explode.parallelism knob,
    REPARTITION_BY_NUM) — text must never ride an ENSURE_REQUIREMENTS
    shuffle."""
    from cga_logs_to_kinesis_spark.plans import formatted_plan
    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["dedup_substring"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    # detail blocks: "(n) Exchange\nInput [...]: [...]\nArguments: ..."
    blocks = [b for b in plan.split("\n\n") if b.startswith("(")
              and ") Exchange" in b.split("\n")[0]]
    semantic = [b for b in blocks if "ENSURE_REQUIREMENTS" in b]
    assert len(semantic) == 2          # digest window + island window
    for b in semantic:
        assert "text#" not in b and "_toks#" not in b
    assert any("digest" in b for b in semantic)
