"""Corpus-statistics quality operators: behavioral guarantees beyond
the DuckDB oracle hash (which tests/test_queries_oracle.py covers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.operators.corpus_quality import (
    WINNOW_K,
    WINNOW_W,
    winnow,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_shared_run_guarantee(spark):
    """The winnowing invariant (Schleimer et al. §3): any shared token
    run of length >= K+W-1 produces at least one shared fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"   # 6 >= 3+4-1
    docs = _docs(spark, [
        (1, f"one two {shared} three four five six"),
        (2, f"seven eight nine ten {shared} eleven twelve"),
    ])
    fps = winnow(docs).collect()
    s1 = {r.fingerprint for r in fps if r.doc_id == 1}
    s2 = {r.fingerprint for r in fps if r.doc_id == 2}
    assert s1 & s2, "shared 6-token run must share a fingerprint"


def test_winnowing_disjoint_docs_share_nothing(spark):
    docs = _docs(spark, [
        (1, "a1 b1 c1 d1 e1 f1 g1 h1 i1"),
        (2, "a2 b2 c2 d2 e2 f2 g2 h2 i2"),
    ])
    fps = winnow(docs).collect()
    s1 = {r.fingerprint for r in fps if r.doc_id == 1}
    s2 = {r.fingerprint for r in fps if r.doc_id == 2}
    assert s1 and s2 and not (s1 & s2)


def test_winnowing_short_doc_yields_nothing(spark):
    docs = _docs(spark, [(1, "only five little tokens here"),   # 5 < 6
                         (2, "a b c d e f")])                   # 6 == K+W-1
    out = winnow(docs).groupBy("doc_id").count().collect()
    by_id = {r.doc_id: r["count"] for r in out}
    assert 1 not in by_id            # no full window exists
    assert by_id.get(2, 0) >= 1      # exactly at the threshold: emits


def test_winnowing_density(spark):
    """Selection density ~2/(W+1): far fewer fingerprints than grams."""
    text = " ".join(f"tok{i}" for i in range(200))
    docs = _docs(spark, [(1, text)])
    n_fp = winnow(docs).count()
    n_grams = 200 - WINNOW_K + 1
    assert n_fp < n_grams / 2        # strictly sparser than 1-per-gram
    assert n_fp >= n_grams // (WINNOW_W * 2)   # but not degenerate


def test_prune_preserves_order_and_counts(spark, tmp_path):
    """Pruning keeps surviving-token order; n_kept+n_removed = n_toks.
    Run against the real fixture through the registered query."""
    from cga_logs_to_kinesis_spark.registry import all_queries

    out = all_queries()["prune_frequent_tokens"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out[:50]:
        assert r.n_kept == (len(r.pruned_text.split())
                            if r.pruned_text else 0)
        assert r.n_removed >= 0
    # something must actually have been pruned on this corpus (the
    # fixture filler vocabulary is heavily shared across docs)
    assert sum(r.n_removed for r in out) > 0


def test_unigram_rarity_orders_rare_above_common(spark, tmp_path):
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        q_unigram_rarity,
    )
    # Build a corpus where doc 1 is all common tokens and doc 2 has
    # rare ones; monkey-path via temp parquet + sf_dir layout.
    import os
    d = {"doc_id": [1, 2, 3, 4],
         "text": ["common common common",
                  "common common unique1",
                  "common common common",
                  "common common common"],
         "lang": ["en"] * 4, "source": ["s"] * 4,
         "n_chars": [20] * 4}
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(tmp := str(tmp_path / "rarity"), exist_ok=True)
    pq.write_table(pa.table(d), f"{tmp}/documents.parquet")
    rows = {r.doc_id: r.rarity_score
            for r in q_unigram_rarity(spark, tmp).collect()}
    assert rows[2] > rows[1]         # rare token lifts the mean


def _fixture_dir(spark, tmp_path, texts):
    """Write a minimal documents.parquet shaped like the fixtures."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = {"doc_id": list(range(1, len(texts) + 1)),
         "text": texts,
         "lang": ["en"] * len(texts),
         "source": ["s"] * len(texts),
         "n_chars": [len(t) for t in texts]}
    out = tmp_path / "mini"
    out.mkdir(exist_ok=True)
    pq.write_table(pa.table(d), str(out / "documents.parquet"))
    return str(out)


def test_bm25_terms_absent_from_corpus(spark, tmp_path):
    """Query terms that never occur must simply score nothing — no
    division blowups, no empty-join crashes."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        q_bm25_topk,
    )
    sf = _fixture_dir(spark, tmp_path,
                      ["nothing matches here", "nor here either"])
    assert q_bm25_topk(spark, sf).count() == 0


def test_bm25_partial_term_hits_rank_sanely(spark, tmp_path):
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        q_bm25_topk,
    )
    sf = _fixture_dir(spark, tmp_path, [
        "spark stream vector all three terms",      # hits 3
        "spark only once",                          # hits 1
        "unrelated text entirely",                  # hits 0
    ])
    rows = {r.doc_id: r for r in q_bm25_topk(spark, sf).collect()}
    assert set(rows) == {1, 2}                      # doc 3 absent
    assert rows[1].n_terms_hit == 3 and rows[2].n_terms_hit == 1
    assert rows[1].score > rows[2].score
    assert rows[1].rank == 1


def test_char_diversity_degenerate_docs(spark, tmp_path):
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        q_char_diversity,
    )
    sf = _fixture_dir(spark, tmp_path, [
        "aaaaaaaa",          # single repeated char -> diversity 0
        "abcdefgh",          # all distinct -> 1 - 8/64 = 0.875
    ])
    rows = {r.doc_id: r for r in q_char_diversity(spark, sf).collect()}
    assert rows[1].diversity == 0.0
    assert abs(rows[2].diversity - 0.875) < 1e-12


def test_prune_at_total_boilerplate(spark, tmp_path):
    """A token present in every doc gets pruned everywhere; a doc that
    was nothing but boilerplate survives as an empty rewrite, not a
    dropped row."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        q_prune_frequent_tokens,
    )
    sf = _fixture_dir(spark, tmp_path, [
        "footer unique1 words here",
        "footer unique2 other words",
        "footer",
    ])
    rows = {r.doc_id: r for r in
            q_prune_frequent_tokens(spark, sf).collect()}
    assert len(rows) == 3
    assert rows[3].pruned_text == "" and rows[3].n_kept == 0
    for r in rows.values():
        assert "footer" not in r.pruned_text.split()


def test_length_outliers_approx_bounds(spark):
    """The at-scale twin's contract vs the exact median/MAD gate:
    same languages and doc counts (counting is not sketched), sketch
    median/MAD within one neighboring length value (asserted as <=5%
    relative error — generous vs the ~1/accuracy rank error), and
    outlier counts flipping only at the K*MAD boundary (<=2% of the
    language's docs + slack)."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        q_length_outliers,
        q_length_outliers_approx,
    )
    from tests.conftest import SF_SMOKE

    exact = {r.lang: r for r in
             q_length_outliers(spark, SF_SMOKE).collect()}
    approx = {r.lang: r for r in
              q_length_outliers_approx(spark, SF_SMOKE).collect()}
    assert set(exact) == set(approx) and len(exact) > 0
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_docs == e.n_docs, lang
        assert abs(a.median_chars - e.median_chars) \
            <= 0.05 * max(e.median_chars, 1.0), lang
        assert abs(a.mad_chars - e.mad_chars) \
            <= 0.05 * max(e.mad_chars, 1.0), lang
        assert abs(a.n_outliers - e.n_outliers) \
            <= 0.02 * e.n_docs + 2, lang
