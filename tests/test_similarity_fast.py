"""The vectorized similarity fast path must agree with the exact
operator on the retrieved neighbor sets (values may differ in ULPs)."""

from __future__ import annotations

from cga_logs_to_kinesis_spark.registry import all_queries
from tests.conftest import SF_SMOKE

SPECS = all_queries()


def test_fast_topk_matches_exact_neighbors(spark):
    exact = SPECS["cosine_topk"].fn(spark, SF_SMOKE).collect()
    fast = SPECS["cosine_topk_fast"].fn(spark, SF_SMOKE).collect()

    def neighbor_sets(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.cand_id)
        return out

    e, f = neighbor_sets(exact), neighbor_sets(fast)
    assert e.keys() == f.keys()
    for qid in e:
        assert e[qid] == f[qid], f"neighbor set mismatch for {qid}"
    # cosine values agree to float tolerance
    e_vals = {(r.query_id, r.cand_id): r.cosine for r in exact}
    for r in fast:
        assert abs(e_vals[(r.query_id, r.cand_id)] - r.cosine) < 1e-9


def test_fast_topk_rejects_oversized_query_set(spark, monkeypatch):
    """The fast path collects the query set to the driver; an
    unbounded query side must fail loudly, not OOM the driver."""
    import pytest

    from cga_logs_to_kinesis_spark.operators import similarity
    from cga_logs_to_kinesis_spark.operators.similarity import (
        cosine_topk_fast, load_table, tune_session)

    tune_session(spark)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    monkeypatch.setattr(similarity, "MAX_FAST_QUERIES", 3)
    with pytest.raises(ValueError, match="query set exceeds"):
        cosine_topk_fast(emb, emb.limit(10), k=2).collect()


def test_vectorized_buckets_match_jvm_fold(spark):
    """The Arrow-vectorized bucketing must agree bucket-for-bucket
    with the pure-JVM fold (the oracle spec form) — its sequential
    per-dimension accumulation is designed to be bit-identical, and
    this pins it."""
    from cga_logs_to_kinesis_spark.operators.similarity import (
        load_table, lsh_table_buckets, lsh_table_buckets_vec,
        tune_session)

    tune_session(spark)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    jvm = {r.vec_id: r.b for r in
           emb.select("vec_id",
                      lsh_table_buckets("embedding").alias("b")).collect()}
    vec = {r.vec_id: r.b for r in
           emb.select("vec_id",
                      lsh_table_buckets_vec("embedding").alias("b"))
           .collect()}
    assert jvm == vec


def test_lsh_recall_vs_exact(spark):
    """ANN recall is measured, not guessed: the LSH variant must
    retrieve a reasonable fraction of the true top-5."""
    exact = SPECS["cosine_topk"].fn(spark, SF_SMOKE).collect()
    ann = SPECS["cosine_topk_lsh"].fn(spark, SF_SMOKE).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.cand_id)
    for r in ann:
        got.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.3, f"LSH recall {hits}/{total} too low"


def test_ivf_recall_vs_exact(spark):
    """IVF ANN recall vs brute force: nprobe=2 of 8 clusters must
    still retrieve a reasonable fraction of the true top-5."""
    exact = SPECS["cosine_topk"].fn(spark, SF_SMOKE).collect()
    ann = SPECS["cosine_topk_ivf"].fn(spark, SF_SMOKE).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.cand_id)
    for r in ann:
        got.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.3, f"IVF recall {hits}/{total} too low"
