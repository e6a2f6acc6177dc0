"""Double-evaluation contract enforcement (r14 verdict #3).

``bucket_bounded`` and ``scrub_with_fps`` evaluate their input twice;
the contract used to be docstring-only.  These tests pin the guard:
a computed front arrives un-checkpointed -> auto-materialized with a
DoubleEvaluationWarning (correct results, cost paid once); cheap
fronts (scans, checkpoints, local relations, explode-over-checkpoint)
pass through silently so no existing caller gains a materialization.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.plans.guards import (
    DoubleEvaluationWarning,
    is_cheap_front,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _docs(spark):
    from cga_logs_to_kinesis_spark.sources import load_table
    return load_table(spark, SF_SMOKE, "documents")


def test_cheap_front_classification(spark):
    docs = _docs(spark)
    # leaf-rooted shapes: scan, scan+filter+project, local relation,
    # checkpoint, and explode-over-checkpoint are all cheap
    assert is_cheap_front(docs)
    assert is_cheap_front(
        docs.filter(F.col("doc_id") > 3).select("doc_id", "text"))
    assert is_cheap_front(
        spark.createDataFrame([(1, "a")], "k long, v string"))
    agg = docs.groupBy("source").agg(F.count("*").alias("n"))
    assert not is_cheap_front(agg)
    ck = agg.localCheckpoint()
    assert is_cheap_front(ck)
    assert is_cheap_front(
        docs.select("doc_id",
                    F.explode(F.split("text", " ")).alias("tok")))
    # ... but an explode over an expensive subtree still flags
    assert not is_cheap_front(
        ck.join(docs, "source")
        .select(F.explode(F.split("text", " "))))
    assert not is_cheap_front(docs.orderBy("doc_id"))
    assert not is_cheap_front(docs.repartition(64))


def test_bucket_bounded_guards_computed_front(spark):
    from cga_logs_to_kinesis_spark.functions.buckets import (
        bucket_bounded,
    )

    docs = _docs(spark)
    computed = (docs.join(docs.select(F.col("doc_id").alias("d2"),
                                      F.col("source").alias("s2")),
                          F.col("doc_id") == F.col("d2"))
                .select("doc_id", "source"))
    with pytest.warns(DoubleEvaluationWarning, match="bucket_bounded"):
        out = bucket_bounded(computed, ["source"], hi=10**6)
    # correctness unaffected by the auto-checkpoint
    assert out.count() == docs.count()


def test_bucket_bounded_silent_on_cheap_fronts(spark):
    from cga_logs_to_kinesis_spark.functions.buckets import (
        bucket_bounded,
    )

    docs = _docs(spark)
    ck = docs.groupBy("source").agg(
        F.count("*").alias("n")).localCheckpoint()
    with warnings.catch_warnings():
        warnings.simplefilter("error", DoubleEvaluationWarning)
        bucket_bounded(docs, ["source"], lo=1).count()
        bucket_bounded(ck, ["source"], hi=10**6).count()


def test_scrub_with_fps_guards_computed_front(spark):
    from cga_logs_to_kinesis_spark.operators.line_dedup import (
        boilerplate_fps,
        line_flat,
        poison_boilerplate,
        scrub_with_fps,
    )

    docs = _docs(spark)
    base_ck = (docs.select("doc_id",
                           F.col("text").alias("orig_text"),
                           poison_boilerplate().alias("text"))
               .localCheckpoint())
    fps = boilerplate_fps(line_flat(base_ck)).localCheckpoint()
    want = sorted(map(tuple, scrub_with_fps(base_ck, fps).collect()))

    # the same base as an UN-checkpointed computed subtree (a
    # self-join makes it expensive): guard fires, results identical
    computed = (docs.alias("l")
                .join(docs.select("doc_id").alias("r"), "doc_id")
                .select("doc_id", F.col("text").alias("orig_text"),
                        poison_boilerplate().alias("text")))
    with pytest.warns(DoubleEvaluationWarning, match="scrub_with_fps"):
        got = sorted(map(tuple, scrub_with_fps(computed, fps).collect()))
    assert got == want


def test_registry_dedup_family_never_trips_guard(spark):
    """Every in-repo caller checkpoints correctly (r14 verdict): the
    guard must stay silent across the bucket_bounded / scrub family —
    a trip here means a caller regressed to paying its front twice."""
    from cga_logs_to_kinesis_spark.registry import all_queries

    qs = all_queries()
    with warnings.catch_warnings():
        warnings.simplefilter("error", DoubleEvaluationWarning)
        for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard",
                     "dedup_simhash", "dedup_minhash_incremental",
                     "ann_incremental", "winnowing_fingerprints",
                     "line_dedup_scrub", "boilerplate_ratio_by_source",
                     "line_dedup_intra"):
            if name in qs:
                qs[name].fn(spark, SF_SMOKE).write.format("noop") \
                    .mode("overwrite").save()
