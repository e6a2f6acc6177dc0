"""split_leakage / split_repair: the diagnose-and-fix pair for
near-dup contamination across train/val/test.  The oracle sweep
checks values; these tests check the SEMANTIC contract — the repair
actually eliminates the leakage the diagnostic reports."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def test_repair_eliminates_all_leakage(spark):
    """After the repair, no verified near-dup pair may straddle
    splits: joining the pair table to the repaired assignment must
    find zero pairs with differing repaired splits — while the
    ORIGINAL assignment provably had some (otherwise this test is
    vacuous)."""
    from cga_logs_to_kinesis_spark.operators.dedup import (
        JACCARD_EDGE_THRESHOLD,
        minhash_candidates,
    )
    from cga_logs_to_kinesis_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = (minhash_candidates(docs)
             .filter(F.col("jaccard") >= JACCARD_EDGE_THRESHOLD)
             .select("doc_a", "doc_b"))
    repaired = all_queries()["split_repair"].fn(spark, SF_SMOKE) \
        .select("doc_id", "original_split", "repaired_split")
    a = repaired.select(F.col("doc_id").alias("doc_a"),
                        F.col("original_split").alias("orig_a"),
                        F.col("repaired_split").alias("rep_a"))
    b = repaired.select(F.col("doc_id").alias("doc_b"),
                        F.col("original_split").alias("orig_b"),
                        F.col("repaired_split").alias("rep_b"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    assert joined.filter(F.col("orig_a") != F.col("orig_b")).count() > 0
    assert joined.filter(F.col("rep_a") != F.col("rep_b")).count() == 0


def test_leakage_report_consistent_with_repair_moves(spark):
    """Every changed row in the repair belongs to a component with a
    cross-split pair, and singletons never change split."""
    repaired = all_queries()["split_repair"].fn(spark, SF_SMOKE)
    singles = repaired.filter(F.col("doc_id") == F.col("component"))
    assert singles.filter(F.col("changed")).count() == 0
    leak = all_queries()["split_leakage"].fn(spark, SF_SMOKE)
    n_leak_pairs = sum(r.n_pairs for r in leak.collect() if r.is_leak)
    n_changed = repaired.filter(F.col("changed")).count()
    assert (n_leak_pairs > 0) == (n_changed > 0)
