"""Bucket-size bounding without a window — the hot-bucket cap shape.

Every LSH-family candidate generator needs "rows whose bucket has
between lo and hi members": below lo a bucket can't produce pairs,
above hi it is degenerate boilerplate whose O(n²) expansion must be
dropped wholesale.  The obvious ``count().over(Window.partitionBy(
bucket))`` computes that in one pass — but a partition-only WindowExec
has NO map-side partial aggregation: every row of a hot bucket ships
to that bucket's single reducer and is sorted there, which is exactly
the skew collapse the cap exists to prevent (a boilerplate band
signature at 100 TB puts a large corpus fraction in ONE bucket, so
the cap's own computation becomes the straggler/OOM).

:func:`bucket_bounded` computes the same filter as a partial-agg
groupBy + equi-join instead:

* the count fold collapses a hot bucket to ONE row per map partition
  before its exchange (combiner-friendly — shuffle volume is
  |distinct buckets|, skew-immune);
* the build side after the [lo, hi] filter carries only QUALIFYING
  buckets — the degenerate bucket never reaches the join build;
* the probe is a plain equi-join, which AQE's skew-join splitting can
  carve across tasks — WindowExec has no such rescue.

``df`` appears on both sides (the count fold and the probe), so it is
evaluated twice.  The contract is ENFORCED, not just documented (r14
verdict #3): a computed subtree passed un-checkpointed is
auto-materialized by :func:`~cga_logs_to_kinesis_spark.plans.guards.
cheap_front` with a loud DoubleEvaluationWarning; scan-rooted and
already-checkpointed frames pass through untouched (store-backed
reads keep their deliberate re-scan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_bounded(df: DataFrame, keys: Sequence[str],
                   lo: int | None = None,
                   hi: int | None = None) -> DataFrame:
    """Rows of ``df`` whose ``keys`` bucket size n satisfies
    ``lo <= n <= hi`` (either bound optional), same columns out.

    Join strategy follows which bucket list is SMALL:

    * ``lo`` set (the pair-generator callers use ``lo=2``): the
      qualifying list is only collision buckets — a sliver of all
      buckets under realistic LSH skew — so the inner join's build
      side is tiny and AQE broadcast-converts it.
    * ``hi`` only (the index-cap callers): qualifying ≈ ALL distinct
      buckets (unbroadcastable at scale), but the EXCLUDED list is
      bounded by n_rows/hi regardless of skew — so anti-join against
      the over-cap buckets instead.  AQE sizes the tiny build side at
      runtime and typically broadcasts it, skipping the probe-side
      exchange entirely (r13 verdict next-#2).

    ``df`` is enforced cheap-to-re-evaluate (module docstring): a
    computed front is auto-checkpointed with a warning.

    NULL bucket keys: rows with a NULL in any key column are DROPPED
    on every path.  The lo/both path does this implicitly (an inner
    equi-join never matches NULL); the hi-only path must do it
    explicitly, because its LEFT ANTI join KEEPS non-matching rows —
    without the filter the two paths would disagree on nullable keys
    (r14 advice).  The semantics are right as well as consistent: a
    NULL bucket is "no bucket" — it can't form candidate pairs, so no
    caller wants those rows.
    """
    from cga_logs_to_kinesis_spark.plans.guards import cheap_front

    df = cheap_front(df, "bucket_bounded")
    counts = df.groupBy(*keys).agg(F.count("*").alias("_bn"))
    if lo is None and hi is not None:
        bad = counts.filter(F.col("_bn") > hi)
        keyed = df
        for k in keys:
            keyed = keyed.filter(F.col(k).isNotNull())
        return keyed.join(bad.select(*keys), list(keys), "left_anti")
    cond = None
    if lo is not None:
        cond = F.col("_bn") >= lo
    if hi is not None:
        c = F.col("_bn") <= hi
        cond = c if cond is None else (cond & c)
    if cond is not None:
        counts = counts.filter(cond)
    return df.join(counts.select(*keys), list(keys)).select(df.columns)
