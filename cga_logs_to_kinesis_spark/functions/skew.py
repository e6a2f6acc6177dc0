"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's runtime skew-join splitting (enabled in session.py) handles most
skew transparently; these explicit constructions cover the cases AQE
can't see — e.g. a hot key known in advance, or a skewed aggregation
where the two-phase salt spreads a single hot group across reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Join a skew-keyed big side to a small side by salting.

    The big side gets a random-ish (hash-derived, deterministic) salt
    in [0, n_salts); the small side is replicated n_salts times.  A hot
    key's rows then spread over n_salts reducers instead of one.  The
    small side grows n_salts x — use only when small is genuinely
    small and the key is genuinely hot.
    """
    salt = F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()),
                  F.lit(n_salts)).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg(df: DataFrame, key: str, aggs: list[Column],
               final_aggs: list[Column], n_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial-aggregate
    on (key, salt), then re-aggregate on key.  `aggs` runs in phase 1,
    `final_aggs` combines phase-1 columns in phase 2.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                  F.lit(n_salts))
    return (df.withColumn("_salt", salt)
            .groupBy(key, "_salt").agg(*aggs)
            .groupBy(key).agg(*final_aggs))


def replicate_hot(small: DataFrame, key: str,
                  hot_plan: DataFrame) -> DataFrame:
    """Small side of a plan-driven salted join: rows whose key appears
    in ``hot_plan`` (columns ``<key>``, ``salt_factor``) are replicated
    ``salt_factor`` times (one row per salt slice); every other row is
    kept EXACTLY once with salt 0.  The plan is broadcast — it is a
    top-N artifact from ``salted_join_plan``, never corpus-sized — so
    the cold side pays one broadcast-hash lookup and zero replication
    (pinned by tests/test_skew.py::test_replicate_hot_only_hot_keys).
    """
    plan = F.broadcast(hot_plan.select(key, "salt_factor"))
    # greatest(1, factor): sequence() supports DESCENDING ranges, so a
    # degenerate plan row with salt_factor <= 0 would silently emit
    # salts [0, -1, ...] and DUPLICATE the row instead of failing; the
    # clamp makes any factor < 2 behave as "not hot" (one salt-0 copy).
    return (small.join(plan, key, "left")
            .withColumn(
                "_salt",
                F.explode(F.sequence(
                    F.lit(0),
                    F.coalesce(
                        F.greatest(F.lit(1), F.col("salt_factor")) - 1,
                        F.lit(0)).cast("int"))))
            .drop("salt_factor"))


def salted_join_hot(big: DataFrame, small: DataFrame, key: str,
                    hot_plan: DataFrame, how: str = "inner") -> DataFrame:
    """Plan-driven salted join: the mitigation the ``salted_join_plan``
    query plans for.  Unlike :func:`salted_join` (which replicates the
    WHOLE small side n_salts x), only the diagnosed hot keys are
    replicated — per key, by its own ``salt_factor`` — so a 10x-hot
    key spreads over 10 reducers while the cold long tail shuffles
    exactly as an unsalted join would.  Big-side rows of a hot key get
    a deterministic hash-derived salt in [0, salt_factor); cold rows
    get salt 0 and meet the small side's single salt-0 copy.

    ``how`` must be ``inner`` or ``left`` (big side preserved): a
    right/full outer would emit each UNMATCHED small-side hot row once
    per salt replica — the replication is only invisible for rows the
    join keeps matched or drops.
    """
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "leftsemi", "left_semi", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join_hot supports inner/left joins only, got "
            f"{how!r}: outer-preserving the replicated small side "
            "would emit unmatched hot rows once per salt slice")
    plan = F.broadcast(hot_plan.select(key, "salt_factor"))
    big_s = (big.join(plan, key, "left")
             .withColumn(
                 "_salt",
                 F.when(F.col("salt_factor").isNull(), F.lit(0))
                 .otherwise(F.pmod(
                     F.xxhash64(F.col(key),
                                F.monotonically_increasing_id()),
                     F.col("salt_factor")).cast("int")))
             .drop("salt_factor"))
    out = big_s.join(replicate_hot(small, key, hot_plan),
                     [key, "_salt"], how)
    return out.drop("_salt")
