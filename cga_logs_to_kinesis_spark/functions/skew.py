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
