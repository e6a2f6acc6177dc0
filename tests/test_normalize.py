"""Normalization / weighted-sampling operator contracts.

The fixture text is already canonical, so the oracle sweep alone
can't prove the regex pipeline handles dirty input: these tests feed
adversarial strings (tabs, CRs, unicode, punctuation runs) through
BOTH engines and require byte-identical output — the cross-engine
parity the oracle gives real queries, applied to edge inputs.
"""

from __future__ import annotations

import duckdb
import pytest

from cga_logs_to_kinesis_spark.operators.normalize import (
    NORMALIZE_SQL,
    normalize_text,
)
from pyspark.sql import functions as F

NASTY = [
    "Hello,   World!!",
    "tabs\tand\nnewlines\r\nand  runs",
    "MiXeD CaSe 123 abc456def",
    "punct-only: ***///---",
    "",
    "   ",
    "unicode: café über naïve 中文",
    "digits 000 111 and a-b-c",
    "trailing spaces   ",
    "   leading",
    "a",
    "!@#$%^&*()_+{}|:\"<>?",
]


def test_normalize_matches_duckdb_on_nasty_strings(spark):
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(NASTY)],
                                "i long, text string")
    got = {r.i: r.n for r in sdf.select(
        "i", normalize_text(F.col("text")).alias("n")).collect()}
    con = duckdb.connect()
    for i, s in enumerate(NASTY):
        want = con.execute(
            f"SELECT {NORMALIZE_SQL} FROM (SELECT ? AS text)",
            [s]).fetchone()[0]
        assert got[i] == want, (i, s, got[i], want)


def test_normalize_idempotent(spark):
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(NASTY)],
                                "i long, text string")
    once = sdf.select("i", normalize_text(F.col("text")).alias("text"))
    twice = once.select("i", normalize_text(F.col("text")).alias("n"))
    rows = {r.i: r.n for r in twice.collect()}
    base = {r.i: r.text for r in once.collect()}
    assert rows == base


def test_weighted_sample_keep_rate_tracks_mean_weight(spark):
    """Over the fixture, empirical keep rate must be within a few
    points of the mean weight (the md5 draw is uniform)."""
    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    out = all_queries()["quality_weighted_sample"].fn(
        spark, SF_SMOKE).collect()
    mean_w = sum(r.weight for r in out) / len(out)
    keep_rate = sum(r.kept for r in out) / len(out)
    assert keep_rate == pytest.approx(mean_w, abs=0.06)


def test_weighted_sample_extremes(spark):
    """weight 1.0 must always keep; weight 0.0 must always drop."""
    from cga_logs_to_kinesis_spark.operators.normalize import (
        q_quality_weighted_sample)
    import pandas as pd

    pdf = pd.DataFrame({
        "doc_id": range(200),
        "text": ["x"] * 200,
        "lang": ["en"] * 200,
        "source": ["s"] * 200,
        # alternate: enormous docs (w=1) and empty docs (w=0)
        "n_chars": [4000 if i % 2 == 0 else 0 for i in range(200)],
    })
    sdf = spark.createDataFrame(pdf)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sdf.write.parquet(f"{d}/documents.parquet")
        out = q_quality_weighted_sample(spark, d).collect()
    for r in out:
        assert r.kept == (r.weight == 1.0)
