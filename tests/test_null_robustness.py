"""Dirty-corpus robustness: NULL / empty / whitespace-only / 1-char
documents must not crash any text-family operator.

Real crawled corpora contain all four; the fixtures contain none, so
without this test a null-unsafe regexp or size() would only surface
in production.  Row counts are pinned loosely (crash-freedom and
sane filtering are the contract, not exact values — those are the
oracle sweep's job on the clean fixtures).
"""

from __future__ import annotations

import pandas as pd
import pytest

from cga_logs_to_kinesis_spark.registry import all_queries

PROBED = [
    "text_stats", "text_normalize", "gopher_quality", "dedup_exact",
    "winnowing_fingerprints", "quality_weighted_sample",
    "char_diversity", "dedup_substring", "bpe_token_counts",
    "unigram_rarity", "fertility_by_lang", "curation_funnel",
    "token_frequencies", "lang_id", "quality_features",
    "doc_fingerprint", "gopher_repetition", "pii_scrub",
]


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["normal words here for all the tests to chew on",
                 "", "   ", None, "x",
                 "unicode café 中文 🎉 naïve мир text"],
        "lang": ["en"] * 6,
        "source": ["s"] * 6,
        "n_chars": [46, 0, 3, 0, 1, 33],
    })
    d = tmp_path_factory.mktemp("dirty")
    spark.createDataFrame(pdf).write.parquet(
        str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", PROBED)
def test_operator_survives_dirty_corpus(spark, dirty_dir, name):
    df = all_queries()[name].fn(spark, dirty_dir)
    n = df.count()          # forces full evaluation
    assert n >= 0
    # per-doc operators must not fabricate rows beyond the corpus
    if name in {"text_normalize", "gopher_quality",
                "quality_weighted_sample", "bpe_token_counts",
                "lang_id"}:
        assert n == 6
