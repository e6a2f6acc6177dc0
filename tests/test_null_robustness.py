"""Dirty-corpus robustness: NULL / empty / whitespace-only / 1-char /
vertical-tab documents must not crash any text-family operator — and
for oracle-paired operators, Spark and DuckDB must still agree on the
dirty corpus, not just the clean fixtures.

Real crawled corpora contain all of these; the fixtures contain none,
so without the cross-engine comparison a null-unsafe size() (-1 in
Spark's non-ANSI mode vs NULL-skipped in DuckDB) or a \\s-class
divergence (Java \\s includes U+000B, RE2's does not) would only
surface in production.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cga_logs_to_kinesis_spark.registry import all_queries
from tests.test_queries_oracle import table_hash

# Every registered query that reads ONLY the documents table (the
# other fixtures have no dirty twin yet).  Queries whose oracle is
# None get the crash-freedom check only; the rest are hash-compared.
PROBED = [
    "bigram_surprisal", "bm25_topk", "bpe_learn_merges",
    "bpe_token_counts", "bpe_tokenize", "char_diversity",
    "corpus_stats", "curation_funnel", "curation_manifest",
    "curriculum_deciles", "dedup_components", "dedup_containment",
    "dedup_exact", "dedup_exact_survivors", "dedup_incremental",
    "dedup_minhash_incremental", "dedup_minhash_lsh",
    "dedup_near_survivors",
    "dedup_ngram_jaccard", "dedup_recall_report", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_source_flow", "dedup_substring",
    "dedup_substring_apply", "dedup_substring_stats",
    "dedup_winnow_pairs", "doc_fingerprint", "domain_cap",
    "dsir_importance", "envelope_json_roundtrip", "envelope_project",
    "fertility_by_lang", "gopher_quality", "gopher_repetition",
    "lang_id", "lang_mismatch_report", "length_outliers",
    "chunk_overlap", "split_leakage_repair",
    "curation_export_manifest",
    "dedup_cluster_stats", "dedup_threshold_sweep",
    "longest_doc_per_lang", "minhash_signatures",
    "mixture_weights", "multimodal_audio_features",
    "multimodal_features", "multimodal_raw_features",
    "multimodal_raw_resize", "multimodal_resize",
    "multimodal_video_frames", "ngram_decontaminate", "pack_chunks",
    "pagerank_docs", "passage_dedup", "pii_scrub",
    "prune_frequent_tokens", "quality_features",
    "quality_filter_survivors", "quality_weighted_sample",
    "shard_assign", "snapshot_diff", "split_assign",
    "split_leakage", "split_repair",
    "stratified_sample", "text_normalize", "text_stats",
    "tfidf_top_terms", "token_frequencies", "token_length_histogram",
    "unigram_rarity", "vocab_coverage", "winnowing_fingerprints",
    "quality_percentile_calibrate", "dedup_best_survivors",
    "dedup_downweight", "heavy_hitters", "bloom_decontaminate",
    "length_outliers_approx", "encoding_anomaly_report",
    "ngram_novelty", "training_order", "training_interleave",
    "novelty_curve", "script_mixing_report", "corpus_drift",
    "homoglyph_scrub", "boilerplate_lines", "line_dedup_scrub",
    "boilerplate_ratio_by_source", "source_divergence",
    "line_dedup_intra", "line_dedup_scrub_rel",
    "doc_line_profile", "line_dedup_pipeline", "mixture_apply",
    "setjoin_prefix", "perplexity_split", "markup_scrub",
    "lsh_recall_exact", "setjoin_incremental", "lsh_recall_curve",
    "quality_classifier", "quality_classifier_apply",
    "token_ngram_decontaminate", "passage_dedup_cdc",
    "quality_classifier_train", "quality_classifier_eval",
    "token_decon_apply", "blocklist_filter", "blocklist_apply",
    "blocklist_terms", "image_phash", "image_dedup_pairs",
    "image_dedup_survivors", "image_dedup_incremental",
]

_TEXTS = ["normal words here for all the tests to chew on",
          "", "   ", None, "x",
          "unicode café 中文 🎉 naïve мир text",
          # U+000B vertical tab: in Java's \s but not RE2's — the
          # row that pins the explicit whitespace class in
          # normalize_text (operators/normalize.py).
          "vertical\x0btab\x0bseparated words\x0b",
          # encoding damage (encoding_anomaly_report's quarry; every
          # other operator must also survive + agree on these):
          "decoder gave � up � here",
          "mojibake Ã© caf Ã© smart "
          "â€™ quote",
          "ansi \x1b[0m spill \x07 and C1 \x85 nel \x9c st",
          "zero\u200bwidth tokens bidi \u202e sneak \ufeff bom",
          ]

_DOCS = pd.DataFrame({
    "doc_id": list(range(len(_TEXTS))),
    "text": _TEXTS,
    "lang": ["en"] * len(_TEXTS),
    "source": ["s"] * len(_TEXTS),
    "n_chars": [len(t) if t else 0 for t in _TEXTS],
})


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty")
    # ONE partition, so the NULL-text row shares an Arrow batch with
    # every valid row: pandas-UDF operators must survive pyarrow's
    # int64 -> float64 downgrade on nullable batches (the
    # bloom_decontaminate fingerprint probe regressed exactly there
    # when rows were spread across partitions and the NULL landed in
    # its own batch).
    spark.createDataFrame(_DOCS).coalesce(1).write.parquet(
        str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirty_oracle(dirty_dir):
    con = duckdb.connect()
    # Spark writes a directory of part files; DuckDB needs the glob.
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{dirty_dir}/documents.parquet/*.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", PROBED)
def test_operator_matches_oracle_on_dirty_corpus(spark, dirty_dir,
                                                 dirty_oracle, name):
    spec = all_queries()[name]
    sdf = spec.fn(spark, dirty_dir)
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) >= 0
    # per-doc operators must not fabricate rows beyond the corpus
    if name in {"text_normalize", "gopher_quality",
                "quality_weighted_sample", "bpe_token_counts",
                "lang_id"}:
        assert len(srows) == len(_DOCS)
    if spec.oracle is None:
        return
    cur = dirty_oracle.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), "row count mismatch on dirty corpus"
    assert sorted(sdf.columns) == sorted(ocols), "schema mismatch"
    assert table_hash(srows, list(sdf.columns)) == \
        table_hash(orows, ocols), \
        f"{name}: cross-engine divergence on the dirty corpus"
