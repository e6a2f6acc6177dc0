"""JSONL ingest audit: fixture determinism and exact per-shard
accounting (the registry pair is additionally hash-checked vs the
read_text/json_valid oracle by tests/test_queries_oracle.py)."""

from __future__ import annotations

import hashlib
import os
import shutil

from cga_logs_to_kinesis_spark.operators.ingest_audit import (
    FIXTURE_DIR,
    N_SHARDS,
    dirty_jsonl_fixture,
    load_documents_jsonl_audit,
)
from tests.conftest import SF_SMOKE


def _content_hash(base: str) -> str:
    h = hashlib.sha256()
    for shard in range(N_SHARDS):
        p = os.path.join(base, f"shard={shard}", "part-00000.jsonl")
        h.update(open(p, "rb").read())
    return h.hexdigest()


def test_fixture_bytes_deterministic():
    base = dirty_jsonl_fixture()
    first = _content_hash(base)
    shutil.rmtree(FIXTURE_DIR)      # force regeneration from scratch
    assert _content_hash(dirty_jsonl_fixture()) == first


def test_per_shard_accounting_exact(spark):
    rows = {r.shard: r
            for r in __import__("cga_logs_to_kinesis_spark.registry",
                                fromlist=["all_queries"])
            .all_queries()["jsonl_ingest_report"]
            .fn(spark, SF_SMOKE).collect()}
    assert sorted(rows) == list(range(N_SHARDS))
    for shard, r in rows.items():
        base = shard * 1000
        assert r.n_lines == 49          # 40 valid + 3 sparse + 6 corrupt
        assert r.n_corrupt == 6         # truncated/garbage/{]/array/int/str
        assert r.n_valid == 43
        assert r.n_null_text == 2       # missing-text + explicit-null
        assert r.n_missing_id == 1      # the orphan record
        assert r.n_chars_liars == 3     # i % 13 == 5 for i in 0..39
        assert r.min_doc_id == base
        assert r.max_doc_id == base + 92


def test_permissive_loader_yields_null_rows_for_corrupt(spark):
    base = dirty_jsonl_fixture()
    df = load_documents_jsonl_audit(spark, base)
    # collect once: Spark disallows plans whose only parsed column is
    # _corrupt_record (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD
    # _COLUMN), so counting corrupt rows driver-side over the full
    # projection is the supported pattern for a 196-row fixture.
    rows = df.collect()
    assert len(rows) == N_SHARDS * 49
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == N_SHARDS * 6
    # corrupt rows carry the raw line and nothing else
    assert all(r.doc_id is None and r.text is None for r in corrupt)
