"""Sharded training-data export: placement, layout, reproducibility."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.operators.export import (
    N_SHARDS,
    shard_column,
    write_training_shards,
)
from cga_logs_to_kinesis_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_export_roundtrip_complete_and_placed(spark, tmp_path):
    """Every document comes back exactly once, in the shard the
    placement column says."""
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    mismatch = back.withColumn("expect", shard_column()) \
        .filter(F.col("shard") != F.col("expect")).count()
    assert mismatch == 0


def test_export_one_file_per_shard(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out)
    dirs = sorted(glob.glob(f"{out}/shard=*"))
    # every shard directory exists and holds exactly one parquet file
    assert len(dirs) == N_SHARDS
    for d in dirs:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1, d


def test_export_is_byte_stable(spark, tmp_path):
    """Re-exporting the same corpus yields identical shard bytes —
    deterministic placement + intra-shard sort, no layout dependence."""
    docs = load_table(spark, SF_SMOKE, "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a)
    # different input partitioning must not change output bytes
    write_training_shards(docs.repartition(7), b)
    for d in sorted(glob.glob(f"{a}/shard=*")):
        shard = d.rsplit("=", 1)[1]
        fa = glob.glob(f"{d}/*.parquet")
        fb = glob.glob(f"{b}/shard={shard}/*.parquet")
        assert len(fa) == 1 and len(fb) == 1
        with open(fa[0], "rb") as f1, open(fb[0], "rb") as f2:
            assert f1.read() == f2.read(), shard


def test_jsonl_export_roundtrip_placement_and_stability(spark, tmp_path):
    """The JSONL variant must match the parquet export doc-for-doc:
    every document exactly once, in the placement shard, one text
    file per shard, and byte-identical across re-exports with
    different input partitioning."""
    import json

    from cga_logs_to_kinesis_spark.operators.export import (
        write_training_shards_jsonl,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards_jsonl(docs, a)
    write_training_shards_jsonl(docs.repartition(7), b)

    dirs = sorted(glob.glob(f"{a}/shard=*"))
    assert len(dirs) == N_SHARDS
    seen = {}
    for d in dirs:
        shard = int(d.rsplit("=", 1)[1])
        files = glob.glob(f"{d}/*.txt")
        assert len(files) == 1, d
        with open(files[0]) as f:
            for line in f:
                rec = json.loads(line)
                seen[rec["doc_id"]] = shard
        fb = glob.glob(f"{b}/shard={shard}/*.txt")
        assert len(fb) == 1
        with open(files[0], "rb") as f1, open(fb[0], "rb") as f2:
            assert f1.read() == f2.read(), shard
    expect = {r.doc_id: r.shard for r in
              docs.withColumn("shard", shard_column())
              .select("doc_id", "shard").collect()}
    assert seen == expect


def test_jsonl_export_ingest_roundtrip(spark, tmp_path):
    """export -> load_documents_jsonl closes the loop: the re-ingested
    corpus equals the original row-for-row (schema-explicit read, no
    inference scan)."""
    from cga_logs_to_kinesis_spark.operators.export import (
        write_training_shards_jsonl,
    )
    from cga_logs_to_kinesis_spark.sources import load_documents_jsonl

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "shards")
    write_training_shards_jsonl(docs, out)
    back = load_documents_jsonl(spark, out).select(*docs.columns)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_shard_assign_query_covers_all_shards(spark):
    from cga_logs_to_kinesis_spark.registry import all_queries
    rows = all_queries()["shard_assign"].fn(spark, SF_SMOKE).collect()
    assert [r.shard for r in rows] == list(range(N_SHARDS))
    total = sum(r.n_docs for r in rows)
    assert total == load_table(spark, SF_SMOKE, "documents").count()


def test_jsonl_gz_ingest_matches_plain(spark, tmp_path):
    """Crawl dumps arrive gzip-compressed; Spark's text/json sources
    decode .gz by extension with no loader change.  The compressed
    round-trip must yield the identical corpus — including a corrupt
    line surfacing as a NULL row (PERMISSIVE), not a crash — and the
    audit loader must agree on the corruption counts."""
    import gzip
    import json as _json

    from cga_logs_to_kinesis_spark.sources import (
        load_documents_jsonl,
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(50).collect()
    lines = [_json.dumps({"doc_id": r.doc_id, "text": r.text,
                          "lang": r.lang, "source": r.source,
                          "n_chars": r.n_chars})
             for r in docs]
    lines.insert(3, '{"doc_id": 999, "text": "broken')   # corrupt
    plain = tmp_path / "plain"
    plain.mkdir()
    (plain / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    gz = tmp_path / "gz"
    gz.mkdir()
    with gzip.open(gz / "part-0.jsonl.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")

    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    a = load_documents_jsonl(spark, str(plain))
    b = load_documents_jsonl(spark, str(gz))
    rows_a = sorted(map(tuple, a.collect()), key=key)
    rows_b = sorted(map(tuple, b.collect()), key=key)
    assert rows_a == rows_b and len(rows_b) == 51
    assert sum(1 for r in rows_b if r[1] is None) == 1  # NULL text row

    # the audit loader decodes .gz identically
    from cga_logs_to_kinesis_spark.operators.ingest_audit import (
        load_documents_jsonl_audit,
    )
    audit_a = load_documents_jsonl_audit(spark, str(plain))
    audit_b = load_documents_jsonl_audit(spark, str(gz))
    # agg-count the corrupt column (filtering on it alone is the
    # Spark-disallowed internal-column access pattern)
    agg = [F.count("doc_id").alias("total"),
           F.count("_corrupt_record").alias("n")]
    ra, rb = audit_a.agg(*agg).first(), audit_b.agg(*agg).first()
    assert (ra.total, ra.n) == (rb.total, rb.n) == (50, 1)
