"""Partitioned archival sink: layout, pruning, file sizing."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.plans import formatted_plan
from cga_logs_to_kinesis_spark.streaming.archive import (
    archive_envelopes,
    read_archive,
)
from cga_logs_to_kinesis_spark.streaming.envelope import envelope_projection


def _envelopes(spark, tmp_path):
    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "a.log").write_text("l1\nl2\nl3\nl4\n")
    lines = spark.read.format("text").load(str(watch))
    return envelope_projection(lines, origin="arch-test")


def test_archive_layout_and_roundtrip(spark, tmp_path):
    env = _envelopes(spark, tmp_path)
    out = str(tmp_path / "archive")
    archive_envelopes(env, out)

    dirs = sorted(p.name for p in (tmp_path / "archive").iterdir()
                  if p.is_dir())
    assert len(dirs) == 1 and dirs[0].startswith("event_date=")
    sub = sorted(p.name for p in
                 (tmp_path / "archive" / dirs[0]).iterdir() if p.is_dir())
    assert sub == ["origin=arch-test"]

    back = read_archive(spark, out)
    assert back.count() == 4
    assert set(back.select("origin").distinct().toPandas()["origin"]) == {
        "arch-test"}


def test_archive_partition_pruning(spark, tmp_path):
    env = _envelopes(spark, tmp_path)
    out = str(tmp_path / "archive")
    archive_envelopes(env, out)
    q = read_archive(spark, out).filter(
        F.col("origin") == "no-such-origin")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan
    assert q.count() == 0


def test_archive_file_sizing(spark, tmp_path):
    env = _envelopes(spark, tmp_path)
    out = str(tmp_path / "archive")
    archive_envelopes(env, out, files_per_partition=2)
    files = list((tmp_path / "archive").rglob("*.parquet"))
    assert 1 <= len(files) <= 2


def test_files_per_partition_spreads_writers(spark, tmp_path):
    """files_per_partition=N really yields up to N files in ONE
    partition directory (salted repartition) — a hot partition is not
    funneled through a single writer task."""
    import glob

    from cga_logs_to_kinesis_spark.streaming.archive import (
        compact_archive,
    )

    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "big.log").write_text(
        "".join(f"line-{i}\n" for i in range(400)))
    lines = spark.read.format("text").load(str(watch))
    env = envelope_projection(lines, origin="hot")

    src = str(tmp_path / "archive")
    archive_envelopes(env, src, files_per_partition=3)
    files = glob.glob(f"{src}/*/*/*.parquet")
    assert 2 <= len(files) <= 3               # spread, and capped at N

    dest = str(tmp_path / "compacted")
    compact_archive(spark, src, dest, files_per_partition=2)
    files2 = glob.glob(f"{dest}/*/*/*.parquet")
    assert len(files2) == 2
    assert read_archive(spark, dest).count() == 400


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    """Many small appended files -> one file per partition, identical
    rows, pruning intact."""
    import glob

    from cga_logs_to_kinesis_spark.streaming.archive import (
        compact_archive,
    )

    env = _envelopes(spark, tmp_path)
    src = str(tmp_path / "archive")
    for _ in range(5):                        # 5 micro-batch appends
        archive_envelopes(env, src, files_per_partition=2)

    before = read_archive(spark, src)
    n_before = before.count()
    files_before = glob.glob(f"{src}/*/*/*.parquet")
    assert len(files_before) >= 5

    dest = str(tmp_path / "archive_compact")
    compact_archive(spark, src, dest, files_per_partition=1)

    after = read_archive(spark, dest)
    assert after.count() == n_before
    files_after = glob.glob(f"{dest}/*/*/*.parquet")
    assert len(files_after) == 1              # one partition, one file
    # pruning still works on the compacted layout
    plan = formatted_plan(
        after.filter(F.col("origin") == "arch-test"))
    assert "PartitionFilters" in plan
    # identical content
    assert sorted(map(tuple, before.drop("event_date", "origin")
                      .collect())) == \
        sorted(map(tuple, after.drop("event_date", "origin").collect()))
