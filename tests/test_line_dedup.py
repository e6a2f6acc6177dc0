"""Line-level boilerplate dedup: behavior on a hand-built corpus with
known boilerplate, NULL/edge handling, and the plan shapes that make
it survive 100 TB (anti-join cap, no content-key windows, heap top-k,
checkpointed front)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.operators.line_dedup import (
    BOILER_DF,
    boilerplate_fps,
    line_flat,
)
from cga_logs_to_kinesis_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def _corpus(spark):
    """8 docs share a footer line (df=8 >= BOILER_DF); one pair
    shares a line at df=2 (< threshold, must survive); short common
    lines (< LINE_MIN_CHARS) must survive at any frequency."""
    footer = "this footer appears on every single page"
    rows = []
    for i in range(8):
        rows.append((i, f"unique body of document number {i}\n"
                        f"second unique line {i}\n"
                        "ok\n"                       # short, df=8
                        f"{footer}"))
    rows += [(100, "a line shared by exactly two documents\nbody a"),
             (101, "a line shared by exactly two documents\nbody b"),
             (102, None),
             (103, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_fps_threshold_and_min_length(spark):
    flat = line_flat(_corpus(spark))
    fps = boilerplate_fps(flat)
    got = {r.fp for r in fps.collect()}
    want = {r.fp for r in flat.filter(
        F.col("line") == "this footer appears on every single page")
        .select("fp").distinct().collect()}
    assert got == want            # footer only: df-2 line and the
    assert len(got) == 1          # short "ok" line both survive


def test_scrub_on_known_corpus(spark):
    """The scrub pipeline (the exact composition the registered query
    wires) over the hand-built corpus: the natural footer drops,
    per-doc reassembly preserves line order, NULL and empty texts
    pass through."""
    corpus = _corpus(spark)
    base = corpus.select("doc_id", F.col("text").alias("orig_text"),
                         F.col("text").alias("text")).localCheckpoint()
    flat = line_flat(base)
    kept = flat.join(boilerplate_fps(flat), "fp", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"]),
            "\n").alias("scrubbed"))
    got = {r.doc_id: r.scrubbed for r in rebuilt.collect()}
    # footer stripped, order preserved, short + df-2 lines kept
    assert got[3] == ("unique body of document number 3\n"
                      "second unique line 3\nok")
    assert got[100] == ("a line shared by exactly two documents\n"
                        "body a")
    assert got[103] == ""         # empty text -> one empty kept line
    assert 102 not in got         # NULL text never explodes


def test_registered_queries_restore_and_report(spark):
    """Over the real fixtures the scrub must restore EVERY document
    byte-for-byte (no natural line reaches the threshold) and the
    report must surface exactly the three poison lines with their
    deterministic class sizes."""
    qs = all_queries()
    scrub = qs["line_dedup_scrub"].fn(spark, SF_SMOKE)
    agg = scrub.agg(
        F.count("*").alias("n"),
        F.sum(F.col("restored").cast("int")).alias("n_restored"),
        F.sum("n_dropped").alias("dropped")).first()
    assert agg.n == agg.n_restored and agg.n == 500
    assert agg.dropped > 0
    report = qs["boilerplate_lines"].fn(spark, SF_SMOKE).collect()
    from cga_logs_to_kinesis_spark.operators.line_dedup import (
        FOOTER_A,
        FOOTER_B,
        HEADER,
    )
    assert [r.line for r in report] == [FOOTER_A, FOOTER_B, HEADER]
    assert [r.n_docs for r in report] == [216, 92, 39]


def test_line_dedup_plans(spark):
    """Scale pins: the scrub's cap is a LEFT ANTI join (AQE can
    broadcast the tiny over-threshold list — the bucket_bounded
    hi-only argument), no content-key Window anywhere, the
    checkpointed base means the final plan re-reads NO parquet, and
    the report's top-k is TakeOrderedAndProject."""
    from cga_logs_to_kinesis_spark.plans import formatted_plan

    qs = all_queries()
    scrub = formatted_plan(qs["line_dedup_scrub"].fn(spark, SF_SMOKE))
    assert "LeftAnti" in scrub
    assert "Window" not in scrub
    assert "CartesianProduct" not in scrub
    assert scrub.count("documents.parquet") == 0   # checkpointed once
    assert "Scan ExistingRDD" in scrub
    report = formatted_plan(
        qs["boilerplate_lines"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in report
    assert "Window" not in report
    assert report.count("documents.parquet") == 1


def test_boilerplate_ratio_plan(spark):
    """The gate's plan: checkpointed base (no parquet re-scan), the
    drop-list attach is a plain equi-join on the md5 digest (left,
    flagged), no Window, no cartesian; ratios bounded and the poison
    classes visible."""
    from cga_logs_to_kinesis_spark.plans import formatted_plan

    df = all_queries()["boilerplate_ratio_by_source"].fn(
        spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("documents.parquet") == 0
    assert "Scan ExistingRDD" in plan
    rows = df.collect()
    assert len(rows) == 20
    assert all(0.0 <= r.boiler_ratio <= 1.0 for r in rows)
    assert any(r.n_boiler_lines > 0 for r in rows)


def test_intra_dedup_semantics(spark):
    """The doubled spam line collapses to one copy for the poisoned
    class, the doubled short 'ok' line survives everywhere (the
    min-length exemption), and line order is preserved."""
    from cga_logs_to_kinesis_spark.operators.line_dedup import (
        INTRA_SPAM,
    )

    rows = {r.doc_id: r for r in
            all_queries()["line_dedup_intra"].fn(spark, SF_SMOKE)
            .collect()}
    poisoned = [r for i, r in rows.items() if i % 5 < 2]
    clean = [r for i, r in rows.items() if i % 5 >= 2]
    assert all(r.n_dropped == 1 for r in poisoned)
    assert all(r.n_dropped == 0 for r in clean)
    sample = next(r for i, r in rows.items() if i % 5 < 2)
    assert sample.scrubbed_text.count(INTRA_SPAM) == 1
    assert sample.scrubbed_text.endswith("\nok\nok")   # exempt shorts


def test_relative_min_df_integer_exact():
    """The corpus-relative threshold is pure integer arithmetic —
    max(BOILER_DF, ceil(n * num/den)) — because a float share is a
    cross-engine trap: Python's 0.07 * 100 = 7.000000000000001 ceils
    to 8 while DuckDB's DECIMAL 0.07 gives exactly 7."""
    import math

    from cga_logs_to_kinesis_spark.operators.line_dedup import (
        BOILER_DF,
        relative_min_df,
    )

    assert relative_min_df(500) == 10          # exact 2%
    assert relative_min_df(501) == 11          # ceil
    assert relative_min_df(50) == BOILER_DF    # floor wins
    assert relative_min_df(0) == BOILER_DF
    assert relative_min_df(10**12) == 2 * 10**10   # no float overflow
    # the float form really does disagree (the trap being avoided):
    # integer ceil of 7*100/100 is 7; float ceil is 8
    assert math.ceil(0.07 * 100) == 8
    assert relative_min_df(100, 7, 100) == 7


def test_scrub_rel_drops_poison_keeps_midfrequency(spark):
    """At sf0.001 the relative threshold floors to BOILER_DF (the two
    forms coincide: ceil(2% of ~50 docs) = 1 < 5); the query itself
    must still find and remove every poison line from frequency
    evidence alone — restored byte-for-byte."""
    rows = all_queries()["line_dedup_scrub_rel"].fn(
        spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.restored for r in rows)
    assert any(r.n_dropped > 0 for r in rows)


def test_intra_parity_adversarial_long_docs(spark):
    """Both intra-dedup algorithms — the batch groupBy+join form
    (intra_dedup_frame) and the row-local O(L²) prefix probe the
    streaming twin uses (intra_dedup_columns) — must agree where the
    quadratic probe actually bites: generated documents of 10³+ lines
    with repeated multi-line blocks, interleaved short exempt lines,
    duplicate-at-distance lines, and a NULL-text row (r14 verdict
    next-#6, the shape the small-fixture parity tests never reach)."""
    import random

    from pyspark.sql import functions as F

    from cga_logs_to_kinesis_spark.operators.line_dedup import (
        intra_dedup_columns,
        intra_dedup_frame,
    )

    rng = random.Random(42)
    docs = []
    for d in range(6):
        block = [f"repeated boilerplate block line {d} {i}"
                 for i in range(40)]
        lines = []
        for rep in range(10):              # block repeated 10x
            lines += block
            lines += [f"unique content line {d} {rep} {i} "
                      f"{rng.randrange(10**9)}" for i in range(80)]
            lines += ["ok", "-", ""]       # short exempt, must survive
        # duplicate-at-distance: first unique line repeated at the end
        lines.append(lines[40])
        docs.append((d, "\n".join(lines)))
    docs.append((99, None))
    base = spark.createDataFrame(
        docs, "doc_id long, text string").localCheckpoint()

    got_frame = {r.doc_id: (r.n_lines, r.n_dropped, r.scrubbed_text)
                 for r in intra_dedup_frame(base).collect()}
    n_lines, n_dropped, scrubbed = intra_dedup_columns(F.col("text"))
    got_local = {r.doc_id: (r.n_lines, r.n_dropped, r.scrubbed_text)
                 for r in base.select(
                     "doc_id", n_lines.alias("n_lines"),
                     n_dropped.alias("n_dropped"),
                     scrubbed.alias("scrubbed_text")).collect()}
    assert got_frame == got_local
    assert len(got_frame) == 7
    # the repeated block really collapsed: 9 of 10 reps dropped, plus
    # the duplicate-at-distance line; exempt shorts all survived
    nl, nd, text = got_frame[0]
    assert nl > 1200 and nd == 9 * 40 + 1
    assert text.count("repeated boilerplate block line 0 0") == 1
    assert text.count("\nok") == 10
    assert got_frame[99] == (0, 0, None)
