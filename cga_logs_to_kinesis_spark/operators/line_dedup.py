"""Line-level boilerplate dedup — the CCNet/RefinedWeb staple the
registry lacked: navigation bars, cookie banners, and footer lines
repeat across millions of pages, survive document-level dedup
entirely (every PAGE is unique), and poison LM training data unless
removed line-by-line.  Two operators plus a streaming store
(``streaming/corpus.py::line_df_sink``):

* ``boilerplate_lines`` — the report: lines whose distinct-document
  frequency crosses ``BOILER_DF``, ranked.
* ``line_dedup_scrub`` — the apply: rebuild each document without
  its boilerplate lines, order preserved.

Scale shape: the line explode is bounded fan-out (a document's line
count); the doc-frequency fold is two partial-agg groupBys — the
distinct pass collapses a hot line's rows per map partition before
either exchange, so a footer shared by half the corpus ships one row
per partition, never its full occurrence list through one reducer.
The boilerplate list itself is tiny by construction (|lines| with
df >= threshold is bounded by corpus_lines / threshold), so the apply
is a LEFT ANTI join that AQE broadcast-converts — the exact
bucket_bounded hi-only argument (functions/buckets.py).  The rebuild
groups by doc_id — an id key, not a content key, so no skew story.

The fixtures are clean single-line texts, so (the homoglyph_scrub /
text_normalize convention) both queries poison a deterministic subset
of documents with known header/footer lines inside the query, and the
scrub must find and remove them FROM FREQUENCY EVIDENCE ALONE —
``restored`` proves byte-for-byte recovery of the original text.

Reference parity: the reference ships raw log lines and has no
analytics (main.go:1-426); this operator family exists for the
100 TB training-data pipeline mandate, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import (
    tune_session,
    widen_for_explode,
)

# A line is a dedup candidate only at >= this many characters (short
# lines — bullets, dates, "home" — are structure, not boilerplate,
# and dropping them would shred innocent documents).
LINE_MIN_CHARS = 10
# ... and is boilerplate when it appears in >= this many DISTINCT
# documents.
BOILER_DF = 5
# Poison lines (>= LINE_MIN_CHARS, vocabulary disjoint from the
# fixture corpus so they can never collide with a real line):
HEADER = "site navigation home products pricing contact"
FOOTER_A = "subscribe to our newsletter for weekly updates"
FOOTER_B = "copyright example corp all rights reserved"


def poison_boilerplate(text: Column | None = None) -> Column:
    """Deterministically splice boilerplate lines into a subset of
    documents: doc_id %% 13 == 0 gets a HEADER line prepended,
    %% 7 < 3 FOOTER_A appended, %% 11 < 2 FOOTER_B appended (the
    classes overlap, so some docs carry several).  NULL text stays
    NULL.  Every class is >= BOILER_DF docs at every fixture sf."""
    text = F.col("text") if text is None else text
    hdr = F.when(F.col("doc_id") % 13 == 0, F.lit(HEADER + "\n")) \
        .otherwise(F.lit(""))
    fa = F.when(F.col("doc_id") % 7 < 3, F.lit("\n" + FOOTER_A)) \
        .otherwise(F.lit(""))
    fb = F.when(F.col("doc_id") % 11 < 2, F.lit("\n" + FOOTER_B)) \
        .otherwise(F.lit(""))
    return F.when(text.isNull(), F.lit(None).cast("string")) \
        .otherwise(F.concat(hdr, text, fa, fb))


# the byte-identical DuckDB twin, as a CTE body over `documents`
POISON_SQL = f"""
    SELECT doc_id, source,
           CASE WHEN text IS NULL THEN NULL ELSE
               CASE WHEN doc_id % 13 = 0
                    THEN '{HEADER}' || chr(10) ELSE '' END
               || text
               || CASE WHEN doc_id % 7 < 3
                       THEN chr(10) || '{FOOTER_A}' ELSE '' END
               || CASE WHEN doc_id % 11 < 2
                       THEN chr(10) || '{FOOTER_B}' ELSE '' END
           END AS text
    FROM documents
"""


def line_flat(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """(doc_id, *extra_cols, pos, line, fp) — one row per line,
    position kept for order-preserving reassembly, fp = md5(line) so
    downstream folds and joins ship a fixed 32-char digest instead of
    arbitrary-length line text.  ``extra_cols`` ride the row-local
    explode (cheaper than re-attaching them with a doc_id join).
    Width-gated like every explode front."""
    wide = widen_for_explode(
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", *extra_cols, "text"))
    return (wide.select(
        "doc_id", *extra_cols,
        F.posexplode(F.split("text", "\n", -1)).alias("pos", "line"))
        .withColumn("fp", F.md5("line")))


def boilerplate_fps(flat: DataFrame) -> DataFrame:
    """Digests of lines whose distinct-doc frequency >= BOILER_DF.
    Two partial-agg groupBys (the distinct pass collapses a hot
    line's rows map-side before either exchange) — never
    countDistinct-over-window."""
    return (flat.filter(F.length("line") >= LINE_MIN_CHARS)
            .select("fp", "doc_id").distinct()
            .groupBy("fp").agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= BOILER_DF)
            .select("fp"))


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top boilerplate lines by distinct-document frequency.  Groups
    the distinct (line, doc) pairs by the line text directly — the
    report's output IS the text, and the distinct pass makes the
    groupBy partial-agg-friendly at any skew; global top-k via
    orderBy().limit() (TakeOrderedAndProject, never a bare global
    row_number)."""
    from cga_logs_to_kinesis_spark.sources import load_table

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    flat = line_flat(
        docs.select("doc_id", poison_boilerplate().alias("text")))
    return (flat.filter(F.length("line") >= LINE_MIN_CHARS)
            .select("line", "doc_id").distinct()
            .groupBy("line").agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= BOILER_DF)
            .orderBy(F.desc("n_docs"), "line")
            .limit(20))


register(QuerySpec(
    "boilerplate_lines", q_boilerplate_lines,
    oracle=f"""
        WITH poisoned AS ({POISON_SQL}),
        flat AS (
            SELECT doc_id, UNNEST(string_split(text, chr(10))) AS line
            FROM poisoned WHERE text IS NOT NULL
        )
        SELECT line, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (SELECT DISTINCT line, doc_id FROM flat
              WHERE len(line) >= {LINE_MIN_CHARS})
        GROUP BY line
        HAVING COUNT(*) >= {BOILER_DF}
        ORDER BY n_docs DESC, line
        LIMIT 20
    """,
    doc="CCNet-style boilerplate miner: lines whose distinct-document "
        "frequency crosses the threshold, ranked — the report half of "
        "line-level dedup, over a deterministically-poisoned corpus "
        "(clean-fixture convention)",
    tags=("dedup", "text", "quality", "report"),
))


def scrub_with_fps(base: DataFrame, boiler_fps: DataFrame) -> DataFrame:
    """The apply tail, shared by the batch query and the store-backed
    streaming path (``streaming/corpus.py::line_scrub_from_store``) so
    the drop/reassemble semantics cannot drift.  ``base`` carries
    (doc_id, orig_text, text); ``boiler_fps`` the (fp) drop list —
    tiny by construction (<= corpus_lines / BOILER_DF buckets), so
    the LEFT ANTI join AQE broadcast-converts and a hot boilerplate
    line never funnels through one reducer anywhere in this plan."""
    flat = line_flat(base)
    kept = flat.join(boiler_fps, "fp", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"]),
            "\n").alias("scrubbed"),
        F.count("*").alias("n_kept"))
    n_lines = F.coalesce(F.size(F.split("text", "\n", -1)), F.lit(0)) \
        .cast("long")
    scrubbed = F.when(F.col("text").isNull(),
                      F.lit(None).cast("string")) \
        .otherwise(F.coalesce(F.col("scrubbed"), F.lit("")))
    return (base.join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    n_lines.alias("n_lines"),
                    (n_lines - F.coalesce(F.col("n_kept"), F.lit(0)))
                    .cast("long").alias("n_dropped"),
                    scrubbed.alias("scrubbed_text"),
                    F.col("orig_text").eqNullSafe(scrubbed)
                    .alias("restored")))


def q_line_dedup_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply: strip boilerplate lines (found from frequency
    evidence alone) and reassemble each document in original line
    order.  The poisoned base is localCheckpoint'ed — it feeds the
    frequency fold, the anti-join probe, and the final per-doc join,
    and one materialization beats three corpus scans (the explode is
    recomputed from the checkpoint per consumer: row-local split
    beats materializing the exploded corpus).  ``restored`` proves
    the scrub returns the pre-poison text byte-for-byte."""
    from cga_logs_to_kinesis_spark.sources import load_table

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    base = (docs.select("doc_id",
                        F.col("text").alias("orig_text"),
                        poison_boilerplate().alias("text"))
            .localCheckpoint())
    return scrub_with_fps(base, boilerplate_fps(line_flat(base)))


register(QuerySpec(
    "line_dedup_scrub", q_line_dedup_scrub,
    oracle=f"""
        WITH poisoned AS ({POISON_SQL}),
        split AS (
            SELECT doc_id, text, string_split(text, chr(10)) AS ls
            FROM poisoned
        ),
        flat AS (
            SELECT doc_id, u['pos'] AS pos, u['line'] AS line
            FROM (SELECT doc_id,
                         UNNEST(list_transform(range(len(ls)), i ->
                             struct_pack(pos := i,
                                         line := ls[i + 1]))) AS u
                  FROM split WHERE text IS NOT NULL)
        ),
        boiler AS (
            SELECT line FROM (
                SELECT line, COUNT(*) AS nd
                FROM (SELECT DISTINCT line, doc_id FROM flat
                      WHERE len(line) >= {LINE_MIN_CHARS})
                GROUP BY line)
            WHERE nd >= {BOILER_DF}
        ),
        kept AS (
            SELECT f.* FROM flat f
            WHERE f.line NOT IN (SELECT line FROM boiler)
        ),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos) AS scrubbed,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY doc_id
        ),
        finals AS (
            SELECT p.doc_id,
                   CAST(COALESCE(len(string_split(p.text, chr(10))),
                                 0) AS BIGINT) AS n_lines,
                   CASE WHEN p.text IS NULL THEN NULL
                        ELSE COALESCE(r.scrubbed, '') END
                       AS scrubbed_text,
                   COALESCE(r.n_kept, 0) AS n_kept
            FROM poisoned p LEFT JOIN rebuilt r USING (doc_id)
        )
        SELECT f.doc_id, f.n_lines,
               CAST(f.n_lines - f.n_kept AS BIGINT) AS n_dropped,
               f.scrubbed_text,
               COALESCE(d.text = f.scrubbed_text,
                        d.text IS NULL
                        AND f.scrubbed_text IS NULL) AS restored
        FROM finals f JOIN documents d USING (doc_id)
    """,
    doc="CCNet-style line-level dedup, the apply half: strip lines "
        "whose corpus doc-frequency crosses the threshold and "
        "reassemble each document in order; restoration proven "
        "byte-for-byte against the pre-poison text",
    tags=("dedup", "text", "quality", "apply"),
))


def q_boilerplate_ratio_by_source(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-source boilerplate exposure — the gating metric: a source
    whose line volume is mostly corpus-frequent lines is template
    spam, not content.  One semi-join of the exploded lines against
    the tiny drop list (broadcastable, same argument as the scrub's
    anti-join), then per-source sums — all partial-agg.  The base is
    localCheckpoint'ed because it feeds the frequency fold and the
    per-source fold."""
    from cga_logs_to_kinesis_spark.sources import load_table

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    base = (docs.select("doc_id", "source",
                        poison_boilerplate().alias("text"))
            .localCheckpoint())
    flat = line_flat(base, "source")
    boiler = boilerplate_fps(line_flat(base))
    # left join + flag rather than a semi-join: the ratio needs both
    # the boiler count AND the total from one pass over the lines
    marked = (flat.join(boiler.withColumn("_b", F.lit(1)),
                        "fp", "left")
              .withColumn("is_boiler",
                          F.coalesce(F.col("_b"), F.lit(0))
                          .cast("long")))
    return (marked.groupBy("source")
            .agg(F.count("*").alias("n_lines"),
                 F.sum("is_boiler").alias("n_boiler_lines"),
                 F.try_divide(
                     F.sum("is_boiler").cast("double"),
                     F.count("*").cast("double"))
                 .alias("boiler_ratio"))
            .orderBy("source"))


register(QuerySpec(
    "boilerplate_ratio_by_source", q_boilerplate_ratio_by_source,
    oracle=f"""
        WITH poisoned AS ({POISON_SQL}),
        flat AS (
            SELECT doc_id, source,
                   UNNEST(string_split(text, chr(10))) AS line
            FROM poisoned WHERE text IS NOT NULL
        ),
        boiler AS (
            SELECT line FROM (
                SELECT line, COUNT(*) AS nd
                FROM (SELECT DISTINCT line, doc_id FROM flat
                      WHERE len(line) >= {LINE_MIN_CHARS})
                GROUP BY line)
            WHERE nd >= {BOILER_DF}
        )
        SELECT source,
               COUNT(*) AS n_lines,
               CAST(SUM(CASE WHEN line IN (SELECT line FROM boiler)
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boiler_lines,
               CAST(SUM(CASE WHEN line IN (SELECT line FROM boiler)
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS boiler_ratio
        FROM flat
        GROUP BY source
        ORDER BY source
    """,
    doc="per-source boilerplate exposure: share of a source's line "
        "volume that is corpus-frequent boilerplate — the gating "
        "metric for template-spam sources; one marked join against "
        "the tiny drop list, per-source partial-agg sums",
    tags=("dedup", "text", "quality", "audit"),
))


# ---------------------------------------------------------------------------
# Intra-document line dedup: the within-doc half
# ---------------------------------------------------------------------------
# Corpus-level dedup drops lines COMMON ACROSS documents; listing and
# spam pages also repeat lines WITHIN one document (RefinedWeb removes
# both).  Keep the first occurrence of each >= LINE_MIN_CHARS line per
# document; short lines are structure (blank separators, bullets) and
# always survive.  Everything is doc_id-keyed — a per-doc groupBy and
# join, uniform by construction, no content-key skew story at all.

INTRA_SPAM = "repeated spam line for the intra dedup proof"


def poison_intra(text=None):
    """The intra-dedup poison: doc_id%5<2 docs get a doubled spam
    line (must collapse to one copy), every doc a doubled short 'ok'
    line (must BOTH survive — the min-length exemption)."""
    text = F.col("text") if text is None else text
    return F.when(text.isNull(), F.lit(None).cast("string")) \
        .otherwise(F.concat(
            text,
            F.when(F.col("doc_id") % 5 < 2,
                   F.lit("\n" + INTRA_SPAM + "\n" + INTRA_SPAM))
            .otherwise(F.lit("")),
            F.lit("\nok\nok")))


def intra_dedup_columns(text_col) -> tuple:
    """(n_lines, n_dropped, scrubbed) computed ROW-LOCALLY with
    higher-order functions: keep line i iff it is short (exempt) or
    absent from the line prefix before i — zero shuffle, so it
    composes over a pure stream (``streaming_line_dedup_intra``).
    The prefix probe is O(L²) in a document's line count; for typical
    web documents (10²-10³ lines) that is far cheaper than shuffling
    the exploded lines, which is why the streaming twin uses it —
    the registered batch query keeps the groupBy+join form, whose
    L·log L shuffle is the safe bound for pathological million-line
    documents.  Parity between the two implementations is pinned by
    test (same semantics, independent algorithms)."""
    lines = F.split(text_col, "\n", -1)
    kept = F.filter(
        lines,
        lambda x, i: (F.length(x) < LINE_MIN_CHARS)
        | (F.array_position(F.slice(lines, F.lit(1), i), x) == 0))
    n_lines = F.coalesce(F.size(lines), F.lit(0)).cast("long")
    n_dropped = (n_lines
                 - F.coalesce(F.size(kept), F.lit(0))).cast("long")
    scrubbed = F.when(text_col.isNull(),
                      F.lit(None).cast("string")) \
        .otherwise(F.array_join(kept, "\n"))
    return n_lines, n_dropped, scrubbed


def q_line_dedup_intra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line removal, first occurrence kept
    (poison proves the collapse; see :func:`poison_intra`)."""
    from cga_logs_to_kinesis_spark.sources import load_table

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    base = (docs.select("doc_id", poison_intra().alias("text"))
            .localCheckpoint())     # feeds first-pos fold + rebuild
    flat = line_flat(base)
    firsts = (flat.filter(F.length("line") >= LINE_MIN_CHARS)
              .groupBy("doc_id", "fp")
              .agg(F.min("pos").alias("first_pos")))
    kept = (flat.join(firsts, ["doc_id", "fp"], "left")
            .filter(F.col("first_pos").isNull()
                    | (F.col("pos") == F.col("first_pos"))))
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"]),
            "\n").alias("scrubbed"),
        F.count("*").alias("n_kept"))
    n_lines = F.coalesce(F.size(F.split("text", "\n", -1)), F.lit(0)) \
        .cast("long")
    return (base.join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    n_lines.alias("n_lines"),
                    (n_lines - F.coalesce(F.col("n_kept"), F.lit(0)))
                    .cast("long").alias("n_dropped"),
                    F.when(F.col("text").isNull(),
                           F.lit(None).cast("string"))
                    .otherwise(F.coalesce(F.col("scrubbed"), F.lit("")))
                    .alias("scrubbed_text")))


register(QuerySpec(
    "line_dedup_intra", q_line_dedup_intra,
    oracle=f"""
        WITH poisoned AS (
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN NULL ELSE
                       text
                       || CASE WHEN doc_id % 5 < 2
                               THEN chr(10) || '{INTRA_SPAM}'
                                    || chr(10) || '{INTRA_SPAM}'
                               ELSE '' END
                       || chr(10) || 'ok' || chr(10) || 'ok'
                   END AS text
            FROM documents
        ),
        split AS (
            SELECT doc_id, text, string_split(text, chr(10)) AS ls
            FROM poisoned
        ),
        flat AS (
            SELECT doc_id, u['pos'] AS pos, u['line'] AS line
            FROM (SELECT doc_id,
                         UNNEST(list_transform(range(len(ls)), i ->
                             struct_pack(pos := i,
                                         line := ls[i + 1]))) AS u
                  FROM split WHERE text IS NOT NULL)
        ),
        firsts AS (
            SELECT doc_id, line, MIN(pos) AS first_pos
            FROM flat WHERE len(line) >= {LINE_MIN_CHARS}
            GROUP BY doc_id, line
        ),
        kept AS (
            SELECT f.doc_id, f.pos, f.line
            FROM flat f LEFT JOIN firsts m
              ON f.doc_id = m.doc_id AND f.line = m.line
            WHERE m.first_pos IS NULL OR f.pos = m.first_pos
        ),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos) AS scrubbed,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT p.doc_id,
               CAST(COALESCE(len(string_split(p.text, chr(10))), 0)
                    AS BIGINT) AS n_lines,
               CAST(COALESCE(len(string_split(p.text, chr(10))), 0)
                    - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped,
               CASE WHEN p.text IS NULL THEN NULL
                    ELSE COALESCE(r.scrubbed, '') END AS scrubbed_text
        FROM poisoned p LEFT JOIN rebuilt r USING (doc_id)
    """,
    doc="within-document repeated-line removal (first occurrence "
        "kept, short lines exempt) — the RefinedWeb intra-doc half "
        "of line dedup; doc_id-keyed groupBy + join, no content-key "
        "skew surface",
    tags=("dedup", "text", "quality", "apply"),
))
