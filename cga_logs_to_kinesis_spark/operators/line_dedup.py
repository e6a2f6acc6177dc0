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
The drop list is bounded by corpus_lines / threshold — which is tiny
(and the anti-join broadcastable) only when the threshold SCALES WITH
THE CORPUS: the absolute default ``BOILER_DF = 5`` bounds it at 20%
of all line occurrences, so at 100 TB use the corpus-relative
``df_share`` form (the ``fit_stop_tokens`` convention), which bounds
the list at 1/df_share entries regardless of corpus size.  Either
way the apply is a LEFT ANTI join on a uniform md5 fp key: AQE
broadcasts a small list and otherwise degrades to a shuffled
anti-join that is skew-safe by key construction.  The rebuild groups
by doc_id — an id key, not a content key, so no skew story.

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


def relative_min_df(n_docs: int, share_num: int = 2,
                    share_den: int = 100) -> int:
    """The corpus-RELATIVE boilerplate threshold (the
    ``fit_stop_tokens`` convention, r14 verdict #2): a line is
    boilerplate when it appears in >= ceil(n_docs * share) distinct
    documents, floored at BOILER_DF so tiny corpora don't flag
    everything.  This is the 100 TB form — it bounds the drop list at
    <= share_den/share_num entries per line-occurrence share,
    independent of corpus size, which is what makes the scrub's
    anti-join build side broadcastable at any scale (the absolute
    BOILER_DF bound grows linearly with the corpus).

    The share is an integer RATIONAL (num/den), ceil'd in pure
    integer arithmetic — a float share is a cross-engine trap:
    DuckDB parses a ``0.07`` literal as DECIMAL (0.07 * 100 = 7
    exactly) while Python's float gives 7.000000000000001 and ceils
    to 8.  The ceil form (a + b - 1) // b is written identically in
    the oracle SQL so both engines compute the same integer by
    construction."""
    return max(BOILER_DF,
               (n_docs * share_num + share_den - 1) // share_den)


def boilerplate_fps(flat: DataFrame,
                    min_df: int = BOILER_DF) -> DataFrame:
    """Digests of lines whose distinct-doc frequency >= ``min_df``
    (absolute default; pass :func:`relative_min_df` for the
    corpus-relative scale form).  Two partial-agg groupBys (the
    distinct pass collapses a hot line's rows map-side before either
    exchange) — never countDistinct-over-window."""
    return (flat.filter(F.length("line") >= LINE_MIN_CHARS)
            .select("fp", "doc_id").distinct()
            .groupBy("fp").agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= min_df)
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
    (doc_id, orig_text, text); ``boiler_fps`` the (fp) drop list.

    Drop-list scale honesty (r14 verdict #2): with the ABSOLUTE
    threshold ``BOILER_DF`` the drop list is bounded by
    corpus_lines / BOILER_DF — at the default of 5 that is 20% of all
    line occurrences, nowhere near broadcastable at 100 TB, so the
    broadcast case only holds for a corpus-RELATIVE threshold
    (``df_share``; then the list is <= 1/df_share entries).  The plan
    does not care which regime it is in: the LEFT ANTI join runs on a
    uniform md5 fp key — AQE broadcasts the list when it is small and
    otherwise falls back to a shuffled anti-join that is skew-safe by
    key construction, so a hot boilerplate line never funnels through
    one reducer either way.

    ``base`` is evaluated twice (the explode and the final per-doc
    join); the cheap-front contract is enforced — a computed subtree
    is auto-checkpointed with a DoubleEvaluationWarning."""
    from cga_logs_to_kinesis_spark.plans.guards import cheap_front

    base = cheap_front(base, "scrub_with_fps")
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


def _scrub_oracle(threshold_sql: str) -> str:
    """The scrub oracle parameterized by the boilerplate threshold —
    shared by the absolute (BOILER_DF) and corpus-relative
    (df-share) registrations so the two forms can never drift."""
    return f"""
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
            WHERE nd >= {threshold_sql}
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
    """


register(QuerySpec(
    "line_dedup_scrub", q_line_dedup_scrub,
    oracle=_scrub_oracle(str(BOILER_DF)),
    doc="CCNet-style line-level dedup, the apply half: strip lines "
        "whose corpus doc-frequency crosses the threshold and "
        "reassemble each document in order; restoration proven "
        "byte-for-byte against the pre-poison text",
    tags=("dedup", "text", "quality", "apply"),
))


# Corpus-relative threshold share for the scale form: 2% of documents
# (an integer rational — see relative_min_df for why never a float).
DF_SHARE_NUM, DF_SHARE_DEN = 2, 100


def q_line_dedup_scrub_rel(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """The apply under the corpus-RELATIVE threshold (r14 verdict #2)
    — the form that holds at 100 TB: boilerplate = a line in >= 2% of
    documents (floored at BOILER_DF), which bounds the drop list at
    <= 50 line-shares regardless of corpus size and keeps the
    anti-join build side broadcastable at any scale.  ``n_docs`` is
    one bounded scalar count — the model-fitting convention
    (fit_stop_tokens); everything else is the shared scrub tail."""
    from cga_logs_to_kinesis_spark.sources import load_table

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    min_df = relative_min_df(docs.count(), DF_SHARE_NUM, DF_SHARE_DEN)
    base = (docs.select("doc_id",
                        F.col("text").alias("orig_text"),
                        poison_boilerplate().alias("text"))
            .localCheckpoint())
    return scrub_with_fps(base,
                          boilerplate_fps(line_flat(base), min_df))


register(QuerySpec(
    "line_dedup_scrub_rel", q_line_dedup_scrub_rel,
    oracle=_scrub_oracle(
        f"(SELECT GREATEST({BOILER_DF}, "
        f"(COUNT(*) * {DF_SHARE_NUM} + {DF_SHARE_DEN} - 1) "
        f"// {DF_SHARE_DEN}) FROM documents)"),
    doc="line-level dedup apply under the corpus-relative df-share "
        "threshold (ceil of 2% of documents, floored at the absolute "
        "minimum) — the 100 TB form whose drop list stays "
        "broadcastable at any corpus size; integer-rational ceil "
        "arithmetic written identically in both engines",
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
    the exploded lines, which is why the streaming twin and the
    pipeline composition use it — the registered batch query keeps
    the groupBy+join form, whose L·log L shuffle is the safe bound
    for pathological documents.  MEASURED on local[32] (min of 3):
    5000 docs x ~5 lines -> row-local 0.21 s vs groupBy 1.82 s
    (8.5x for the row-local form: zero shuffle); 32 docs x ~12.4k
    lines -> groupBy 1.63 s vs row-local 45.5 s (28x for the groupBy
    form: the quadratic probe bites around 10³-10⁴ lines/doc).
    Parity between the two implementations is pinned at BOTH shapes
    (test_line_dedup.py::test_intra_parity_adversarial_long_docs;
    same semantics, independent algorithms)."""
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


def intra_dedup_frame(base: DataFrame) -> DataFrame:
    """The groupBy+join form over ``base`` (doc_id, text): keep each
    >= LINE_MIN_CHARS line's first occurrence per document, short
    lines exempt.  Everything is doc_id-keyed (uniform by
    construction); the shuffle is O(L log L) in a document's line
    count — the safe bound for pathological million-line documents,
    where the row-local O(L²) twin (:func:`intra_dedup_columns`)
    degenerates.  ``base`` is evaluated twice (explode + final join;
    cheap-front contract enforced)."""
    from cga_logs_to_kinesis_spark.plans.guards import cheap_front

    base = cheap_front(base, "intra_dedup_frame")
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


def q_line_dedup_intra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line removal, first occurrence kept
    (poison proves the collapse; see :func:`poison_intra`)."""
    from cga_logs_to_kinesis_spark.sources import load_table

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    base = (docs.select("doc_id", poison_intra().alias("text"))
            .localCheckpoint())     # feeds first-pos fold + rebuild
    return intra_dedup_frame(base)


def line_profile_columns() -> dict[str, Column]:
    """The profile columns over a ``text`` column, shared by the
    batch query and the streaming twin
    (``streaming/corpus.py::streaming_doc_line_profile``) so the
    semantics cannot drift.  avg_line_chars uses the algebraic
    identity sum(len(line)) = len(text) - (n_lines - 1): one integer
    subtraction instead of a per-line fold, and a SINGLE int/int
    double division is IEEE-identical across engines."""
    lines = F.split("text", "\n", -1)        # NULL text -> NULL array
    n_lines = F.size(lines).cast("long")
    n_distinct = F.size(F.array_distinct(lines)).cast("long")
    line_chars = (F.length("text") - (n_lines - F.lit(1))) \
        .cast("long")
    return {
        "n_lines": n_lines.alias("n_lines"),
        "n_distinct_lines": n_distinct.alias("n_distinct_lines"),
        "n_dup_lines": (n_lines - n_distinct).alias("n_dup_lines"),
        "dup_line_ratio": F.try_divide(
            (n_lines - n_distinct).cast("double"),
            n_lines.cast("double")).alias("dup_line_ratio"),
        "max_line_chars": F.array_max(F.transform(lines, F.length))
        .cast("long").alias("max_line_chars"),
        "avg_line_chars": F.try_divide(
            line_chars.cast("double"),
            n_lines.cast("double")).alias("avg_line_chars"),
    }


def q_doc_line_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document line-structure profile — the cheap gating metric
    a line-dedup pass is tuned against: line counts, within-doc
    duplicate share, and line-length shape, ALL row-local
    higher-order functions over the split array (the plan is scan +
    project, zero shuffle, so at 100 TB it costs one pass and
    composes over a pure stream unchanged).  The corpus is poisoned
    with the intra-dedup poison so the duplicate columns have known
    non-trivial mass."""
    from cga_logs_to_kinesis_spark.sources import load_table

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select("doc_id", poison_intra().alias("text"))
            .select("doc_id", *line_profile_columns().values())
            .orderBy("doc_id"))


register(QuerySpec(
    "doc_line_profile", q_doc_line_profile,
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
        )
        SELECT doc_id,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(len(list_distinct(ls)) AS BIGINT)
                   AS n_distinct_lines,
               CAST(len(ls) - len(list_distinct(ls)) AS BIGINT)
                   AS n_dup_lines,
               CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
                   / CAST(len(ls) AS DOUBLE) AS dup_line_ratio,
               CAST(list_max(list_transform(ls, x -> len(x)))
                    AS BIGINT) AS max_line_chars,
               CAST(len(text) - (len(ls) - 1) AS DOUBLE)
                   / CAST(len(ls) AS DOUBLE) AS avg_line_chars
        FROM split
        ORDER BY doc_id
    """,
    doc="per-document line-structure profile (counts, within-doc "
        "duplicate share, line-length shape) — row-local "
        "higher-order functions only: scan + project, zero shuffle, "
        "streaming-composable",
    tags=("text", "quality", "report"),
))


def q_line_dedup_pipeline(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """The full RefinedWeb line-hygiene pass as ONE plan: intra-doc
    repeated-line removal first (row-locally, via
    :func:`intra_dedup_columns` — typical web documents are 10²-10³
    lines, where the O(L²) prefix probe beats shuffling the exploded
    corpus; parity with the groupBy form is pinned by the adversarial
    long-doc test), then the corpus-level boilerplate scrub FITTED ON
    THE INTRA-DEDUPED corpus (fitting before intra dedup would let a
    single spam page's thousandfold-repeated line vote its way over
    the document-frequency threshold).  One checkpoint materializes
    the intra-scrubbed base; the corpus half is the shared
    ``scrub_with_fps`` tail.  Both poisons are applied, and
    ``restored`` proves the pipeline returns the original text plus
    only the short exempt lines, byte-for-byte.  At scale, swap the
    absolute threshold for :func:`relative_min_df` — the composition
    is unchanged."""
    from cga_logs_to_kinesis_spark.sources import load_table

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    poisoned = docs.select(
        "doc_id", F.col("text").alias("orig"),
        poison_intra(poison_boilerplate()).alias("text"))
    _, n_drop_i, intra_text = intra_dedup_columns(F.col("text"))
    # the short exempt 'ok' lines survive both passes by design, so
    # the provable restoration target is orig + the exempt tail
    expected = F.when(F.col("orig").isNull(),
                      F.lit(None).cast("string")) \
        .otherwise(F.concat(F.col("orig"), F.lit("\nok\nok")))
    base = (poisoned.select(
        "doc_id", expected.alias("orig_text"),
        n_drop_i.alias("n_dropped_intra"),
        intra_text.alias("text"))
        .localCheckpoint())     # feeds fit, probe, and per-doc join
    scrubbed = scrub_with_fps(
        base.select("doc_id", "orig_text", "text"),
        boilerplate_fps(line_flat(base)))
    return (scrubbed
            .join(base.select("doc_id", "n_dropped_intra"), "doc_id")
            .select("doc_id", "n_dropped_intra", "n_lines",
                    F.col("n_dropped").alias("n_dropped_boiler"),
                    "scrubbed_text", "restored"))


register(QuerySpec(
    "line_dedup_pipeline", q_line_dedup_pipeline,
    oracle=f"""
        WITH pb AS ({POISON_SQL}),
        poisoned AS (
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN NULL ELSE
                       text
                       || CASE WHEN doc_id % 5 < 2
                               THEN chr(10) || '{INTRA_SPAM}'
                                    || chr(10) || '{INTRA_SPAM}'
                               ELSE '' END
                       || chr(10) || 'ok' || chr(10) || 'ok'
                   END AS text
            FROM pb
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
        ikept AS (
            SELECT f.doc_id, f.pos, f.line
            FROM flat f LEFT JOIN firsts m
              ON f.doc_id = m.doc_id AND f.line = m.line
            WHERE m.first_pos IS NULL OR f.pos = m.first_pos
        ),
        irebuilt AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos) AS itext,
                   COUNT(*) AS n_ikept
            FROM ikept GROUP BY doc_id
        ),
        ibase AS (
            SELECT p.doc_id,
                   CAST(COALESCE(len(string_split(p.text, chr(10))),
                                 0) AS BIGINT)
                       - COALESCE(r.n_ikept, 0) AS n_dropped_intra,
                   CASE WHEN p.text IS NULL THEN NULL
                        ELSE COALESCE(r.itext, '') END AS text
            FROM poisoned p LEFT JOIN irebuilt r USING (doc_id)
        ),
        split2 AS (
            SELECT doc_id, text, string_split(text, chr(10)) AS ls
            FROM ibase
        ),
        flat2 AS (
            SELECT doc_id, u['pos'] AS pos, u['line'] AS line
            FROM (SELECT doc_id,
                         UNNEST(list_transform(range(len(ls)), i ->
                             struct_pack(pos := i,
                                         line := ls[i + 1]))) AS u
                  FROM split2 WHERE text IS NOT NULL)
        ),
        boiler AS (
            SELECT line FROM (
                SELECT line, COUNT(*) AS nd
                FROM (SELECT DISTINCT line, doc_id FROM flat2
                      WHERE len(line) >= {LINE_MIN_CHARS})
                GROUP BY line)
            WHERE nd >= {BOILER_DF}
        ),
        kept2 AS (
            SELECT f.* FROM flat2 f
            WHERE f.line NOT IN (SELECT line FROM boiler)
        ),
        rebuilt2 AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos) AS scrubbed,
                   COUNT(*) AS n_kept
            FROM kept2 GROUP BY doc_id
        ),
        expected AS (
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE text || chr(10) || 'ok' || chr(10)
                             || 'ok' END AS want
            FROM documents
        )
        SELECT b.doc_id,
               CAST(b.n_dropped_intra AS BIGINT) AS n_dropped_intra,
               CAST(COALESCE(len(string_split(b.text, chr(10))), 0)
                    AS BIGINT) AS n_lines,
               CAST(COALESCE(len(string_split(b.text, chr(10))), 0)
                    - COALESCE(r.n_kept, 0) AS BIGINT)
                   AS n_dropped_boiler,
               CASE WHEN b.text IS NULL THEN NULL
                    ELSE COALESCE(r.scrubbed, '') END AS scrubbed_text,
               COALESCE(CASE WHEN b.text IS NULL THEN NULL
                             ELSE COALESCE(r.scrubbed, '') END = e.want,
                        b.text IS NULL AND e.want IS NULL) AS restored
        FROM ibase b
        LEFT JOIN rebuilt2 r USING (doc_id)
        JOIN expected e USING (doc_id)
    """,
    doc="full RefinedWeb line-hygiene pipeline in one plan: "
        "within-doc repeated-line removal (row-local prefix probe), "
        "then corpus-level boilerplate scrub fitted on the "
        "intra-deduped corpus; restoration proven byte-for-byte "
        "modulo the short exempt lines",
    tags=("dedup", "text", "quality", "apply", "pipeline"),
))


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
