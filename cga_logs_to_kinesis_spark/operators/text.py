"""Text-analysis operators over the documents table.

Language-ID, quality scoring, token counting, and fingerprinting —
each a pure column-expression pipeline (whole-stage codegen, no UDFs)
so throughput is scan-bound at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.functions.exact import davg_sql, dsum_sql
from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session, widen_for_explode
from cga_logs_to_kinesis_spark.sources import load_events, load_table


# Explicit whitespace class for EVERY cross-engine regex: Java's \s
# includes U+000B (vertical tab) but RE2's does not, so a bare \s can
# silently tokenize/normalize differently in Spark vs the DuckDB
# oracle (and poison dedup keys built on the result).  WS_PLUS is the
# Java pattern for F.split/F.regexp_replace, and is ALSO valid inside
# a DuckDB plain string literal (which passes backslashes through to
# RE2 unchanged); F.expr sites double the backslashes inline because
# Spark SQL literals unescape one level.
# Pinned by the \x0B row in tests/test_null_robustness.py.
WS_PLUS = r"[ \t\n\x0B\f\r]+"


def token_count(col: str = "text") -> Column:
    """Whitespace token count; 0 for NULL/empty/blank text.

    The NULL arm matters: in Spark's default (non-ANSI) mode
    ``size(split(NULL, ...))`` is -1, which would silently subtract
    from any SUM over a dirty corpus while the DuckDB oracle's NULL is
    skipped — a cross-engine divergence, not just a wrong number.
    """
    c = F.col(col)
    return F.when(c.isNull() | (F.length(F.trim(c)) == 0),
                  F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), WS_PLUS))).cast("long")


TOKEN_COUNT_SQL = ("CASE WHEN text IS NULL OR LENGTH(TRIM(text)) = 0 "
                   "THEN 0 "
                   f"ELSE len(regexp_split_to_array(TRIM(text), '{WS_PLUS}')) "
                   "END")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (token/char/doc counts)."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs
        .withColumn("n_tokens", token_count())
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


register(QuerySpec(
    "text_stats", q_text_stats,
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM({TOKEN_COUNT_SQL}) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents
        GROUP BY lang
    """,
    doc="token counting + per-language corpus stats",
    tags=("text", "north-star", "agg"),
))


def quality_feature_columns() -> dict[str, F.Column]:
    """The per-document quality signals as named Columns over ``text``
    — usable as a projection (batch report) or inline on any
    documents-shaped DataFrame, batch or streaming (all narrow)."""
    n_chars = F.length("text").cast("double")
    n_punct = (F.length("text")
               - F.length(F.regexp_replace("text", r"[.,;:!?]", "")))
    n_digit = (F.length("text")
               - F.length(F.regexp_replace("text", r"[0-9]", "")))
    n_space = (F.length("text")
               - F.length(F.regexp_replace("text", r" ", "")))
    toks = token_count()
    # try_divide, not /: ANSI mode throws on the zero-length documents
    # of a dirty corpus, while the DuckDB oracle yields NULL — NULL is
    # the agreed cross-engine value for an undefined ratio.
    return {
        "len_chars": F.length("text"),
        "n_tokens": toks,
        "punct_ratio": F.try_divide(n_punct, n_chars),
        "digit_ratio": F.try_divide(n_digit, n_chars),
        "space_ratio": F.try_divide(n_space, n_chars),
        "mean_token_len": F.try_divide(n_chars - n_space,
                                       toks.cast("double")),
    }


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-document quality signals: length, punctuation/digit/space
    ratios, mean token length.  All ratios are double arithmetic on
    integer counts — engine-exact."""
    cols = quality_feature_columns()
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()])


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return quality_features(load_table(spark, sf_dir, "documents"))


register(QuerySpec(
    "quality_features", q_quality_score,
    oracle=f"""
        SELECT doc_id,
               LENGTH(text) AS len_chars,
               {TOKEN_COUNT_SQL} AS n_tokens,
               (LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g')))
                   / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio,
               (LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))
                   / CAST(LENGTH(text) AS DOUBLE) AS digit_ratio,
               (LENGTH(text) - LENGTH(replace(text, ' ', '')))
                   / CAST(LENGTH(text) AS DOUBLE) AS space_ratio,
               CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
                   / ({TOKEN_COUNT_SQL}) AS mean_token_len
        FROM documents
    """,
    doc="quality scoring: punctuation/digit/space ratios, token stats",
    tags=("text", "north-star"),
))


# Tiny deterministic stopword table for the n-gram/stopword language
# heuristic.  At scale this is the canonical broadcast-join shape:
# the stopword list is bytes, the corpus is TBs.
_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is", "in", "it", "that"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "la", "los", "que", "es", "un", "una", "por"),
}


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: explode tokens, broadcast-join the
    stopword table, vote by hit count (ties → lexicographic, then
    'unknown' when nothing matches)."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    sw = spark.createDataFrame(
        [(lang, w) for lang, ws in _STOPWORDS.items() for w in ws],
        "sw_lang string, sw_word string")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), WS_PLUS))
        .alias("tok"))
    toks = toks.withColumn("tok", F.regexp_replace("tok", r"[^a-z]", ""))
    hits = (
        toks.join(F.broadcast(sw), toks.tok == sw.sw_word)
        .groupBy("doc_id", "lang", "sw_lang")
        .agg(F.count("*").alias("hits"))
    )
    from pyspark.sql.window import Window
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("hits").desc(), F.col("sw_lang")))
    best = (hits.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "lang",
                    F.col("sw_lang").alias("pred_lang"), "hits"))
    return (
        docs.select("doc_id", "lang")
        .join(best.select("doc_id", "pred_lang", "hits"), "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce("pred_lang", F.lit("unknown")).alias("pred_lang"),
            F.coalesce("hits", F.lit(0)).alias("stopword_hits"),
        )
    )


_SW_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in _STOPWORDS.items() for w in ws)

register(QuerySpec(
    "lang_id", q_lang_id,
    oracle=f"""
        WITH sw(sw_lang, sw_word) AS (VALUES {_SW_VALUES}),
        toks AS (
            SELECT doc_id, lang,
                   regexp_replace(t.tok, '[^a-z]', '', 'g') AS tok
            FROM documents,
                 UNNEST(regexp_split_to_array(lower(trim(text)), '{WS_PLUS}'))
                     AS t(tok)
        ),
        hits AS (
            SELECT doc_id, lang, sw_lang, COUNT(*) AS hits
            FROM toks JOIN sw ON tok = sw_word
            GROUP BY 1, 2, 3
        ),
        best AS (
            SELECT doc_id, sw_lang AS pred_lang, hits,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY hits DESC, sw_lang) AS rn
            FROM hits
        )
        SELECT d.doc_id, d.lang,
               COALESCE(b.pred_lang, 'unknown') AS pred_lang,
               COALESCE(b.hits, 0) AS stopword_hits
        FROM documents d
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
    """,
    doc="language ID: tokenize + broadcast stopword vote",
    tags=("text", "north-star", "join"),
))


def q_lang_mismatch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: the declared ``lang`` column vs the stopword
    language heuristic, as a (lang, pred_lang) confusion table with
    per-label shares.  At crawl scale the lang field is
    producer-supplied metadata and routinely wrong — a curation run
    uses this to decide which source×lang slices need re-detection
    before per-language sampling (``stratified_sample``) trusts the
    label.  ``unknown`` predictions (no stopword hits — CJK text
    against a Latin stopword table) are reported but not counted as
    mismatches.  Topology: composes ``lang_id`` (one corpus scan +
    broadcast stopword vote); the confusion table is |langs|² rows, so
    the share window is trivial."""
    tune_session(spark)
    from pyspark.sql.window import Window
    pred = q_lang_id(spark, sf_dir)
    per_label = Window.partitionBy("lang")
    return (pred.groupBy("lang", "pred_lang")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("example_doc"))
            .withColumn("is_mismatch",
                        (F.col("pred_lang") != F.col("lang"))
                        & (F.col("pred_lang") != "unknown"))
            .withColumn("label_share",
                        F.col("n_docs").cast("double")
                        / F.sum("n_docs").over(per_label))
            .orderBy("lang", "pred_lang"))


def _lang_mismatch_oracle() -> str:
    from cga_logs_to_kinesis_spark.registry import _REGISTRY
    lang_id = _REGISTRY["lang_id"].oracle
    return f"""
        WITH pred AS ({lang_id})
        SELECT lang, pred_lang,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS example_doc,
               pred_lang <> lang AND pred_lang <> 'unknown'
                   AS is_mismatch,
               CAST(COUNT(*) AS DOUBLE)
                   / SUM(COUNT(*)) OVER (PARTITION BY lang)
                   AS label_share
        FROM pred
        GROUP BY lang, pred_lang
        ORDER BY lang, pred_lang
    """


register(QuerySpec(
    "lang_mismatch_report", q_lang_mismatch_report,
    oracle=_lang_mismatch_oracle(),
    doc="label-noise audit: declared lang vs stopword-heuristic "
        "prediction as a confusion table with per-label shares — the "
        "gate before per-language sampling trusts producer metadata",
    tags=("text", "north-star", "quality", "audit"),
))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full digest + first-8-hex-chars prefix
    bucket (the shard key a fingerprint index would partition on)."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")),
                                            WS_PLUS, " ")))
    return docs.select(
        "doc_id",
        digest.alias("fingerprint"),
        F.substring(digest, 1, 8).alias("fp_bucket"),
        F.length("text").alias("len_chars"),
    )


register(QuerySpec(
    "doc_fingerprint", q_doc_fingerprint,
    oracle=f"""
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '{WS_PLUS}', ' ', 'g')))
                   AS fingerprint,
               SUBSTRING(md5(lower(regexp_replace(trim(text), '{WS_PLUS}',
                   ' ', 'g'))), 1, 8) AS fp_bucket,
               LENGTH(text) AS len_chars
        FROM documents
    """,
    doc="document fingerprinting (digest + shard bucket)",
    tags=("text", "north-star"),
))



# ---------------------------------------------------------------------------
# Hierarchical (hypertable-style) rollup: coarse aggregates derived
# from fine aggregates, not from raw rows.  At 100 TB the 5 s layer is
# the only scan; every coarser resolution is a re-aggregation of the
# (tiny) previous layer - the continuous-aggregate pattern.  The
# oracle computes the coarse layer directly from raw rows, proving the
# hierarchical derivation is lossless (sums/counts are associative).
# ---------------------------------------------------------------------------

def q_multi_resolution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    fine = (
        ev
        .withColumn("w5s", (F.expr("ts DIV 5000000000") * 5).cast("long"))
        .groupBy("w5s", "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(38,6)")).alias("sv"))
    )
    return (
        fine
        .withColumn("w1m", (F.expr("w5s DIV 60") * 60).cast("long"))
        .groupBy("w1m", "event_type")
        .agg(F.sum("n").alias("n_events"),
             F.sum("sv").cast("double").alias("sum_value"))
    )


register(QuerySpec(
    "multi_resolution_rollup", q_multi_resolution_rollup,
    oracle="""
        SELECT ((epoch_ns(ts) // 5000000000) * 5 // 60) * 60 AS w1m,
               event_type,
               COUNT(*) AS n_events,
               {sum_value}
        FROM events
        GROUP BY 1, 2
    """.format(sum_value=dsum_sql("value", "sum_value")),
    doc="hypertable-style hierarchical rollup (1m layer from 5s layer)",
    tags=("agg", "window-time", "rollup"),
))


# ---------------------------------------------------------------------------
# BPE-ish tokenization: the GPT-2 pretokenizer shape (letter runs,
# digit runs, punctuation runs) via regexp_extract_all - a closer
# token-count proxy than whitespace splitting, still pure codegen.
# ---------------------------------------------------------------------------

# Explicit whitespace set (not \s): see WS_PLUS.  One string serves
# both engines — Java interprets the escapes in the pattern, DuckDB
# passes them through its plain literal to RE2, which agrees.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0B\f\r]+"


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        token_count().alias("n_ws_tokens"),
        # try_divide: empty docs have 0 ws-tokens; ANSI would throw
        # where the oracle yields NULL.
        F.try_divide(F.size(toks).cast("double"), token_count())
        .alias("bpe_per_word"),
    )


register(QuerySpec(
    "bpe_token_counts", q_bpe_token_counts,
    oracle=f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{BPE_PATTERN}'))
                   AS n_bpe_tokens,
               {TOKEN_COUNT_SQL} AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PATTERN}'))
                    AS DOUBLE) / ({TOKEN_COUNT_SQL}) AS bpe_per_word
        FROM documents
    """,
    doc="BPE-ish pretokenizer counting (letter/digit/punct runs)",
    tags=("text", "north-star"),
))



def q_dedup_events_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup over a compound key ((user_id, event_type) by
    time) — the batch twin of the streaming first-seen dedup
    (streaming/stateful.py), expressed as a row_number window."""
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    from pyspark.sql.window import Window
    w = (Window.partitionBy("user_id", "event_type")
         .orderBy("ts", "event_id"))
    return (ev
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "event_id",
                    F.expr("ts DIV 1000").alias("first_us")))


register(QuerySpec(
    "dedup_events_first", q_dedup_events_first,
    oracle="""
        SELECT user_id, event_type, event_id,
               epoch_us(ts) AS first_us
        FROM (
            SELECT user_id, event_type, event_id, ts,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="keep-first dedup by compound key (batch twin of stateful dedup)",
    tags=("dedup", "window"),
))


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: per user, did a purchase follow the
    first signup?  Conditional aggregation over per-user firsts — one
    shuffle on user_id, no self-join."""
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup",
                         F.col("ts"))).alias("first_signup"),
            F.max(F.when(F.col("event_type") == "purchase",
                         F.col("ts"))).alias("last_purchase"),
        )
    )
    return (
        per_user
        .withColumn("signed_up", F.col("first_signup").isNotNull())
        .withColumn(
            "converted",
            F.col("first_signup").isNotNull()
            & F.col("last_purchase").isNotNull()
            & (F.col("last_purchase") >= F.col("first_signup")))
        .groupBy("signed_up")
        .agg(F.count("*").alias("n_users"),
             F.count(F.when(F.col("converted"), 1)).alias("n_converted"))
    )


register(QuerySpec(
    "funnel_conversion", q_funnel_conversion,
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END)
                       AS first_signup,
                   MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS last_purchase
            FROM events GROUP BY user_id
        )
        SELECT first_signup IS NOT NULL AS signed_up,
               COUNT(*) AS n_users,
               COUNT(CASE WHEN first_signup IS NOT NULL
                          AND last_purchase IS NOT NULL
                          AND last_purchase >= first_signup
                     THEN 1 END) AS n_converted
        FROM per_user
        GROUP BY 1
    """,
    doc="signup->purchase funnel (per-user firsts, no self-join)",
    tags=("agg", "funnel"),
))


def q_quality_filter_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed filtering pipeline: quality features -> thresholds
    -> surviving corpus with its stats.  This is the shape of a real
    pretraining data filter: all narrow expressions over one scan."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(docs)
    survivors = feats.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("punct_ratio") <= 0.10)
        & (F.col("digit_ratio") <= 0.20)
        & (F.col("mean_token_len") >= 3.0)
        & (F.col("mean_token_len") <= 12.0))
    return (
        docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_kept"),
             F.sum("n_chars").alias("kept_chars"))
    )


register(QuerySpec(
    "quality_filter_survivors", q_quality_filter_survivors,
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   {TOKEN_COUNT_SQL} AS n_tokens,
                   (LENGTH(text) - LENGTH(regexp_replace(text,
                        '[.,;:!?]', '', 'g')))
                       / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio,
                   (LENGTH(text) - LENGTH(regexp_replace(text,
                        '[0-9]', '', 'g')))
                       / CAST(LENGTH(text) AS DOUBLE) AS digit_ratio,
                   CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
                       / ({TOKEN_COUNT_SQL}) AS mean_token_len
            FROM documents
        )
        SELECT d.lang, d.source,
               COUNT(*) AS n_kept,
               CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
        FROM documents d
        WHERE EXISTS (
            SELECT 1 FROM feats f
            WHERE f.doc_id = d.doc_id
              AND f.n_tokens >= 10
              AND f.punct_ratio <= 0.10
              AND f.digit_ratio <= 0.20
              AND f.mean_token_len BETWEEN 3.0 AND 12.0)
        GROUP BY d.lang, d.source
    """,
    doc="composed quality-filter pipeline -> surviving corpus stats",
    tags=("text", "north-star", "filter"),
))



def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style salient terms per document: score = tf * N / df
    (the rational core of TF-IDF - logs are omitted because libm ln()
    rounding differs across engines, and the monotone transform does
    not change the per-document ranking for fixed tf).  Two hash-aggs
    (tf, df) + a broadcast of the df table; top-3 terms per doc by
    window."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = (widen_for_explode(docs, "doc_id")
            .select("doc_id",
                    F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                      r"[ \t\n\x0B\f\r]+")).alias("tok"))
            .withColumn("tok", F.regexp_replace("tok", r"[^a-z0-9]", ""))
            .filter(F.length("tok") >= 3))
    # metadata-only action (parquet count-star reads footers, not
    # data) — unlike a toks.count(), this costs no extra corpus scan
    n_docs = docs.count()
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_ = toks.select("doc_id", "tok").distinct()         .groupBy("tok").agg(F.count("*").alias("df"))
    from pyspark.sql.window import Window
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("score").desc(), F.col("tok")))
    return (
        tf.join(F.broadcast(df_), "tok")
        .withColumn("score",
                    (F.col("tf") * F.lit(float(n_docs))) / F.col("df"))
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", F.col("tok").alias("term"),
                "tf", "df", "score", "term_rank")
    )


register(QuerySpec(
    "tfidf_top_terms", q_tfidf_top_terms,
    oracle=r"""
        WITH toks AS (
            SELECT doc_id,
                   regexp_replace(t.tok, '[^a-z0-9]', '', 'g') AS tok
            FROM documents,
                 UNNEST(regexp_split_to_array(lower(trim(text)),
                        '[ \t\n\x0B\f\r]+')) AS t(tok)
        ),
        toks_f AS (SELECT * FROM toks WHERE LENGTH(tok) >= 3),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf
               FROM toks_f GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(*) AS df FROM
               (SELECT DISTINCT doc_id, tok FROM toks_f) GROUP BY tok),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
        SELECT doc_id, tok AS term, tf, df, score, term_rank FROM (
            SELECT tf.doc_id, tf.tok, tf.tf, df.df,
                   (tf.tf * n.n_docs) / df.df AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY (tf.tf * n.n_docs) / df.df DESC, tf.tok
                   ) AS term_rank
            FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        ) WHERE term_rank <= 3
    """,
    doc="TF-IDF salient terms per doc (rational score, log-free)",
    tags=("text", "north-star", "agg", "topk"),
))


def q_quality_percentile_calibrate(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Threshold-free quality gating: convert a raw quality signal
    (mean token length) into its per-language PERCENT_RANK and keep
    the top 80% of each language.

    Absolute quality thresholds drift across languages and crawls; a
    per-language percentile is self-calibrating — "drop the worst 20%
    of each language" means the same thing on every corpus, which is
    how production filters (Gopher, FineWeb) are actually tuned.
    NULL scores (empty/blank/NULL text) are excluded BEFORE ranking on
    both engines: Spark orders NULLS FIRST ascending while DuckDB
    defaults to NULLS LAST, so ranking them would diverge — and a
    document with no measurable quality belongs in the quarantine
    report (`jsonl_ingest_report`), not the calibration.

    Scale: percent_rank shuffles once on lang — a handful of
    partitions each sortable in parallel; the signal itself is narrow
    column math.  Skewed language mix (English = half the corpus) is
    the known hazard: at 100 TB swap the exact window for
    approx_percentile-derived cutoffs per lang (tiny dim table,
    broadcast back), the same exact-for-oracle / sketch-at-scale swap
    as `length_outliers`.
    """
    from pyspark.sql.window import Window

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_space = (F.length("text")
               - F.length(F.regexp_replace("text", r" ", "")))
    score = F.try_divide((F.length("text") - n_space).cast("double"),
                         token_count().cast("double"))
    scored = (docs.select("doc_id", "lang",
                          score.alias("mean_token_len"))
              .filter(F.col("mean_token_len").isNotNull()))
    w = Window.partitionBy("lang").orderBy("mean_token_len")
    return (scored
            .withColumn("quality_pct", F.percent_rank().over(w))
            .withColumn("keep",
                        (F.col("quality_pct") >= 0.2).cast("int"))
            .orderBy("lang", "quality_pct", "doc_id"))


register(QuerySpec(
    "quality_percentile_calibrate", q_quality_percentile_calibrate,
    oracle=f"""
        WITH f AS (
            SELECT doc_id, lang,
                   CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
                       / ({TOKEN_COUNT_SQL}) AS mean_token_len
            FROM documents
        ),
        nn AS (
            SELECT * FROM f WHERE mean_token_len IS NOT NULL
        )
        SELECT doc_id, lang, mean_token_len,
               PERCENT_RANK() OVER
                   (PARTITION BY lang ORDER BY mean_token_len)
                   AS quality_pct,
               CAST(PERCENT_RANK() OVER
                   (PARTITION BY lang ORDER BY mean_token_len) >= 0.2
                   AS INT) AS keep
        FROM nn
        ORDER BY lang, quality_pct, doc_id
    """,
    doc="per-language percent_rank calibration of a quality signal "
        "with a keep-top-80% gate — threshold-free quality filtering",
    tags=("text", "north-star", "window"),
))
