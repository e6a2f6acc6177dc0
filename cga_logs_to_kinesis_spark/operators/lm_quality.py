"""Language-model-driven quality scoring (CCNet / DSIR / Gopher).

Three operators a pretraining pipeline runs to *score and select*
documents, complementing the corpus-statistics family in
``corpus_quality.py``:

* ``bigram_surprisal`` — conditional bigram-LM scoring, the direct
  analogue of CCNet's KenLM perplexity split (Wenzek et al., "CCNet",
  2020) one order up from ``unigram_rarity``'s marginal model.  The LM
  is add-one (Laplace) smoothed: p(w|prev) = (C(prev,w)+1) /
  (C(prev)+V).  Real CCNet reports exp(mean -ln p); the engine scores
  the log-free monotone surrogate mean 1/p(w|prev) = mean
  (C(prev)+V)/(C(prev,w)+1) — same ordering for fixed document
  length, and a ratio of exact integers so the score is bit-identical
  across engines and partitionings (libm ``ln`` rounding differs;
  same reasoning as ``unigram_rarity`` / ``tfidf_top_terms``).
* ``dsir_importance`` — Data Selection via Importance Resampling
  (Xie et al., NeurIPS 2023): weight each raw document by how much
  its features look drawn from a *target* domain rather than the raw
  corpus.  Features here are unigrams (DSIR §2 uses hashed n-grams;
  at web scale the token key would be bucketed by a hash to bound the
  feature table — documented deviation, the fixture vocabulary is 30
  types).  The per-token likelihood ratio is Laplace-smoothed
  p_tgt(t)/p_raw(t); the per-document weight is the log-free mean of
  ratios rather than DSIR's sum of log-ratios (monotone in the same
  direction for fixed length, exact across engines).  The target
  domain is ``lang = 'en'``, the corpus' dominant slice.
* ``gopher_quality`` — the Gopher rule battery (Rae et al. 2021,
  Table A1) rows not already covered by ``gopher_repetition`` (its
  repetition rules) or ``quality_features`` (punct/digit ratios):
  word-count bounds, mean-word-length window, alphabetic-word ratio,
  and minimum stop-word hits.  Entirely row-local.

100 TB topology: ``gopher_quality`` is map-only (plan-asserted: zero
exchanges) — scan-bound at any scale.  The two LM scorers follow the
``unigram_rarity`` discipline: tokenize ONCE into a
``localCheckpoint`` (the subtree would otherwise be re-evaluated for
each count table and again as the join probe — redundant full corpus
scans at 100 TB), aggregate counts at vocabulary/bigram-vocabulary
granularity (Zipf-hot keys absorbed by partial aggs + AQE skew
splits), and join the exploded tokens back with plain equi-joins —
NOT broadcasts, because web-scale unigram (~1e8) and especially
bigram (~1e10) vocabularies outgrow a broadcast even though the
fixture's doesn't.  Corpus scalars (vocabulary size, token totals)
ride along as 1-row broadcast frames derived in-plan from the count
tables — never driver-side ``count()`` actions, which would force an
extra full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.functions.exact import davg, davg_sql
from cga_logs_to_kinesis_spark.operators.corpus_quality import (
    NORM_TOKENS_SQL,
    norm_tokens,
)
from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import (
    tune_session,
    widen_for_explode,
)
from cga_logs_to_kinesis_spark.sources import load_table


# ---------------------------------------------------------------------------
# bigram_surprisal
# ---------------------------------------------------------------------------

def surprisal_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, surprisal_score) — the bigram-LM scoring
    core, shared by ``bigram_surprisal`` (the report) and
    ``perplexity_split`` (the CCNet bucketing built on it) so the LM
    definition cannot drift between them.

    score(doc) = mean over bigrams (prev,w) of (C(prev)+V)/(C(prev,w)+1)
    under add-one smoothing: ≥1, small for documents whose word
    transitions the corpus has seen often, large for unusual
    transitions.  CCNet keeps the low-perplexity (here: low-score)
    head for its quality split.

    C(prev) is the *context* count — occurrences of ``prev`` as the
    left element of a bigram (i.e. token occurrences excluding each
    document's final token), the standard bigram-LM denominator so the
    conditional distribution sums to 1 over w.  V is the corpus
    vocabulary (distinct types over bigram positions).
    """
    bi = doc_bigrams(docs)
    freq2 = bi.groupBy("prev", "w").agg(F.count("*").alias("c_bg"))
    return surprisal_from_counts(bi, freq2)


def doc_bigrams(docs: DataFrame, checkpoint: bool = True) -> DataFrame:
    """(doc_id, prev, w): every bigram instance of every document
    with >= 2 tokens — the LM core's corpus-scale front, tokenized
    ONCE into a ``localCheckpoint`` (module docstring: the subtree
    feeds the count tables and the join probe — redundant full scans
    without the cut).  ``checkpoint=False`` for single-consumer
    contexts (the streaming sink's per-batch partial agg)."""
    bi = (widen_for_explode(docs, "doc_id")
          .withColumn("_toks", norm_tokens())
          .filter(F.size("_toks") >= 2)
          .select(
              "doc_id",
              F.explode(F.expr(
                  "transform(sequence(1, size(_toks) - 1), "
                  "i -> struct(element_at(_toks, i) as prev, "
                  "element_at(_toks, i + 1) as w))")).alias("bg"))
          .select("doc_id", "bg.prev", "bg.w"))
    return bi.localCheckpoint() if checkpoint else bi


def surprisal_from_counts(bi: DataFrame, freq2: DataFrame) -> DataFrame:
    """Score the bigram instances ``bi`` against a (prev, w, c_bg)
    count table: the whole LM derives from ``freq2`` alone — the
    context counts are its per-prev sums (every occurrence of prev as
    a left element is in exactly one (prev, w) group) and the
    vocabulary is the distinct types over its keys.  That single-table
    factoring is what lets the streaming bigram-count store carry the
    model: a folded freq2 IS the LM.

    Joins are LEFT with zero-coalesce so a tranche containing bigrams
    the count corpus never saw still scores (add-one smoothing's
    unseen case: (0 + V) / (0 + 1)); in the batch path every instance
    matches its own counts, so values are unchanged — identical to
    the inner-join oracle.

    Aggregating ctx/vocab from freq2 instead of from ``bi`` also
    drops two corpus-scale aggregations to vocabulary-squared scale —
    the cheaper shape at 100 TB.
    """
    ctx = freq2.groupBy("prev").agg(F.sum("c_bg").alias("c_prev"))
    vocab = (freq2.select(F.col("prev").alias("t"))
             .union(freq2.select(F.col("w").alias("t")))
             .distinct()
             .agg(F.count("*").alias("v")))
    inv = ((F.coalesce(F.col("c_prev"), F.lit(0)) + F.col("v"))
           .cast("double")
           / (F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(1))
           .cast("double"))
    return (bi.join(freq2, ["prev", "w"], "left")
            .join(ctx, "prev", "left")
            .crossJoin(F.broadcast(vocab))
            .withColumn("inv", inv)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 davg("inv", "surprisal_score")))


def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return surprisal_scores(load_table(spark, sf_dir, "documents"))


# The scoring pipeline as a reusable CTE block ending in a
# ``surprisal`` relation (doc_id, n_bigrams, surprisal_score) — the
# SQL twin of :func:`surprisal_scores`.
SURPRISAL_SQL_CTES = f"""
        d AS (
            SELECT doc_id, toks FROM
                (SELECT doc_id, {NORM_TOKENS_SQL} AS toks FROM documents)
            WHERE len(toks) >= 2
        ),
        bi AS (
            SELECT doc_id, toks[i] AS prev, toks[i + 1] AS w
            FROM d, UNNEST(range(1, len(toks))) AS r(i)
        ),
        ctx AS (SELECT prev, COUNT(*) AS c_prev FROM bi GROUP BY prev),
        freq2 AS (
            SELECT prev, w, COUNT(*) AS c_bg FROM bi GROUP BY prev, w
        ),
        vocab AS (
            SELECT COUNT(*) AS v FROM
                (SELECT prev AS t FROM bi UNION SELECT w FROM bi)
        ),
        surprisal AS (
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   {davg_sql('CAST(c_prev + v AS DOUBLE)'
                             ' / CAST(c_bg + 1 AS DOUBLE)',
                             'surprisal_score')}
            FROM bi JOIN freq2 USING (prev, w) JOIN ctx USING (prev)
                 CROSS JOIN vocab
            GROUP BY doc_id
        )
"""

register(QuerySpec(
    "bigram_surprisal", q_bigram_surprisal,
    oracle=f"""
        WITH {SURPRISAL_SQL_CTES.strip()}
        SELECT doc_id, n_bigrams, surprisal_score FROM surprisal
    """,
    doc="CCNet-style conditional bigram-LM quality score "
        "(mean inverse add-one-smoothed p(w|prev), log-free exact)",
    tags=("text", "north-star", "quality", "agg"),
))


# ---------------------------------------------------------------------------
# dsir_importance
# ---------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight of every raw document vs the target
    domain (``lang = 'en'``).

    weight(doc) = mean over tokens t of
        ((C_tgt(t)+1)/(T_tgt+V)) * ((T_raw+V)/(C_raw(t)+1))

    — the Laplace-smoothed per-token likelihood ratio
    p_tgt(t)/p_raw(t), averaged.  > its corpus mean ⇒ the document
    looks more target-like than a random raw document; DSIR then
    resamples proportionally (the resampling step is
    ``stratified_sample``'s job — this operator produces the weights).
    The two divisions and one multiplication are evaluated in the
    same order on both engines, so the doubles agree bit-for-bit.
    """
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    # Tokenize ONCE (module docstring): feeds raw counts, target
    # counts, and the join probe.
    toks = (widen_for_explode(docs, "doc_id")
            .select("doc_id", "lang",
                    F.explode(norm_tokens()).alias("tok"))
            .localCheckpoint())
    raw = toks.groupBy("tok").agg(F.count("*").alias("c_raw"))
    tgt = (toks.filter(F.col("lang") == DSIR_TARGET_LANG)
           .groupBy("tok").agg(F.count("*").alias("c_tgt")))
    # Corpus scalars in-plan from the (vocabulary-sized) count tables.
    tot = raw.agg(F.sum("c_raw").cast("double").alias("t_raw"),
                  F.count("*").cast("double").alias("v"))
    ttot = tgt.agg(F.coalesce(F.sum("c_tgt"), F.lit(0))
                   .cast("double").alias("t_tgt"))
    feat = (raw.join(tgt, "tok", "left")
            .withColumn("c_tgt", F.coalesce("c_tgt", F.lit(0))))
    ratio = (((F.col("c_tgt") + F.lit(1)).cast("double")
              / (F.col("t_tgt") + F.col("v")))
             * ((F.col("t_raw") + F.col("v"))
                / (F.col("c_raw") + F.lit(1)).cast("double")))
    return (toks.join(feat, "tok")
            .crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(ttot))
            .withColumn("r", ratio)
            .groupBy("doc_id", "lang")
            .agg(F.count("*").alias("n_toks"),
                 davg("r", "dsir_weight")))


register(QuerySpec(
    "dsir_importance", q_dsir_importance,
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, t.tok
            FROM (SELECT doc_id, lang, {NORM_TOKENS_SQL} AS l
                  FROM documents),
                 UNNEST(l) AS t(tok)
        ),
        raw AS (SELECT tok, COUNT(*) AS c_raw FROM toks GROUP BY tok),
        tgt AS (SELECT tok, COUNT(*) AS c_tgt FROM toks
                WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY tok),
        tot AS (SELECT CAST(SUM(c_raw) AS DOUBLE) AS t_raw,
                       CAST(COUNT(*) AS DOUBLE) AS v FROM raw),
        ttot AS (SELECT CAST(COALESCE(SUM(c_tgt), 0) AS DOUBLE)
                        AS t_tgt FROM tgt),
        feat AS (
            SELECT raw.tok, c_raw, COALESCE(c_tgt, 0) AS c_tgt
            FROM raw LEFT JOIN tgt USING (tok)
        )
        SELECT doc_id, lang, COUNT(*) AS n_toks,
               {davg_sql('(CAST(c_tgt + 1 AS DOUBLE) / (t_tgt + v))'
                         ' * ((t_raw + v)'
                         ' / CAST(c_raw + 1 AS DOUBLE))',
                         'dsir_weight')}
        FROM toks JOIN feat USING (tok)
             CROSS JOIN tot CROSS JOIN ttot
        GROUP BY doc_id, lang
    """,
    doc="DSIR importance weights vs the lang='en' target domain "
        "(Laplace likelihood-ratio mean, log-free exact)",
    tags=("text", "north-star", "quality", "agg"),
))


# ---------------------------------------------------------------------------
# gopher_quality
# ---------------------------------------------------------------------------

# Rule thresholds, scaled to the fixture corpus (10–99-word docs; the
# Gopher paper's 50–100 000 window assumes web pages).  The *structure*
# — bounds on word count and mean word length, an alphabetic-word
# floor, a stop-word minimum — is Table A1's.
GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 90
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOP_HITS = 2
# Gopher's stop list is English function words; the fixture corpus is
# English-token-based in every lang slice.  A per-language table would
# slot in via the lang_id broadcast-join shape (text.py::_STOPWORDS).
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "is", "in", "that")


def gopher_quality_columns() -> dict[str, Column]:
    """The rule battery as named Column expressions over ``text`` —
    shared verbatim by the batch query and the streaming twin, so
    batch/stream parity holds by construction."""
    words = F.split(F.trim(F.col("text")), r"[ \t\n\x0B\f\r]+")
    n_words = F.size(words)
    mean_len = (F.expr(
        "aggregate(transform(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), "
        "w -> length(w)), 0L, (acc, x) -> acc + x)")
        / n_words.cast("double"))
    alpha_ratio = (F.size(F.expr(
        "filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), "
        "w -> w rlike '[A-Za-z]')"))
        / n_words.cast("double"))
    # coalesce: on NULL text the intersect is NULL, but the oracle's
    # list_filter-over-NULL yields 0 hits (and keep=false via the
    # NULL-AND-FALSE conjunction) — 0 is the agreed value.
    stop_hits = F.coalesce(
        F.size(F.array_intersect(
            norm_tokens(),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))),
        F.lit(0))
    return {
        "n_words": n_words.alias("n_words"),
        "mean_word_len": mean_len.alias("mean_word_len"),
        "alpha_word_ratio": alpha_ratio.alias("alpha_word_ratio"),
        "stop_hits": stop_hits.alias("stop_hits"),
        "keep": (
            n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
            & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
            & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
            & (alpha_ratio >= GOPHER_MIN_ALPHA_RATIO)
            & (stop_hits >= GOPHER_MIN_STOP_HITS)).alias("keep"),
    }


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule features and keep/drop verdict.

    Row-local: every rule is arithmetic over one document's words, so
    the plan is a single map stage over the scan — no exchange
    (plan-asserted), scan-bound at 100 TB.
    """
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    cols = gopher_quality_columns()
    return docs.select("doc_id", "lang", *cols.values())


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"

register(QuerySpec(
    "gopher_quality", q_gopher_quality,
    oracle=f"""
        WITH f AS (
            SELECT doc_id, lang,
                   regexp_split_to_array(TRIM(text), '[ \\t\\n\\x0B\\f\\r]+') AS words,
                   {NORM_TOKENS_SQL} AS toks
            FROM documents
        ), feats AS (
            SELECT doc_id, lang,
                   len(words) AS n_words,
                   list_sum(list_transform(words, w -> len(w)))
                       / CAST(len(words) AS DOUBLE) AS mean_word_len,
                   len(list_filter(words,
                       w -> regexp_matches(w, '[A-Za-z]')))
                       / CAST(len(words) AS DOUBLE)
                       AS alpha_word_ratio,
                   len(list_filter({_STOP_SQL}::VARCHAR[],
                       s -> list_contains(toks, s))) AS stop_hits
            FROM f
        )
        SELECT doc_id, lang, n_words, mean_word_len, alpha_word_ratio,
               stop_hits,
               n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                   AND mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
                   AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN}
                   AND alpha_word_ratio >= {GOPHER_MIN_ALPHA_RATIO}
                   AND stop_hits >= {GOPHER_MIN_STOP_HITS} AS keep
        FROM feats
    """,
    doc="Gopher rule battery: word-count bounds, mean word length, "
        "alphabetic-word ratio, stop-word minimum",
    tags=("text", "north-star", "quality"),
))


# ---------------------------------------------------------------------------
# perplexity_split — the CCNet head/middle/tail bucketing
# ---------------------------------------------------------------------------
# CCNet's defining move (Wenzek et al. 2020 §4.3): score every document
# with the LM, then split EACH LANGUAGE into equal thirds by score —
# head (most fluent), middle, tail (usually discarded) — so the cutoffs
# self-calibrate per language instead of importing an absolute
# threshold that means different things for en and zh.  Built directly
# on the shared ``surprisal_scores`` core (ascending score = CCNet's
# ascending perplexity).
#
# Tertile mechanics are integer-exact: rank*3 <= n (head),
# rank*3 <= 2n (middle) with rank = ROW_NUMBER ordered by
# (surprisal_score, doc_id) — the score is bit-identical across
# engines (davg decimal algebra), the doc_id tiebreak makes the order
# total, and no float percentile function (whose boundary semantics
# differ between engines) is involved.  Documents too short to score
# (< 2 tokens) are excluded by the LM core on both engines — they
# belong to the quarantine report (`jsonl_ingest_report`), same
# convention as quality_percentile_calibrate's NULL exclusion.
#
# 100 TB: the split adds one lang-keyed window over the DOC-level
# score frame (3 narrow columns, |docs| rows — tiny next to the LM
# scoring it follows).  Skewed language mix is the known hazard; the
# documented swap is approx_percentile cutoffs per lang broadcast
# back (quality_percentile_calibrate's note) — exact-for-oracle,
# sketch-at-scale.

def perplexity_buckets(scored: DataFrame) -> DataFrame:
    """(doc_id, lang, surprisal_score) -> + (bucket, keep): the CCNet
    head/middle/tail tertile tail over a scored frame — shared by the
    batch query and the bigram-count-store reader
    (``streaming/corpus.py::perplexity_split_from_store``) so the
    bucketing rule cannot drift between them."""
    w = Window.partitionBy("lang").orderBy("surprisal_score", "doc_id")
    part = Window.partitionBy("lang")
    rank = F.row_number().over(w)
    n = F.count("*").over(part)
    bucket = (F.when(rank * 3 <= n, "head")
              .when(rank * 3 <= 2 * n, "middle")
              .otherwise("tail"))
    return (scored
            .select("doc_id", "lang", "surprisal_score",
                    bucket.alias("bucket"))
            .withColumn("keep", F.col("bucket") != "tail"))


def q_perplexity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return perplexity_buckets(
        surprisal_scores(docs)
        .join(docs.select("doc_id", "lang"), "doc_id"))


register(QuerySpec(
    "perplexity_split", q_perplexity_split,
    oracle=f"""
        WITH {SURPRISAL_SQL_CTES.strip()},
        scored AS (
            SELECT s.doc_id, d.lang, s.surprisal_score
            FROM surprisal s JOIN documents d ON s.doc_id = d.doc_id
        ),
        ranked AS (
            SELECT doc_id, lang, surprisal_score,
                   ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY surprisal_score, doc_id) AS rank,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM scored
        )
        SELECT doc_id, lang, surprisal_score,
               CASE WHEN rank * 3 <= n THEN 'head'
                    WHEN rank * 3 <= 2 * n THEN 'middle'
                    ELSE 'tail' END AS bucket,
               NOT (rank * 3 > 2 * n) AS keep
        FROM ranked
    """,
    doc="CCNet head/middle/tail split: per-language LM-score tertiles "
        "(integer-exact ranks, no float percentile boundary)",
    tags=("text", "north-star", "quality", "window"),
))


# ---------------------------------------------------------------------------
# quality_classifier — hashing-trick linear keep/drop scorer
# ---------------------------------------------------------------------------
# The CCNet / LLaMA curation stage the rule batteries above don't
# cover: a *trained* linear classifier over hashed bag-of-words
# features (fastText's model shape — Joulin et al. 2017, "Bag of
# Tricks"; applied as the wiki-reference quality filter in CCNet
# (Wenzek 2020 §4.3) and LLaMA (Touvron 2023 §2)).  The engine
# implements the APPLY half: score(doc) = bias + mean over tokens of
# w[h(token) mod B] — a linear model over B hashed feature buckets.
#
# Model-as-fixture convention: real pipelines load trained weights
# from an artifact; here the weight table is a FIXED PUBLIC function
# of the bucket id (md5-derived integer milliweights in
# [-QCLF_WEIGHT_SPAN, +QCLF_WEIGHT_SPAN]), so both engines derive
# the identical model in-expression and the scorer itself is what's
# under test.  Two-level hashing keeps the hashing trick's collision
# structure: tokens share a weight iff they share a bucket.
#
# Exactness: weights are integers, the per-doc sum is an exact
# bigint fold, and the decision boundary keep = (sum + bias*n >= 0)
# is INTEGER arithmetic — no float compare anywhere.  The reported
# score is one double division of exact integers (bit-identical
# across engines).  The sigmoid fastText applies is a monotone
# calibration: keep ≡ sigmoid(score) >= 1/2 at the zero threshold,
# so it is omitted per the repo's log/exp-free exactness convention
# (the surprisal/dsir precedent).
#
# 100 TB: the apply is MAP-ONLY — tokenize, hash, fold, compare, all
# row-local narrow expressions in whole-stage codegen; zero
# exchanges (plan-asserted), scan-bound at any scale.  A real
# trained model swaps the in-expression weight derivation for a
# broadcast of the weight vector (B = 2^21 floats ≈ 8 MB — one
# torrent to each executor, apply still map-only); the bucket
# hashing and fold shape are unchanged.

QCLF_BUCKETS = 1024        # fixture-scale B; fastText uses 2^21
QCLF_WEIGHT_SPAN = 1000    # integer milliweights in [-1000, 1000]
QCLF_BIAS_MILLI = -25      # nonzero so the boundary isn't symmetric


def _qclf_bucket(tok_expr: str) -> str:
    """Spark SQL: the token's hashed feature bucket — shared by the
    fixed-weight scorer and the trained probe so the feature space is
    one definition."""
    return (f"cast(conv(substring(md5(concat('qb:', {tok_expr})), "
            f"1, 15), 16, 10) as bigint) % {QCLF_BUCKETS}")


def _qclf_bucket_sql(tok_expr: str) -> str:
    """DuckDB twin of :func:`_qclf_bucket` (same md5/hex-cast algebra
    as the dedup fingerprints — both casts are positive, so plain %
    agrees)."""
    return (f"CAST(('0x' || substr(md5('qb:' || {tok_expr}), 1, 15))"
            f" AS BIGINT) % {QCLF_BUCKETS}")


def _qclf_w(tok_expr: str) -> str:
    """Spark SQL: integer milliweight of one token — bucket by md5,
    then the bucket's fixed public weight by a second md5."""
    bucket = _qclf_bucket(tok_expr)
    return (f"(cast(conv(substring(md5(concat('qw:', "
            f"cast(({bucket}) as string))), 1, 15), 16, 10) as bigint)"
            f" % {2 * QCLF_WEIGHT_SPAN + 1}) - {QCLF_WEIGHT_SPAN}")


def _qclf_w_sql(tok_expr: str) -> str:
    """The DuckDB twin of :func:`_qclf_w`."""
    bucket = _qclf_bucket_sql(tok_expr)
    return (f"(CAST(('0x' || substr(md5('qw:' || "
            f"CAST(({bucket}) AS VARCHAR)), 1, 15)) AS BIGINT)"
            f" % {2 * QCLF_WEIGHT_SPAN + 1}) - {QCLF_WEIGHT_SPAN}")


def classifier_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, source, lang, n_toks, clf_milli, clf_score, keep) —
    the linear-classifier apply, shared by the report and the
    survivor filter so the model cannot drift between them.

    clf_milli = sum over tokens of w[h(t)] + bias * n_toks (exact
    bigint); clf_score = clf_milli / (1000 * n_toks); keep =
    clf_milli >= 0.  Documents with no tokens are excluded (the
    quarantine report's jurisdiction, the LM scorers' convention).
    """
    return (docs
            .withColumn("_toks", norm_tokens())
            .filter(F.size("_toks") >= 1)
            .select(
                "doc_id", "source", "lang",
                F.size("_toks").alias("n_toks"),
                F.expr(
                    f"aggregate(_toks, cast(0 as bigint), "
                    f"(acc, t) -> acc + ({_qclf_w('t')}))"
                ).alias("_wsum"))
            .withColumn(
                "clf_milli",
                F.col("_wsum") + F.lit(QCLF_BIAS_MILLI) * F.col("n_toks"))
            .withColumn(
                "clf_score",
                F.col("clf_milli").cast("double")
                / (F.lit(float(QCLF_WEIGHT_SPAN)) * F.col("n_toks")))
            .withColumn("keep", F.col("clf_milli") >= 0)
            .drop("_wsum"))


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return classifier_scores(load_table(spark, sf_dir, "documents"))


def q_quality_classifier_apply(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The survivor half: the corpus filtered to keep = true — the
    frame the next pipeline stage trains on."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (classifier_scores(docs)
            .filter(F.col("keep"))
            .select("doc_id", "source", "lang", "n_toks", "clf_score"))


# Shared oracle CTE block ending in a ``clf`` relation — the SQL twin
# of :func:`classifier_scores` (SURPRISAL_SQL_CTES convention).
QCLF_SQL_CTES = f"""
        qtoks AS (
            SELECT doc_id, source, lang, {NORM_TOKENS_SQL} AS toks
            FROM documents
        ),
        qsummed AS (
            SELECT doc_id, source, lang,
                   len(toks) AS n_toks,
                   CAST(list_sum(list_transform(toks,
                       t -> {_qclf_w_sql('t')})) AS BIGINT)
                   + ({QCLF_BIAS_MILLI} * len(toks)) AS clf_milli
            FROM qtoks WHERE len(toks) >= 1
        ),
        clf AS (
            SELECT doc_id, source, lang, CAST(n_toks AS INT) AS n_toks,
                   clf_milli,
                   CAST(clf_milli AS DOUBLE)
                       / ({float(QCLF_WEIGHT_SPAN)} * n_toks) AS clf_score,
                   clf_milli >= 0 AS keep
            FROM qsummed
        )
"""

register(QuerySpec(
    "quality_classifier", q_quality_classifier,
    oracle=f"""
        WITH {QCLF_SQL_CTES.strip()}
        SELECT doc_id, source, lang, n_toks, clf_milli, clf_score,
               keep
        FROM clf
    """,
    doc="fastText-style hashing-trick linear quality scorer "
        "(md5-bucketed features, fixed public milliweights, "
        "integer-exact keep boundary; map-only apply)",
    tags=("text", "north-star", "quality", "classifier"),
))

register(QuerySpec(
    "quality_classifier_apply", q_quality_classifier_apply,
    oracle=f"""
        WITH {QCLF_SQL_CTES.strip()}
        SELECT doc_id, source, lang, n_toks, clf_score
        FROM clf WHERE keep
    """,
    doc="the classifier's survivors: corpus filtered to keep = true",
    tags=("text", "north-star", "quality", "classifier", "filter"),
))


# ---------------------------------------------------------------------------
# quality_classifier_train / _eval — the TRAINED probe
# ---------------------------------------------------------------------------
# quality_classifier applies a model-as-fixture; these two close the
# loop by TRAINING the probe distributed and evaluating it, entirely
# in-engine.  The model is the difference-of-class-means linear
# classifier over the same hashed feature space (Rocchio's relevance
# classifier / nearest-class-centroid — the closed-form linear probe),
# with add-one smoothing on the class-conditional bucket estimates
# (the module's Laplace convention — and what keeps a single-class
# tranche, e.g. a monolingual crawl slice, defined instead of
# dividing by a zero class total):
#
#     w_b = P̂(b | target) − P̂(b | rest)
#         = (n_pos_b + 1) / (N_pos + B) − (n_neg_b + 1) / (N_neg + B)
#
# with the DSIR convention's target domain (lang = 'en').  Training is
# ONE aggregation pass: explode tokens, bucket-keyed groupBy with two
# conditional sums — the map-side-combinable shape that trains on
# 100 TB in a single scan (B bucket rows of state, never corpus-
# sized), which is exactly why production pipelines reach for linear
# probes over hashed features at this scale (fastText's trick minus
# the iterative softmax).
#
# Exactness: counts are integers; the decision clears denominators —
# a doc is predicted target iff
#     Σ_tokens ((n_pos_b + 1)(N_neg + B) − (n_neg_b + 1)(N_pos + B)) > 0
# an exact bigint sum, so the confusion matrix has no float compare
# anywhere.  The reported weight / score are fixed-order double
# divisions of exact integers (bit-identical across engines).
# Self-evaluation on the training corpus is the standard training-set
# confusion diagnostic; a held-out eval is this composed with
# split_assign's hash split.

def _qclf_class_counts(docs: DataFrame) -> DataFrame:
    """(bucket, n_pos, n_neg): per-feature-bucket token counts by
    class — the trained model's sufficient statistics."""
    y = F.col("lang") == DSIR_TARGET_LANG
    return (_qclf_doc_buckets(docs)
            .select("bucket", y.alias("y"))
            .groupBy("bucket")
            .agg(F.sum(F.when(F.col("y"), 1).otherwise(0))
                 .alias("n_pos"),
                 F.sum(F.when(F.col("y"), 0).otherwise(1))
                 .alias("n_neg")))


def q_quality_classifier_train(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = _qclf_class_counts(docs)
    totals = counts.agg(F.sum("n_pos").alias("t_pos"),
                        F.sum("n_neg").alias("t_neg"))
    b = F.lit(QCLF_BUCKETS)
    return (counts.crossJoin(F.broadcast(totals))
            .select("bucket", "n_pos", "n_neg",
                    ((F.col("n_pos") + 1).cast("double")
                     / (F.col("t_pos") + b)
                     - (F.col("n_neg") + 1).cast("double")
                     / (F.col("t_neg") + b))
                    .alias("weight"))
            .orderBy("bucket"))


def _qclf_doc_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket): every token instance's feature bucket
    — the scoring probe's corpus-scale front."""
    return (widen_for_explode(docs, "doc_id")
            .select("doc_id", "lang",
                    F.explode(norm_tokens()).alias("tok"))
            .withColumn("bucket", F.expr(_qclf_bucket("tok"))))


def classifier_confusion(toks: DataFrame,
                         counts: DataFrame) -> DataFrame:
    """Confusion matrix of the trained probe over the ``toks``
    instances (``_qclf_doc_buckets`` shape), with the model's
    sufficient statistics coming from ``counts`` (bucket, n_pos,
    n_neg) — the whole model derives from that one table (totals are
    its sums), which is what lets the streaming class-count store
    carry it (the surprisal_from_counts factoring, one model over).

    The bucket join is LEFT with zero-coalesce so a tranche hitting
    buckets the count corpus never saw still scores — the smoothed
    estimator's unseen case ((0+1) numerators); in the self-eval path
    every bucket matches, so values are unchanged — identical to the
    inner-join oracle.

    The cleared-denominator terms are per-bucket counts times
    corpus-wide class token totals: int64 products overflow once
    total tokens pass ~3e9, far below the operator's design scale, so
    the sum accumulates in decimal(38,0) (the repo's pagerank-style
    decimal-exact convention) — the exactness claim holds to ~1e38."""
    totals = counts.agg(F.sum("n_pos").alias("t_pos"),
                        F.sum("n_neg").alias("t_neg"))
    dec = "decimal(38,0)"
    scored = (toks.join(counts, "bucket", "left")
              .withColumn("n_pos", F.coalesce("n_pos", F.lit(0)))
              .withColumn("n_neg", F.coalesce("n_neg", F.lit(0)))
              .crossJoin(F.broadcast(totals))
              .groupBy("doc_id", "lang", "t_pos", "t_neg")
              .agg(F.count("*").alias("n_toks"),
                   F.sum((F.col("n_pos") + 1).cast(dec)
                         * (F.col("t_neg") + QCLF_BUCKETS)
                         - (F.col("n_neg") + 1).cast(dec)
                         * (F.col("t_pos") + QCLF_BUCKETS))
                   .cast(dec).alias("s_num"))
              .withColumn(
                  "score",
                  F.col("s_num").cast("double")
                  / ((F.col("t_pos") + QCLF_BUCKETS).cast("double")
                     * (F.col("t_neg") + QCLF_BUCKETS)
                     * (F.col("n_toks")))))
    return (scored
            .groupBy((F.col("lang") == DSIR_TARGET_LANG)
                     .alias("is_target"),
                     (F.col("s_num") > 0).alias("predicted"))
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("example_doc_id"),
                 davg("score", "avg_score"))
            .orderBy("is_target", "predicted"))


def q_quality_classifier_eval(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Training-set confusion matrix of the trained probe:
    (is_target, predicted, n_docs, example_doc_id, avg_score)."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return classifier_confusion(_qclf_doc_buckets(docs),
                                _qclf_class_counts(docs))


# Shared oracle CTEs ending in (counts, tot) — the model's sufficient
# statistics, the SQL twin of _qclf_class_counts + its totals.
_QCLF_TRAIN_CTES = f"""
        qtoks AS (
            SELECT doc_id, lang, t.tok
            FROM (SELECT doc_id, lang, {NORM_TOKENS_SQL} AS l
                  FROM documents),
                 UNNEST(l) AS t(tok)
        ),
        bt AS (
            SELECT doc_id, lang, {_qclf_bucket_sql('tok')} AS bucket
            FROM qtoks
        ),
        counts AS (
            SELECT bucket,
                   CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                   CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                            THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
            FROM bt GROUP BY bucket
        ),
        tot AS (
            SELECT CAST(SUM(n_pos) AS BIGINT) AS t_pos,
                   CAST(SUM(n_neg) AS BIGINT) AS t_neg
            FROM counts
        )
"""

register(QuerySpec(
    "quality_classifier_train", q_quality_classifier_train,
    oracle=f"""
        WITH {_QCLF_TRAIN_CTES.strip()}
        SELECT bucket, n_pos, n_neg,
               CAST(n_pos + 1 AS DOUBLE) / (t_pos + {QCLF_BUCKETS})
                   - CAST(n_neg + 1 AS DOUBLE) / (t_neg + {QCLF_BUCKETS})
                   AS weight
        FROM counts CROSS JOIN tot
        ORDER BY bucket
    """,
    doc="train the hashed-feature linear probe distributed "
        "(difference-of-class-means / Rocchio, one aggregation "
        "pass): per-bucket class counts + the learned weight",
    tags=("text", "north-star", "quality", "classifier", "agg"),
))

register(QuerySpec(
    "quality_classifier_eval", q_quality_classifier_eval,
    oracle=f"""
        WITH {_QCLF_TRAIN_CTES.strip()},
        scored AS (
            SELECT doc_id, lang, t_pos, t_neg,
                   COUNT(*) AS n_toks,
                   CAST(SUM((n_pos + 1) * (t_neg + {QCLF_BUCKETS})
                            - (n_neg + 1) * (t_pos + {QCLF_BUCKETS}))
                        AS BIGINT) AS s_num
            FROM bt JOIN counts USING (bucket) CROSS JOIN tot
            GROUP BY doc_id, lang, t_pos, t_neg
        )
        SELECT (lang = '{DSIR_TARGET_LANG}') AS is_target,
               s_num > 0 AS predicted,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS example_doc_id,
               {davg_sql(f"CAST(s_num AS DOUBLE) / "
                         f"(CAST(t_pos + {QCLF_BUCKETS} AS DOUBLE) "
                         f"* (t_neg + {QCLF_BUCKETS}) * n_toks)",
                         "avg_score")}
        FROM scored
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    doc="the trained probe's training-set confusion matrix: the keep "
        "decision is an exact integer sum (denominators cleared), no "
        "float compare anywhere",
    tags=("text", "north-star", "quality", "classifier",
          "evaluation"),
))
