"""Distributed BPE merge learning (Sennrich, Haddow, Birch, ACL 2016).

Tokenizer fitting is the one corpus-scale job every LLM pipeline runs
before training; its core is byte-pair encoding: repeatedly count
adjacent symbol pairs (frequency-weighted over the vocabulary) and
merge the most frequent pair.  The Spark shape that survives 100 TB:

* the corpus-sized work happens ONCE — tokenize + word-frequency
  aggregation reduces the corpus to a vocabulary table (~1e8 rows at
  web scale: DataFrame-sized, never driver-sized);
* each of the N merge iterations then touches only the vocabulary:
  one pair-keyed aggregation (map-side combinable, int-exact sums)
  plus a single-row top-1 collect (the k-means-centroid class of
  driver access) and a row-local merge application;
* the merge application is a sequential left fold over each word's
  symbol array (``aggregate`` with a (out, carry) struct accumulator)
  — BPE's left-to-right non-overlapping pairing implemented literally,
  in codegen, no Python.  (A string replace-all is NOT equivalent:
  adjacent pair occurrences share their delimiter, so runs like
  ``a a a a`` or ``a b a b`` mis-pair — caught by the independent
  textbook-reference test in tests/test_bpe.py.)

Determinism/oracle: integer frequency sums, ties broken by (freq
DESC, lhs, rhs) over ASCII symbols, and a FIXED iteration count — so
the whole training loop unrolls into a chained-CTE DuckDB oracle (the
kmeans/pca trick).  The oracle applies each merge with a closed-form
equivalent of the fold (a merge happens at pair position k iff the
pair matches there and an even number of consecutive matches
immediately precede it — "run parity"), making the two sides
independent implementations of the same spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session, widen_for_explode
from cga_logs_to_kinesis_spark.sources import load_table

BPE_N_MERGES = 10
EOW = "</w>"        # end-of-word marker, its own symbol (Sennrich §3)
CHECKPOINT_EVERY = 4    # bound lineage depth without paying a vocab
                        # materialization per merge: between cuts, an
                        # iteration re-applies at most 3 extra narrow
                        # folds over the vocabulary — cheaper than a
                        # disk round-trip at every step (measured 4x
                        # faster locally, same bits)


def word_freqs(docs: DataFrame) -> DataFrame:
    """(w, freq): the corpus reduced to its word-frequency table —
    the tokenizer's SUFFICIENT STATISTICS: everything downstream
    (merge learning, the fitted vocabulary) derives from this one
    table, and plain counts SUM under any corpus split, which is
    what lets the streaming store (streaming/corpus.py::
    bpe_vocab_sink) carry a continuously-fittable tokenizer."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        norm_tokens,
    )
    return (widen_for_explode(docs, "doc_id")
            .select(F.explode(norm_tokens()).alias("w"))
            .groupBy("w").agg(F.count("*").alias("freq")))


def _sql_quote(sym: str) -> str:
    return "'" + sym.replace("'", "''") + "'"


def _apply_merge(lhs: str, rhs: str) -> F.Column:
    """One BPE merge pass over the ``syms`` array: sequential left
    fold with a (out, carry) accumulator — carry holds the previous
    unmerged symbol; a (carry==lhs, x==rhs) hit emits the merged
    symbol and clears the carry, which is exactly left-to-right
    non-overlapping pairing."""
    ql, qr = _sql_quote(lhs), _sql_quote(rhs)
    qm = _sql_quote(lhs + rhs)
    return F.expr(f"""
        aggregate(
            syms,
            struct(cast(array() as array<string>) AS out,
                   cast(null as string) AS carry),
            (acc, x) -> CASE
                WHEN acc.carry = {ql} AND x = {qr}
                    THEN struct(concat(acc.out, array({qm})) AS out,
                                cast(null as string) AS carry)
                WHEN acc.carry IS NULL
                    THEN struct(acc.out AS out, x AS carry)
                ELSE struct(concat(acc.out, array(acc.carry)) AS out,
                            x AS carry)
            END,
            acc -> CASE WHEN acc.carry IS NULL THEN acc.out
                        ELSE concat(acc.out, array(acc.carry)) END)
    """)


def learn_bpe_merges_from_freqs(spark: SparkSession, wf: DataFrame,
                                n_merges: int = BPE_N_MERGES,
                                ) -> DataFrame:
    """(step, lhs, rhs, pair_freq): the merge table learned from a
    word-frequency table ``wf`` (w, freq) — the fitting loop proper,
    vocabulary-shaped from the first instruction.  Factored off
    :func:`learn_bpe_merges` so the streaming store's fit step
    (streaming/corpus.py::fit_bpe_store) runs the SAME loop over its
    folded counts: one fit, identical merges, no corpus re-scan."""
    state = (wf
             .select(_syms0().alias("syms"), "freq")
             .localCheckpoint())
    pair_structs = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS lhs, "
        "element_at(syms, i + 1) AS rhs))")
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (state
                .filter(F.size("syms") >= 2)
                .select(F.explode(pair_structs).alias("p"), "freq")
                .groupBy("p.lhs", "p.rhs")
                .agg(F.sum("freq").alias("pair_freq"))
                .orderBy(F.col("pair_freq").desc(), "lhs", "rhs")
                .limit(1)
                .collect())
        if not best:                      # vocabulary fully merged
            break
        lhs, rhs, cnt = best[0].lhs, best[0].rhs, best[0].pair_freq
        merges.append((step, lhs, rhs, int(cnt)))
        state = state.withColumn("syms", _apply_merge(lhs, rhs))
        if step % CHECKPOINT_EVERY == 0:
            state = state.localCheckpoint()
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_freq long")


def _syms0() -> F.Column:
    """A word's initial symbol sequence: characters + the end-of-word
    marker (Sennrich §3)."""
    return F.expr(
        f"concat(filter(split(w, ''), c -> c != ''), array('{EOW}'))")


def apply_merges_to_words(words: DataFrame,
                          merges: list[tuple[str, str]]) -> DataFrame:
    """``words`` (any frame with a ``w`` column) + ``syms``: each word
    tokenized under the given merge table — char split + end-of-word
    marker, then one row-local fold per merge, in merge order.  The
    INFERENCE half of the tokenizer as a reusable transform: the
    batch fit, the pinned-tokenizer apply query, and the store
    reader's unseen-word branch all tokenize through this one code
    path, so apply semantics cannot drift between them."""
    out = words.withColumn("syms", _syms0())
    for lhs, rhs in merges:          # chained row-local folds
        out = out.withColumn("syms", _apply_merge(lhs, rhs))
    return out


def learn_bpe_merges(spark: SparkSession, docs: DataFrame,
                     n_merges: int = BPE_N_MERGES) -> DataFrame:
    """(step, lhs, rhs, pair_freq): the learned merge table, in order."""
    return learn_bpe_merges_from_freqs(spark, word_freqs(docs),
                                       n_merges)


def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return learn_bpe_merges(spark, load_table(spark, sf_dir, "documents"))


# A merge happens at pair position k iff the pair matches there AND an
# even number of consecutive matching positions immediately precede it
# (run parity — the closed form of the left fold, verified against the
# fold and the textbook reference on runs and alternations).
_MERGED_K = ("({k} >= 1 AND {k} < len(s) AND s[{k}] = lhs "
             "AND s[{k}+1] = rhs AND (({k} - COALESCE(list_max("
             "list_filter(range(1, {k}), j -> NOT (s[j] = lhs "
             "AND s[j+1] = rhs))), 0)) % 2 = 1))")

_APPLY_SQL = f"""
    CASE WHEN len(s) < 2 THEN s ELSE
      flatten(list_transform(range(1, len(s) + 1), k ->
        CASE
          WHEN {_MERGED_K.format(k='k')} THEN [lhs || rhs]
          WHEN k > 1 AND {_MERGED_K.format(k='(k-1)')} THEN []
          ELSE [s[k]]
        END))
    END
"""


def _bpe_oracle(n_merges: int = BPE_N_MERGES) -> str:
    """The training loop unrolled as chained CTEs (see module doc).

    ``MATERIALIZED`` on every vocabulary state matters: each v{{i}} is
    referenced twice (next pairs CTE + next state CTE), so DuckDB's
    default inlining re-evaluates the whole chain ~2^N times (measured
    34 s → 0.4 s at sf0.01).  Same lesson as the pca_project oracle."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        NORM_TOKENS_SQL,
    )
    parts = [f"""
        wf AS (
            SELECT t.tok AS w, COUNT(*) AS freq
            FROM (SELECT doc_id, {NORM_TOKENS_SQL} AS l FROM documents),
                 UNNEST(l) AS t(tok)
            GROUP BY 1
        ),
        v0 AS MATERIALIZED (
            SELECT list_append(
                       list_filter(string_split_regex(w, ''),
                                   c -> c != ''), '{EOW}') AS s,
                   freq
            FROM wf
        )"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""
        p{i} AS (
            SELECT s[t.i] AS lhs, s[t.i + 1] AS rhs,
                   CAST(SUM(freq) AS BIGINT) AS pair_freq
            FROM v{i - 1}, UNNEST(range(1, len(s))) AS t(i)
            GROUP BY 1, 2
        ),
        b{i} AS MATERIALIZED (
            SELECT lhs, rhs, pair_freq FROM p{i}
            ORDER BY pair_freq DESC, lhs, rhs LIMIT 1
        ),
        v{i} AS MATERIALIZED (
            SELECT {_APPLY_SQL} AS s, freq
            FROM v{i - 1}, b{i}
        )""")
    union = "\n        UNION ALL ".join(
        f"SELECT {i} AS step, lhs, rhs, pair_freq FROM b{i}"
        for i in range(1, n_merges + 1))
    return "WITH " + ",".join(parts) + f"\n        {union}"


register(QuerySpec(
    "bpe_learn_merges", q_bpe_learn_merges,
    oracle=_bpe_oracle(),
    doc=f"distributed BPE merge learning ({BPE_N_MERGES} merges, "
        "Sennrich et al. 2016): corpus reduced to a vocabulary table "
        "once, then per-iteration pair-keyed aggs + sequential-fold "
        "merge application; fixed-iteration unrolled-CTE oracle with "
        "a run-parity closed form",
    tags=("text", "north-star", "iterative", "tokenizer"),
))


# ---------------------------------------------------------------------------
# bpe_tokenize — the inference half: apply the learned merge table.
# ---------------------------------------------------------------------------
# Applying merges is vocabulary-shaped too: tokenize each DISTINCT
# word once (the merge folds run over the vocab table, never the
# corpus), then join the per-word BPE token counts back to the
# corpus's exploded words.  At 100 TB the fold work scales with the
# vocabulary and the join is a vocabulary-keyed shuffle of ints —
# the same topology as unigram_rarity's frequency join (and like it,
# deliberately NOT a forced broadcast: a web-scale vocab outgrows
# one; AQE promotes when small).

def bpe_vocab_from_freqs(spark: SparkSession, wf: DataFrame,
                         n_merges: int = BPE_N_MERGES) -> DataFrame:
    """(w, syms): the fitted tokenizer as a TABLE, derived entirely
    from a word-frequency table — learn the merges from ``wf``, then
    tokenize its keys (which ARE the distinct corpus words) under
    them.  The streaming fit step persists exactly this pair (merge
    table + vocab); the batch fit wraps it with a corpus scan."""
    merges = [(r.lhs, r.rhs) for r in
              learn_bpe_merges_from_freqs(spark, wf,
                                          n_merges).collect()]
    return apply_merges_to_words(wf.select("w"), merges)


def fit_bpe_vocab(spark: SparkSession, docs: DataFrame,
                  n_merges: int = BPE_N_MERGES) -> DataFrame:
    """(w, syms): every distinct corpus word mapped to its BPE symbol
    sequence under the merges learned from the same ``docs`` — the
    fitted tokenizer as a TABLE (vocabulary-sized, never corpus-
    sized), shared by ``bpe_tokenize`` (counts) and
    ``token_ngram_decontaminate`` (full sequences) so the tokenizer
    cannot drift between its consumers.  One corpus scan: the
    word-frequency table is checkpointed and feeds BOTH the merge
    learning and the vocabulary keys."""
    wf = word_freqs(docs).localCheckpoint()
    return bpe_vocab_from_freqs(spark, wf, n_merges)


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): per-document token counts
    under the 10-merge BPE tokenizer learned from the same corpus.
    n_bpe_tokens counts symbols after all merges (each word starts as
    chars + </w> and loses one symbol per merge hit)."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        norm_tokens,
    )
    words = (widen_for_explode(docs, "doc_id")
             .select("doc_id", F.explode(norm_tokens()).alias("w")))
    vocab = (fit_bpe_vocab(spark, docs)
             .select("w", F.size("syms").alias("n_syms")))
    return (words.join(vocab, "w")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_syms").alias("n_bpe_tokens")))


def bpe_vocab_ctes(n_merges: int = BPE_N_MERGES,
                   source: str = "documents") -> tuple[str, str]:
    """The fitted-tokenizer CTE chain (the SQL twin of
    :func:`fit_bpe_vocab`): from ``source`` (doc_id, text) through
    ``toks`` (doc_id, w) and the unrolled merge learning to the final
    word -> symbols map.  Returns ``(ctes, final)`` where ``final``
    names the v{{n}} relation (w, s, freq) — shared by the tokenize
    oracle and the token-space decontaminator so the tokenizer spec
    exists once on the SQL side too."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        NORM_TOKENS_SQL,
    )
    parts = [f"""
        toks AS (
            SELECT doc_id, t.tok AS w
            FROM (SELECT doc_id, {NORM_TOKENS_SQL} AS l FROM {source}),
                 UNNEST(l) AS t(tok)
        ),
        wf AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w),
        v0 AS MATERIALIZED (
            SELECT w,
                   list_append(
                       list_filter(string_split_regex(w, ''),
                                   c -> c != ''), '{EOW}') AS s,
                   freq
            FROM wf
        )"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""
        p{i} AS (
            SELECT s[t.i] AS lhs, s[t.i + 1] AS rhs,
                   CAST(SUM(freq) AS BIGINT) AS pair_freq
            FROM v{i - 1}, UNNEST(range(1, len(s))) AS t(i)
            GROUP BY 1, 2
        ),
        b{i} AS MATERIALIZED (
            SELECT lhs, rhs, pair_freq FROM p{i}
            ORDER BY pair_freq DESC, lhs, rhs LIMIT 1
        ),
        v{i} AS MATERIALIZED (
            SELECT w, {_APPLY_SQL} AS s, freq
            FROM v{i - 1}, b{i}
        )""")
    return ",".join(parts), f"v{n_merges}"


def _bpe_tokenize_oracle(n_merges: int = BPE_N_MERGES) -> str:
    """The learning chain's CTEs with word identity kept in the
    state, so the final state IS the word -> symbols map."""
    ctes, final = bpe_vocab_ctes(n_merges)
    return ("WITH " + ctes + f"""
        SELECT t.doc_id,
               COUNT(*) AS n_words,
               CAST(SUM(len(v.s)) AS BIGINT) AS n_bpe_tokens
        FROM toks t JOIN {final} v USING (w)
        GROUP BY t.doc_id
    """)


register(QuerySpec(
    "bpe_tokenize", q_bpe_tokenize,
    oracle=_bpe_tokenize_oracle(),
    doc="apply the learned BPE merge table: per-document token counts "
        "under the fitted tokenizer (folds run over the vocabulary, "
        "counts join back corpus-side — the tokenizer inference half)",
    tags=("text", "north-star", "tokenizer"),
))


# ---------------------------------------------------------------------------
# token_ngram_decontaminate — eval hygiene in BPE token space
# ---------------------------------------------------------------------------
# The GPT-3 / Llama decontamination convention checks overlap in
# TOKENIZER n-grams (GPT-3 appendix C: 13-gram token overlap), not
# word shingles: token-space grams are what the model actually
# memorizes, and they catch contamination that word splitting hides
# (tokenizer-normalized punctuation/case variants collapse to the
# same token sequence).  Composition: the corpus-fitted BPE vocab
# table (``fit_bpe_vocab``) maps each doc's words to symbol
# sequences; flattening in word order rebuilds the doc as ONE BPE
# token sequence; the gram/benchmark/broadcast-semi-join tail is then
# ``ngram_decontaminate``'s exact shape, one level down the
# tokenizer.  Same canary seeding as the word-level operator (the
# fixture corpus is random word soup with no natural long-gram
# overlap), learned and applied on the SEEDED corpus on both engines.
#
# 100 TB: the added cost over the word-level operator is the
# vocabulary-keyed join (bpe_tokenize's topology — AQE promotes to
# broadcast when the vocab is small) plus ONE doc_id-keyed groupBy to
# reassemble sequences (the line_dedup reassembly shape: shuffles
# (doc_id, pos, syms) triples, never full text).  Gram fingerprints
# are md5 digests — the contamination join moves 32-byte digests, and
# the benchmark side stays eval-sized and broadcast.

# GPT-3's window is 13 SUBWORD tokens (~10 words under a 50k-merge
# vocabulary).  The unit must scale with the tokenizer's granularity:
# under this 10-merge fixture tokenizer a word averages ~5 symbols,
# so 13 symbols span ~2.5 words — a window that short flags natural
# collisions corpus-wide (measured: 321/500 docs at sf0.001 vs the
# word operator's 18) and decontaminates nothing.  32 symbols ≈ 6.5
# words matches the word-level operator's 6-gram span one tokenizer
# level down, and still fits inside the planted canary (~45 symbols
# after merges) so seeded contamination is provably caught.
TOKEN_DECON_K = 32


def token_decon_report(docs: DataFrame,
                       vocab: DataFrame) -> DataFrame:
    """(doc_id, n_shared_grams): training docs sharing at least one
    TOKEN_DECON_K-gram of BPE tokens with the benchmark slice
    (doc_id % 97 == 0), with each doc's token sequence produced by
    joining its words against the ``vocab`` (w, syms) table.  The
    decontaminator's APPLY half, factored so the corpus-fitted query,
    the pinned-tokenizer bench twin, and the store-fed reader
    (streaming/corpus.py::token_decontaminate_from_store) share one
    tail."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        norm_tokens,
    )

    words = (widen_for_explode(docs, "doc_id")
             .withColumn("_toks", norm_tokens())
             .select("doc_id",
                     F.posexplode("_toks").alias("pos", "w")))
    # Word order -> token order: sort the collected (pos, syms)
    # structs (array_sort orders by the leading pos field; positions
    # are distinct within a doc, so the order is total) and flatten.
    seq = (words.join(vocab, "w")
           .groupBy("doc_id")
           .agg(F.expr(
               "flatten(transform(array_sort(collect_list("
               "struct(pos, syms))), x -> x.syms))").alias("seq")))
    grams = F.expr(
        f"transform(sequence(1, size(seq) - {TOKEN_DECON_K - 1}), "
        f"i -> md5(concat_ws(' ', slice(seq, i, {TOKEN_DECON_K}))))")
    g = (seq.filter(F.size("seq") >= TOKEN_DECON_K)
         .select("doc_id", F.explode(F.array_distinct(grams))
                 .alias("gram")))
    bench = (g.filter(F.col("doc_id") % 97 == 0)
             .select("gram").distinct())
    return (g.filter(F.col("doc_id") % 97 != 0)
            .join(F.broadcast(bench), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shared_grams")))


def q_token_ngram_decontaminate(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """(doc_id, n_shared_grams) under the tokenizer fitted on the
    same (seeded) corpus.  Reference semantics: llm_pipeline's
    ``ngram_decontaminate`` with word shingles swapped for fitted
    BPE token sequences."""
    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        decon_canary_seeded,
    )

    tune_session(spark)
    docs = decon_canary_seeded(load_table(spark, sf_dir, "documents"))
    return token_decon_report(docs, fit_bpe_vocab(spark, docs))


def token_decon_tail_sql(vocab_rel: str, source: str = "seeded") -> str:
    """The decontaminator tail as SQL CTEs + final SELECT: token
    sequences from ``source`` docs joined against the ``vocab_rel``
    (w, s) relation, gram/benchmark/contamination tail — the SQL twin
    of :func:`token_decon_report`, shared by the corpus-fitted and
    pinned-tokenizer oracles."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        NORM_TOKENS_SQL,
    )

    k = TOKEN_DECON_K
    return f"""
        ptoks AS (
            SELECT doc_id, r.i AS pos, l[r.i] AS w
            FROM (SELECT doc_id, {NORM_TOKENS_SQL} AS l FROM {source}),
                 UNNEST(range(1, len(l) + 1)) AS r(i)
        ),
        seq AS (
            SELECT t.doc_id,
                   flatten(list(v.s ORDER BY t.pos)) AS seq
            FROM ptoks t JOIN {vocab_rel} v USING (w)
            GROUP BY t.doc_id
        ),
        g AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, len(seq) - {k - 2}),
                       i -> md5(list_aggregate(seq[i:i+{k - 1}],
                                               'string_agg', ' ')))))
                       AS gram
            FROM seq WHERE len(seq) >= {k}
        ),
        bench AS (
            SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
        )
        SELECT g.doc_id, COUNT(*) AS n_shared_grams
        FROM g JOIN bench USING (gram)
        WHERE g.doc_id % 97 <> 0
        GROUP BY g.doc_id
    """


def _token_decon_oracle(n_merges: int = BPE_N_MERGES) -> str:
    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        DECON_CANARY_SQL,
    )

    ctes, final = bpe_vocab_ctes(n_merges, source="seeded")
    return f"""
        WITH seeded AS ({DECON_CANARY_SQL}),
        {ctes},
        {token_decon_tail_sql(final)}
    """


register(QuerySpec(
    "token_ngram_decontaminate", q_token_ngram_decontaminate,
    oracle=_token_decon_oracle(),
    doc=f"benchmark decontamination in BPE token space: flag docs "
        f"sharing a {TOKEN_DECON_K}-token-gram with the broadcast "
        "benchmark set under the corpus-fitted tokenizer (GPT-3 "
        "appendix-C convention)",
    tags=("text", "north-star", "tokenizer", "dedup", "join"),
))


# ---------------------------------------------------------------------------
# token_decon_apply — the decontaminator under an already-FITTED tokenizer
# ---------------------------------------------------------------------------
# token_ngram_decontaminate's cost is dominated by the fit: 10 fixed
# driver collect rounds at ANY sf (iteration count, not data), which
# is why it is excluded from the bench headline set.  In production
# you fit ONCE and apply forever — the streaming BPE store
# (streaming/corpus.py::fit_bpe_store / token_decontaminate_from_store)
# persists the merge table exactly so every later invocation skips
# the loop.  This query is that apply path's benchable batch twin:
# the merge table is PINNED (the 10 merges the sf0.01 fixture corpus
# learns — any fixed table exercises the same plan), so the measured
# cost is purely the apply: one distinct-words vocabulary pass, 10
# row-local merge folds over the vocabulary, the doc_id-keyed
# reassembly join, and the gram/benchmark broadcast-semi-join tail.
# Zero driver rounds — the loop below chains 10 fold COLUMNS, not 10
# collect() calls.

PINNED_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("e", EOW), ("n", EOW), ("er", EOW), ("o", "w"),
    ("ow", EOW), ("o", "r"), ("s", "t"), ("h", EOW), ("a", "t"),
)


def q_token_decon_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shared_grams): token-space decontamination under
    the PINNED merge table — the store-fed reader's cost profile
    (apply only, no fit loop), oracle-paired and benchable."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        norm_tokens,
    )
    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        decon_canary_seeded,
    )

    tune_session(spark)
    docs = decon_canary_seeded(load_table(spark, sf_dir, "documents"))
    words = (widen_for_explode(docs, "doc_id")
             .select(F.explode(norm_tokens()).alias("w"))
             .distinct())
    vocab = apply_merges_to_words(words, list(PINNED_MERGES))
    return token_decon_report(docs, vocab)


def _token_decon_apply_oracle() -> str:
    """The pinned merge table as a chain of one-row CTEs (the learned
    b{i} relations of the fitted oracle replaced by VALUES), then the
    shared decontaminator tail."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        NORM_TOKENS_SQL,
    )
    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        DECON_CANARY_SQL,
    )

    parts = [f"""
        pv0 AS MATERIALIZED (
            SELECT DISTINCT t.tok AS w,
                   list_append(
                       list_filter(string_split_regex(t.tok, ''),
                                   c -> c != ''), '{EOW}') AS s
            FROM (SELECT {NORM_TOKENS_SQL} AS l FROM seeded),
                 UNNEST(l) AS t(tok)
        )"""]
    for i, (lhs, rhs) in enumerate(PINNED_MERGES, start=1):
        parts.append(f"""
        pb{i} AS (SELECT {_sql_quote(lhs)} AS lhs,
                         {_sql_quote(rhs)} AS rhs),
        pv{i} AS MATERIALIZED (
            SELECT w, {_APPLY_SQL} AS s
            FROM pv{i - 1}, pb{i}
        )""")
    return f"""
        WITH seeded AS ({DECON_CANARY_SQL}),
        {",".join(parts)},
        {token_decon_tail_sql(f"pv{len(PINNED_MERGES)}")}
    """


register(QuerySpec(
    "token_decon_apply", q_token_decon_apply,
    oracle=_token_decon_apply_oracle(),
    doc=f"token-space decontamination under a pinned (pre-fitted) "
        f"{len(PINNED_MERGES)}-merge table: the store-fed apply path "
        "— vocabulary folds + reassembly join + gram broadcast-semi-"
        "join, zero fit rounds",
    tags=("text", "north-star", "tokenizer", "dedup", "join"),
))
