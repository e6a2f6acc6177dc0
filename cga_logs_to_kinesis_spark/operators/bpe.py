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


def _word_freqs(spark: SparkSession, docs: DataFrame) -> DataFrame:
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


def learn_bpe_merges(spark: SparkSession, docs: DataFrame,
                     n_merges: int = BPE_N_MERGES) -> DataFrame:
    """(step, lhs, rhs, pair_freq): the learned merge table, in order."""
    syms0 = F.expr(
        f"concat(filter(split(w, ''), c -> c != ''), array('{EOW}'))")
    state = (_word_freqs(spark, docs)
             .select(syms0.alias("syms"), "freq")
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
    merges = [(r.lhs, r.rhs) for r in
              learn_bpe_merges(spark, docs).collect()]
    words = (widen_for_explode(docs, "doc_id")
             .select("doc_id", F.explode(norm_tokens()).alias("w")))
    vocab = words.select("w").distinct().withColumn(
        "syms",
        F.expr(f"concat(filter(split(w, ''), c -> c != ''), "
               f"array('{EOW}'))"))
    for lhs, rhs in merges:          # 10 chained row-local folds
        vocab = vocab.withColumn("syms", _apply_merge(lhs, rhs))
    vocab = vocab.select("w", F.size("syms").alias("n_syms"))
    return (words.join(vocab, "w")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_syms").alias("n_bpe_tokens")))


def _bpe_tokenize_oracle(n_merges: int = BPE_N_MERGES) -> str:
    """Reuses the learning chain's CTEs but keeps word identity in
    the state, so the final state IS the word -> symbols map."""
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        NORM_TOKENS_SQL,
    )
    parts = [f"""
        toks AS (
            SELECT doc_id, t.tok AS w
            FROM (SELECT doc_id, {NORM_TOKENS_SQL} AS l FROM documents),
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
    return ("WITH " + ",".join(parts) + f"""
        SELECT t.doc_id,
               COUNT(*) AS n_words,
               CAST(SUM(len(v.s)) AS BIGINT) AS n_bpe_tokens
        FROM toks t JOIN v{n_merges} v USING (w)
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
