"""BPE merge learning vs an independent pure-Python reference
(Sennrich et al. 2016, the textbook algorithm) — same merges, same
frequencies, same order, including the left-to-right pairing rule."""

from __future__ import annotations

import re
from collections import Counter

from cga_logs_to_kinesis_spark.operators.bpe import EOW, learn_bpe_merges


def _norm_words(texts):
    words = []
    for t in texts:
        for w in t.strip().lower().split():
            w = re.sub(r"[^a-z0-9]", "", w)
            if w:
                words.append(w)
    return words


def _ref_bpe(word_freqs: dict[str, int], n: int):
    """Textbook BPE: count adjacent pairs weighted by word freq, merge
    the most frequent (ties: lexicographically smallest), left-to-right
    non-overlapping application."""
    vocab = [(list(w) + [EOW], f) for w, f in word_freqs.items()]
    merges = []
    for step in range(1, n + 1):
        pairs: Counter = Counter()
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        lhs, rhs = min(p for p, c in pairs.items() if c == top)
        merges.append((step, lhs, rhs, top))
        out_vocab = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            out_vocab.append((out, f))
        vocab = out_vocab
    return merges


def test_bpe_matches_reference_implementation(spark):
    texts = [
        "low low low lower lowest",
        "newest newest newer new",
        "widest wide wider wide",
        "lowest newest lowest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = [(r.step, r.lhs, r.rhs, r.pair_freq)
           for r in learn_bpe_merges(spark, docs, n_merges=8)
           .orderBy("step").collect()]
    want = _ref_bpe(Counter(_norm_words(texts)), 8)
    assert got == want


def test_bpe_left_to_right_overlap_rule(spark):
    """'aaaa' merging (a,a) must pair as [aa, aa], never [a, aa, a]:
    the literal-replace application is BPE's left-to-right scan."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaa")], "doc_id long, text string")
    got = [(r.step, r.lhs, r.rhs, r.pair_freq)
           for r in learn_bpe_merges(spark, docs, n_merges=3)
           .orderBy("step").collect()]
    want = _ref_bpe({"aaaa": 2, "aaa": 1}, 3)
    assert got == want
    # step 1 merges (a, a); 'aaaa' contributes 3 overlapping pairs
    assert got[0][:3] == (1, "a", "a") and got[0][3] == 3 * 2 + 2 * 1


def test_bpe_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta{i % 3}") for i in range(20)],
        "doc_id long, text string")
    a = learn_bpe_merges(spark, docs).collect()
    b = learn_bpe_merges(spark, docs).collect()
    assert a == b and len(a) == 10


def test_bpe_tokenize_matches_reference(spark):
    """Per-doc BPE token counts equal the textbook pipeline: learn
    merges on the corpus, apply them left-to-right per word, count."""
    from cga_logs_to_kinesis_spark.operators.bpe import q_bpe_tokenize

    texts = [
        "low low lower lowest banana",
        "newest newest banana bandana",
        "wide wider widest papa",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
               for r in q_bpe_tokenize(spark, td).collect()}

    # reference: learn 10 merges, then tokenize each word
    wf = Counter(_norm_words(texts))
    merges = _ref_bpe(dict(wf), 10)

    def tok(w):
        syms = list(w) + [EOW]
        for _step, lhs, rhs, _f in merges:
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for i, t in enumerate(texts):
        words = _norm_words([t])
        want = (len(words), sum(tok(w) for w in words))
        assert got[i] == want, (i, got[i], want)


def test_token_decon_catches_planted_contamination(spark):
    """Every planted-contamination doc (% 31, excluding the benchmark
    slice itself) is flagged by the BPE-token-space decontaminator —
    the canary's symbol sequence must survive tokenization intact —
    and the flagged set agrees with the word-level operator's on the
    fixture (the 32-symbol window spans ~6.5 words, the word
    operator's 6-gram span one tokenizer level down)."""
    import duckdb

    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    specs = all_queries()
    token_flagged = {r.doc_id for r in specs[
        "token_ngram_decontaminate"].fn(spark, SF_SMOKE).collect()}
    word_flagged = {r.doc_id for r in specs[
        "ngram_decontaminate"].fn(spark, SF_SMOKE).collect()}
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet("
        f"'{SF_SMOKE}/documents.parquet')").fetchall()]
    planted = {i for i in ids if i % 31 == 0 and i % 97 != 0}
    assert planted, "fixture must contain planted docs"
    assert planted <= token_flagged
    assert planted <= word_flagged
