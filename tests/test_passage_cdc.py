"""Content-defined chunking: the shift-invariance property that is
the operator's whole reason to exist, proven three ways — on a pure
Python reference model (hypothesis), engine-vs-reference equality,
and a demonstration that the fixed-window chunker genuinely lacks
the property on the same input."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from cga_logs_to_kinesis_spark.operators.llm_pipeline import CDC_MOD


def _bnd(tok: str) -> bool:
    return int(hashlib.md5(f"cdc:{tok}".encode()).hexdigest()[:15],
               16) % CDC_MOD == 0


def _ref_chunks(toks: list[str]) -> list[str]:
    """Independent Python model of the CDC chunker: cut after every
    boundary-class token, final partial chunk kept, empty chunks
    dropped."""
    out, cur = [], []
    for t in toks:
        cur.append(t)
        if _bnd(t):
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return [hashlib.md5(c.encode()).hexdigest() for c in out]


_words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    min_size=1, max_size=60)


@given(_words, st.lists(st.text(alphabet="xyz", min_size=1,
                                max_size=3), min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_insertion_shift_invariance(body, prefix):
    """Prepend ANY prefix: every chunk of the body after its first
    boundary is reproduced byte-identically in the prefixed doc —
    the suffix of the chunk lists agree."""
    a = _ref_chunks(body)
    b = _ref_chunks(prefix + body)
    tail = a[1:]                       # chunks after body's first cut
    assert b[len(b) - len(tail):] == tail


@given(_words)
@settings(max_examples=100, deadline=None)
def test_reference_chunks_cover_and_partition(body):
    """Chunks partition the token stream: joining them back with the
    cut structure yields every token exactly once, in order."""
    out, cur, rebuilt = [], [], []
    for t in body:
        cur.append(t)
        if _bnd(t):
            out.append(cur)
            cur = []
    if cur:
        out.append(cur)
    for c in out:
        rebuilt.extend(c)
    assert rebuilt == body


def test_engine_matches_reference_model(spark):
    """The Spark expression equals the independent Python model on
    docs that exercise boundaries at the start, middle, end, and not
    at all."""
    from pyspark.sql import functions as F

    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        cdc_cut_positions,
        cdc_digest_array,
    )

    # find tokens on both sides of the boundary class
    hits = [w for w in (f"w{i}" for i in range(200)) if _bnd(w)]
    miss = [w for w in (f"w{i}" for i in range(200)) if not _bnd(w)]
    texts = [
        " ".join([hits[0]] + miss[:5]),          # cut at position 1
        " ".join(miss[:3] + [hits[0]] + miss[3:6]),   # mid cut
        " ".join(miss[:4] + [hits[1]]),          # cut on last token
        " ".join(miss[:6]),                      # no cuts at all
        " ".join([hits[0], hits[1], hits[2]]),   # every token cuts
    ]
    df = (spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
        .withColumn("_t", F.split(F.trim(F.col("text")),
                                  r"[ \t\n\x0B\f\r]+"))
        .withColumn("_cuts", cdc_cut_positions())
        .select("doc_id", cdc_digest_array().alias("digests")))
    got = {r.doc_id: list(r.digests) for r in df.collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_chunks(t.split(" ")), i


def test_fixed_windows_lack_the_property(spark):
    """The contrast that motivates the operator: under the
    fixed-window chunker a one-token prefix shifts EVERY digest,
    while the CDC chunker reproduces the shared suffix."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cga_logs_to_kinesis_spark.registry import all_queries

    body = [f"w{i}" for i in range(40)]
    frame = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [" ".join(body), " ".join(["zzq"] + body)],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": [1, 1]})

    def run(name, tmp):
        return {r.doc_id: r.n_dup_passages for r in
                all_queries()[name].fn(spark, tmp).collect()}

    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(frame),
                       f"{tmp}/documents.parquet")
        fixed = run("passage_dedup", tmp)
        cdc = run("passage_dedup_cdc", tmp)
    # fixed windows: the prefix misaligns every 10-token frame ->
    # zero shared digests between the two docs
    assert fixed[1] == 0 and fixed[2] == 0
    # CDC: everything after the first boundary is shared
    assert cdc[1] > 0 and cdc[2] > 0
