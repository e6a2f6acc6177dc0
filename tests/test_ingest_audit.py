"""JSONL ingest audit: fixture determinism and exact per-shard
accounting (the registry pair is additionally hash-checked vs the
read_text/json_valid oracle by tests/test_queries_oracle.py)."""

from __future__ import annotations

import hashlib
import os
import shutil

import pytest

from cga_logs_to_kinesis_spark.operators.ingest_audit import (
    FIXTURE_DIR,
    N_SHARDS,
    dirty_jsonl_fixture,
    load_documents_jsonl_audit,
)
from tests.conftest import SF_SMOKE


def _content_hash(base: str) -> str:
    h = hashlib.sha256()
    for shard in range(N_SHARDS):
        p = os.path.join(base, f"shard={shard}", "part-00000.jsonl")
        h.update(open(p, "rb").read())
    return h.hexdigest()


def test_fixture_bytes_deterministic():
    base = dirty_jsonl_fixture()
    first = _content_hash(base)
    shutil.rmtree(FIXTURE_DIR)      # force regeneration from scratch
    assert _content_hash(dirty_jsonl_fixture()) == first


def test_per_shard_accounting_exact(spark):
    rows = {r.shard: r
            for r in __import__("cga_logs_to_kinesis_spark.registry",
                                fromlist=["all_queries"])
            .all_queries()["jsonl_ingest_report"]
            .fn(spark, SF_SMOKE).collect()}
    assert sorted(rows) == list(range(N_SHARDS))
    for shard, r in rows.items():
        base = shard * 1000
        assert r.n_lines == 49          # 40 valid + 3 sparse + 6 corrupt
        assert r.n_corrupt == 6         # truncated/garbage/{]/array/int/str
        assert r.n_valid == 43
        assert r.n_null_text == 2       # missing-text + explicit-null
        assert r.n_missing_id == 1      # the orphan record
        assert r.n_chars_liars == 3     # i % 13 == 5 for i in 0..39
        assert r.min_doc_id == base
        assert r.max_doc_id == base + 92


def test_permissive_loader_yields_null_rows_for_corrupt(spark):
    base = dirty_jsonl_fixture()
    df = load_documents_jsonl_audit(spark, base)
    # collect once: Spark disallows plans whose only parsed column is
    # _corrupt_record (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD
    # _COLUMN), so counting corrupt rows driver-side over the full
    # projection is the supported pattern for a 196-row fixture.
    rows = df.collect()
    assert len(rows) == N_SHARDS * 49
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == N_SHARDS * 6
    # corrupt rows carry the raw line and nothing else
    assert all(r.doc_id is None and r.text is None for r in corrupt)


def test_table_profile_on_empty_table_matches_oracle(spark, tmp_path):
    """An EMPTY drop must profile as 11 rows (n_null=0, n_distinct=0,
    NaN min/max) on both engines — the inner-join form returned 0
    Spark rows here while the oracle's per-column SELECTs return one
    row per column."""
    import duckdb

    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.test_queries_oracle import table_hash

    sf = tmp_path / "sf_empty"
    (spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
     .limit(0).write.parquet(str(sf / "lineitem.parquet")))
    spec = all_queries()["table_profile"]
    sdf = spec.fn(spark, str(sf))
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == 11
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet/*.parquet')")
    cur = con.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(orows) == 11
    assert table_hash(srows, list(sdf.columns)) == \
        table_hash(orows, ocols)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_profile_partials_fold_is_split_invariant(spark, seed):
    """The mergeability claim behind table_profile_sink, pinned for
    ARBITRARY splits (not just the file-per-batch case the streaming
    test exercises): hash-partition lineitem 3 ways, fold per-split
    partials + distinct sets, and the result must equal the one-shot
    batch profile."""
    from pyspark.sql import functions as F

    from cga_logs_to_kinesis_spark.operators.ingest_audit import (
        finish_profile,
        profile_partials,
        profile_value_pairs,
        q_table_profile,
    )
    from tests.conftest import SF_SMOKE

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    key = F.abs(F.xxhash64("l_orderkey", "l_linenumber", F.lit(seed)))
    splits = [li.filter(key % 3 == i) for i in range(3)]
    partials = None
    values = None
    for s in splits:
        p = profile_partials(s)
        v = profile_value_pairs(s).distinct()
        partials = p if partials is None else partials.unionByName(p)
        values = v if values is None else values.unionByName(v)
    distincts = (values.groupBy("col_name")
                 .agg(F.count_distinct("val").alias("n_distinct")))
    folded = [tuple(str(x) for x in r)
              for r in finish_profile(partials, distincts).collect()]
    direct = [tuple(str(x) for x in r)
              for r in q_table_profile(spark, SF_SMOKE).collect()]
    assert folded == direct and len(direct) == 11


def test_table_profile_approx_error_bound(spark):
    """The at-scale twin's contract: every non-sketch column (n_null,
    min/max) bit-equal to the exact profile; the HLL n_distinct within
    5 sigma of the exact count (rsd=0.02 -> 10%).  Also pins the whole
    point of the twin — sketched distincts (map-side HLL partials, no
    exact-distinct shuffle), no Expand, no value-pair explode."""
    from cga_logs_to_kinesis_spark.operators.ingest_audit import (
        PROFILE_APPROX_RSD,
        q_table_profile,
        q_table_profile_approx,
    )

    exact = {r.col_name: r for r in
             q_table_profile(spark, SF_SMOKE).collect()}
    approx = {r.col_name: r for r in
              q_table_profile_approx(spark, SF_SMOKE).collect()}
    assert set(exact) == set(approx) and len(exact) == 11
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_null, str(a.min_num), str(a.max_num),
                a.min_str, a.max_str) == \
               (e.n_null, str(e.min_num), str(e.max_num),
                e.min_str, e.max_str), c
        tol = 5 * PROFILE_APPROX_RSD * max(e.n_distinct, 1)
        assert abs(a.n_distinct - e.n_distinct) <= max(tol, 2), \
            (c, a.n_distinct, e.n_distinct)
    # plan: distincts are SKETCHED — approx_count_distinct partials
    # fold map-side, so the plan has no exact-distinct machinery: no
    # Expand and no count(distinct ...) aggregate anywhere.  (The r18
    # one-scan form is gone: its single mixed aggregate dragged ~40
    # numeric folds out of codegen behind the imperative HLL buffers —
    # the branch shape mirrors the exact twin instead; the only
    # remaining Generate is profile_partials' 1-row pivot explode.)
    plan = (q_table_profile_approx(spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "approx_count_distinct" in plan
    assert "Expand" not in plan
    assert "count(distinct" not in plan.lower()


def test_join_key_skew_branches_are_both_exercised(spark):
    """The vacuity guard the anti_join lesson demands: the hot-2x
    branch must be TRUE somewhere (l_orderkey at every fixture scale)
    and the near-uniform keys must report zero — both outcomes carry
    information and both are hash-compared by the oracle gate."""
    from cga_logs_to_kinesis_spark.registry import all_queries

    rows = {r.key_col: r for r in
            all_queries()["join_key_skew"].fn(spark, SF_SMOKE)
            .collect()}
    assert set(rows) == {"l_orderkey", "l_partkey", "l_suppkey",
                         "o_custkey", "token"}
    assert rows["l_orderkey"].hot2_keys > 0
    assert rows["l_orderkey"].hot2_rows > rows["l_orderkey"].hot2_keys
    assert rows["l_suppkey"].hot2_keys == 0      # uniform by design
    for r in rows.values():
        assert r.hot10_keys == 0                 # fixtures near-uniform
        assert r.n_rows > 0 and r.n_keys > 0
        assert r.max_key_rows * r.n_keys >= r.n_rows  # max >= mean


def test_encoding_patterns_agree_cross_engine_on_adversarial_text(
        spark):
    """Every ENC_PATTERNS regex must count identically in Spark
    (Java regex) and DuckDB (RE2) over a corpus built to probe the
    class boundaries: each C0/C1 control individually, the full
    CP1252 mojibake trail set, astral-plane and combining characters,
    boundary codepoints adjacent to every class edge, and mixed
    real-world mojibake shapes."""
    import duckdb

    from cga_logs_to_kinesis_spark.operators.ingest_audit import (
        ENC_PATTERNS,
    )

    texts = []
    # every C0/C1 codepoint + DEL, each embedded in ASCII
    for cp in list(range(0x00, 0x20)) + [0x7F] + \
            list(range(0x80, 0xA0)):
        texts.append(f"a{chr(cp)}b")
    # class-boundary neighbours: must NOT count as controls
    for cp in [0x09, 0x0A, 0x0D, 0x20, 0x7E, 0xA0, 0xA1]:
        texts.append(f"x{chr(cp)}y")
    # CP1252 trail set after each mojibake lead, plus bare trails
    trail = ("€‚ƒ„…†‡ˆ‰Š‹ŒŽ''" + '""' + "•–—˜™š›œžŸ")
    for t in trail:
        texts.append(f"Â{t} Ã{t} â{t}{t} lone:{t}")
    # replacement/invisible/astral/combining probes
    texts += ["�", "a��b", "​‌‏",
              "‪‮⁠﻿", "é combining",
              "astral \U0001F600 pair", "ascii only text",
              "Ã", "Â", "â", "ÃÃ©", "â€",
              "¿ÀÁÄ",    # above the trail range
              ""]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import pyspark.sql.functions as F
    got = (df.select(
        "doc_id",
        *[F.coalesce(F.regexp_count("text", F.lit(p)), F.lit(0))
          .alias(n) for n, p in ENC_PATTERNS.items()])
        .orderBy("doc_id").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    cols = ", ".join(
        f"COALESCE(len(regexp_extract_all(text, '{p}')), 0) AS {n}"
        for n, p in ENC_PATTERNS.items())
    want = con.execute(
        f"SELECT doc_id, {cols} FROM t ORDER BY doc_id").fetchall()
    con.close()
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w), (
            f"cross-engine divergence on {texts[g['doc_id']]!r}: "
            f"spark={tuple(g)} duckdb={tuple(w)}")
    # non-vacuity: the probes hit every counter
    import numpy as np
    totals = np.array([[int(x) for x in tuple(g)[1:]] for g in got]).sum(0)
    assert (totals > 0).all(), f"vacuous probe column: {totals}"


def test_source_divergence_plan_and_bounds(spark):
    """Scale pins for the TV-distance audit: the tokenize front is
    checkpointed (final plan reads the materialized RDD, zero parquet
    re-scans), the per-source and corpus totals attach as broadcast
    joins, and no Window or cartesian appears anywhere.  Values are
    genuine distances: every tv in [0, 1), and a single-source corpus
    would fold to 0."""
    from cga_logs_to_kinesis_spark.plans import formatted_plan
    from cga_logs_to_kinesis_spark.registry import all_queries

    df = all_queries()["source_divergence"].fn(
        spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("documents.parquet") == 0   # checkpointed front
    assert "Scan ExistingRDD" in plan
    assert plan.count("BroadcastExchange") >= 2   # n_src + n_all
    rows = df.collect()
    assert len(rows) == 20
    assert all(0.0 <= r.tv_distance < 1.0 for r in rows)
    assert any(r.tv_distance > 0.0 for r in rows)


def test_markup_scrub_on_real_html_shapes(spark):
    """The scrub handles the shapes real WARC text contains: nested
    and attribute-laden tags, all six named entities, double-encoded
    entities (&amp;lt; must become &lt;, NOT <), angle brackets
    produced BY decoding (must survive — decode runs after the strip),
    and NULL text."""
    from pyspark.sql import functions as F

    from cga_logs_to_kinesis_spark.operators.ingest_audit import (
        markup_scrub_columns,
    )

    rows = [
        (1, '<div class="a"><b>bold</b> and <i>ital</i></div>'),
        (2, "5 &lt; 6 &amp;&amp; 7 &gt; 2"),
        (3, "a&amp;lt;b"),                    # double-encoded
        (4, "&quot;q&quot; &apos;s&apos;&nbsp;end"),
        (5, "<p>x &lt;tag&gt; y</p>"),        # decoded brackets survive
        (6, None),
        (7, "plain text, no markup"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    n_tags, n_entities, clean = markup_scrub_columns(F.col("text"))
    got = {r.doc_id: (r.nt, r.ne, r.c)
           for r in sdf.select("doc_id", n_tags.alias("nt"),
                               n_entities.alias("ne"),
                               clean.alias("c")).collect()}
    assert got[1] == (6, 0, "bold and ital")
    assert got[2] == (0, 4, "5 < 6 && 7 > 2")
    assert got[3] == (0, 1, "a&lt;b")          # single decode only
    assert got[4] == (0, 5, '"q" \'s\' end')
    assert got[5] == (2, 2, "x <tag> y")
    assert got[6] == (0, 0, None)
    assert got[7] == (0, 0, "plain text, no markup")
