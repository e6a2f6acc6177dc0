"""Mergeable-sketch operators for corpus curation at 100 TB scale:
exact heavy hitters via distributed Misra-Gries (candidate + verify),
and Bloom-filter decontamination against a fingerprint blocklist.

Both are patterns the exact registry queries deliberately avoid at
fixture scale but a 100 TB run cannot: ``token_frequencies`` shuffles
every distinct token's partial count (fine until the vocabulary is
billions of mostly-once tokens), and ``ngram_decontaminate`` joins the
corpus against the contamination set (fine until the blocklist is too
big to broadcast but its bitmap is not).  The sketch versions keep the
EXACT-output contract where theory allows (Misra-Gries candidates are
a proven superset of the heavy hitters, so verify-then-filter is
exact and oracle-paired) and pin deterministic cross-engine semantics
where it doesn't (the Bloom filter's false positives are a pure
function of md5-derived bit positions, so DuckDB reproduces them
bit-for-bit).

Reference scope note: the reference (main.go) has no analytics; these
extend the relational surface required by the driver contract
(SURVEY.md §2.6, LLM-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.operators.dedup import (
    CHAR_HASH_P,
    NORMALIZED_SQL,
    _row_hash_expr,
    normalized_text,
)
from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import (
    tune_session,
    widen_for_explode,
)
from cga_logs_to_kinesis_spark.sources import load_table

# ---------------------------------------------------------------------------
# Exact heavy hitters: distributed Misra-Gries candidates + exact verify
# ---------------------------------------------------------------------------

# Counters per partition.  The guarantee: any token with global count
# C(t) such that C(t) * (MG_COUNTERS + 1) > N (N = total tokens) has,
# by averaging, local count c_p(t) > n_p / (MG_COUNTERS + 1) in at
# least one partition p, and a Misra-Gries summary with MG_COUNTERS
# counters never evicts such a token.  The union of per-partition
# survivors is therefore a SUPERSET of the true heavy hitters; an
# exact counting pass over candidates only, then the threshold filter,
# yields exactly the heavy-hitter set — integer-exact, oracle-paired.
MG_COUNTERS = 200


def _mg_partitions(batches):
    """Per-partition Misra-Gries over the ``token`` column.

    Vectorized per Arrow batch: value_counts() the batch (C-speed),
    merge into the running counter dict, then apply the mergeable-
    summary contraction (subtract the (K+1)-th largest count from
    all, drop non-positive) whenever the dict exceeds K entries.
    State is O(K); output is <= K candidate rows per partition
    (token, surviving counter value — a LOWER bound on the token's
    local count, undercounting by < n_p/(K+1)) plus one
    (NULL, 0, n_tokens) row carrying the partition's token count so
    the caller can form N without a second corpus pass.  The counter
    values make the summary MERGEABLE across partitions AND batches
    (sum counters, slack budgets add), which is what the streaming
    twin (streaming/corpus.py::heavy_hitters_sink) folds on."""
    import pandas as pd

    counters: dict[str, int] = {}
    part_tokens = 0
    for pdf in batches:
        vc = pdf["token"].value_counts()
        part_tokens += int(vc.sum())
        for tok, c in vc.items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > MG_COUNTERS:
            vals = sorted(counters.values(), reverse=True)
            sub = vals[MG_COUNTERS]
            counters = {t: c - sub
                        for t, c in counters.items() if c > sub}
    yield pd.DataFrame(
        {"token": list(counters.keys()) + [None],
         "cnt": list(counters.values()) + [0],
         "part_tokens": [0] * len(counters) + [part_tokens]})


MG_SUMMARY_SCHEMA = "token string, cnt long, part_tokens long"


def tokenize_docs(docs: DataFrame) -> DataFrame:
    """The shared tokenization front (dedup-canonical whitespace
    split) — one definition so the batch query and the streaming sink
    cannot diverge."""
    return (docs
            .select(F.explode(F.split(normalized_text(), " "))
                    .alias("token"))
            .filter(F.col("token") != ""))


def heavy_hitters_report(spark: SparkSession,
                         docs: DataFrame) -> DataFrame:
    """Tokens with count*(K+1) > total corpus tokens — EXACT, without
    ever shuffling the full vocabulary.

    Pass 1: Misra-Gries per partition, O(K) state, emitting <= K
    candidates + the partition token count.  The MG guarantee holds
    for ANY partitioning, so the corpus is repartitioned ONLY when
    the scan arrives narrower than the `spark.cga.explode.parallelism`
    knob — the fixture-scale case where a single-file scan is one
    partition on local; a 100 TB scan's natural partitioning is
    already wide, and the width gate means it never pays a full
    corpus shuffle just to tokenize (plan-pinned by
    tests/test_plans.py::test_heavy_hitters_wide_input_no_exchange).
    Pass 2: exact counts for the candidate tokens ONLY (broadcast
    semi-filter, so the aggregate's key space is <= K x partitions
    instead of the vocabulary), then the integer threshold.  At
    100 TB the vocabulary is billions of near-singleton tokens;
    ``token_frequencies``' full groupBy shuffles all of their partial
    counts while this plan shuffles at most the candidate set.
    """
    docs = widen_for_explode(docs, "doc_id")
    toks = tokenize_docs(docs)
    summary = (toks.mapInPandas(_mg_partitions, MG_SUMMARY_SCHEMA)
               .localCheckpoint())            # MG runs once, feeds both
    total = summary.agg(F.sum("part_tokens")).first()[0] or 0
    candidates = (summary.filter(F.col("token").isNotNull())
                  .select("token").distinct())
    verified = (toks.join(F.broadcast(candidates), "token")
                .groupBy("token")
                .agg(F.count("*").alias("n")))
    return (verified
            .filter(F.col("n") * (MG_COUNTERS + 1) > F.lit(int(total)))
            .orderBy(F.col("n").desc(), "token"))


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return heavy_hitters_report(spark,
                                load_table(spark, sf_dir, "documents"))


register(QuerySpec(
    "heavy_hitters", q_heavy_hitters,
    oracle=f"""
        WITH toks AS (
            SELECT t.tok AS token
            FROM documents,
                 UNNEST(regexp_split_to_array({NORMALIZED_SQL}, ' '))
                     AS t(tok)
            WHERE t.tok != ''
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM toks
        GROUP BY token
        HAVING COUNT(*) * {MG_COUNTERS + 1} > (SELECT COUNT(*) FROM toks)
        ORDER BY n DESC, token
    """,
    doc=f"exact heavy hitters (count*(K+1) > N, K={MG_COUNTERS}) via "
        "per-partition Misra-Gries candidates + exact verify — O(K) "
        "state per partition, never shuffles the full vocabulary",
    tags=("text", "sketch", "agg", "north-star"),
))


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------

# Sizing: fill ratio f = 1 - exp(-n*H/M), false-positive rate ~ f^H.
# The fixture blocklist is ~38 fingerprints at sf0.01 (~190 set bits,
# FP ~ 0) and ~380 at sf0.1 (f ~ 0.37, FP ~ 0.7% -> a handful of
# false positives that ARE hash-compared cross-engine, so the
# FP-accepting semantics is exercised, not just theorized).  At
# 100 TB, size M at ~14.4 bits/entry for 0.1% FP (a 1e9-entry
# blocklist -> 1.7 GiB bitmap, broadcast once); the registered query
# already builds it that way (build_bloom_bitmap_tree's per-partition
# OR fold), with the bounded position-collect build kept only as the
# parity reference.
BLOOM_BITS = 1 << 12
BLOOM_HASHES = 5

# u60 fingerprint of the dedup-canonical text (the repo's standard
# md5-prefix integer fold; DuckDB twin: CAST('0x'||SUBSTRING(md5,1,15)
# AS BIGINT)).  NORMALIZED_SQL is DuckDB-flavored (trailing 'g' flag),
# so the Spark side builds from the Column-API normalized_text().
def _fp_col():
    return (F.conv(F.substring(F.md5(normalized_text()), 1, 15),
                   16, 10).cast("bigint"))


_FP_SQL = (f"CAST('0x' || SUBSTRING(md5({NORMALIZED_SQL}), 1, 15) "
           f"AS BIGINT)")


def _positions_expr(fp: str) -> str:
    """The BLOOM_HASHES bit positions of fingerprint expression
    ``fp`` — the dedup module's affine universal family mod the
    bitmap size, identical integer folds in Spark SQL and DuckDB."""
    return (f"transform(sequence(0, {BLOOM_HASHES - 1}), "
            f"i -> ({_row_hash_expr(fp, 'i')}) % {BLOOM_BITS})")


_POSITIONS_SQL = (f"list_transform(range(0, {BLOOM_HASHES}), "
                  f"i -> (({_row_hash_expr('fp', 'i')}) "
                  f"% {BLOOM_BITS}))")


def _bitmap_via_positions_collect(block: DataFrame, bits: int):
    """Fixture-friendly build: collect the DISTINCT bit positions
    (bounded by the bitmap size regardless of blocklist size) and set
    them driver-side.  Kept as the parity reference for the tree
    build below — both must produce the identical bitmap
    (tests/test_sketches.py::test_bloom_build_paths_agree)."""
    import numpy as np

    pos_rows = (block
                .select(F.explode(F.expr(_positions_expr("fp")))
                        .alias("pos"))
                .distinct().collect())
    bitmap = np.zeros(bits, dtype=bool)
    if pos_rows:
        bitmap[[r.pos for r in pos_rows]] = True
    return bitmap


def build_bloom_bitmap_tree(block: DataFrame, bits: int):
    """The at-scale bitmap build: each partition folds its blocklist
    fingerprints' bit positions into a LOCAL numpy bitmap, and the
    fixed-size partials are OR-reduced pairwise with treeReduce —
    nothing whose row count depends on the blocklist ever moves.  At
    the 100 TB sizing (~14.4 bits/entry for 0.1% FP, so a 1e9-entry
    blocklist is a 1.7 GiB bitmap) the tree depth keeps the driver
    receiving O(sqrt(P)) partials instead of P.  Positions come from
    the SAME ``_positions_expr`` fragment as the collect build and
    the DuckDB oracle, so all three agree bit-for-bit.  (This is the
    one deliberate RDD use in the repo: the reduction value is a raw
    fixed-size buffer, not rows, which DataFrame aggregation cannot
    express without faking it as a giant binary cell.)"""
    import numpy as np

    def fold(rows):
        bm = np.zeros(bits, dtype=bool)
        for r in rows:
            bm[r.poss] = True
        yield bm

    return (block.select(F.expr(_positions_expr("fp")).alias("poss"))
            .rdd.mapPartitions(fold)
            .treeReduce(np.bitwise_or))


def bloom_probe(bitmap):
    """Membership probe against a built ``bitmap`` as an
    Arrow-vectorized pandas-UDF Column function.  Callers MUST pass
    the fingerprint pre-reduced mod CHAR_HASH_P (``fp % CHAR_HASH_P``
    Spark-side): when a NULL shares an Arrow batch with valid rows,
    pyarrow hands pandas a float64 column, and raw u60 fingerprints
    (> 2^53) would round before astype — reduced values (<= 1e9+6)
    survive float64 exactly.  Shared by the batch query and the
    streaming store consumer so the probe arithmetic cannot
    diverge."""
    import numpy as np
    import pandas as pd

    def _probe(fp):                        # pd.Series -> pd.Series
        out = np.zeros(len(fp), dtype=bool)
        valid = fp.notna().to_numpy()
        if valid.any():
            h = fp.to_numpy()[valid].astype(np.int64)
            hit = np.ones(h.shape, dtype=bool)
            for i in range(BLOOM_HASHES):
                pos = ((97 + 31 * i) * h + 911 * i + 13) \
                    % CHAR_HASH_P % len(bitmap)
                hit &= bitmap[pos]
            out[valid] = hit
        return pd.Series(out)

    # plain-callable wrap (not decorator): the module-level
    # `from __future__ import annotations` turns hints into strings,
    # which pandas_udf's signature inference rejects
    return F.pandas_udf(_probe, "boolean")


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source decontamination report: drop every document whose
    text fingerprint hits the Bloom filter built from the blocklist
    (the fixture's stand-in benchmark set: doc_id % 13 == 0).

    The 100 TB pattern ``ngram_decontaminate``'s exact join cannot
    follow: when the blocklist is too large to broadcast as rows but
    its BITMAP is not, membership becomes H array probes per document
    — no join, no shuffle, one narrow pass over the corpus.  The
    price is false positives (over-dropping only — a Bloom filter has
    NO false negatives, so contamination removal stays complete), and
    the report makes that price visible: n_false_pos counts clean
    documents the filter would drop.

    Cross-engine determinism: positions are md5-prefix fingerprints
    through the affine family (dedup.py:_row_hash_expr), so the
    oracle reproduces the exact false-positive set.  The Spark probe
    is the real thing — a numpy bitmap inside an Arrow-vectorized
    pandas UDF; the oracle simulates it relationally
    (list_has_all against the distinct-position list).
    """
    tune_session(spark)
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source", _fp_col().alias("fp")))
    block = docs.filter((F.col("doc_id") % 13 == 0)
                        & F.col("fp").isNotNull())
    # The registered query runs the at-scale build (per-partition
    # bitmaps OR-folded with treeReduce — works unchanged for a
    # 1e9-entry blocklist); the bounded distinct-position collect
    # build survives as the parity reference, bit-for-bit-tested
    # against this one.
    bitmap = build_bloom_bitmap_tree(block, BLOOM_BITS)
    in_bloom = bloom_probe(bitmap)

    flagged = docs.select(
        "source",
        F.coalesce(F.col("doc_id") % 13 == 0, F.lit(False))
        .alias("raw_block"),
        F.col("fp").isNotNull().alias("has_fp"),
        in_bloom(F.col("fp") % CHAR_HASH_P).alias("hit"))
    in_block = F.col("raw_block") & F.col("has_fp")
    return (flagged.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(in_block.cast("bigint")).alias("n_blocklisted"),
                 F.sum(F.col("hit").cast("bigint")).alias("n_dropped"),
                 F.sum((F.col("hit") & ~in_block).cast("bigint"))
                 .alias("n_false_pos"),
                 F.sum((~F.col("hit")).cast("bigint")).alias("n_kept"))
            .orderBy("source"))


register(QuerySpec(
    "bloom_decontaminate", q_bloom_decontaminate,
    oracle=f"""
        WITH fps AS (
            SELECT doc_id, source, {_FP_SQL} AS fp FROM documents
        ),
        bits AS (
            SELECT DISTINCT u.pos
            FROM (SELECT {_POSITIONS_SQL} AS poss FROM fps
                  WHERE doc_id % 13 = 0 AND fp IS NOT NULL) b,
                 UNNEST(b.poss) AS u(pos)
        ),
        bitlist AS (
            SELECT COALESCE(LIST(pos), []) AS bl FROM bits
        ),
        probes AS (
            SELECT source,
                   (COALESCE(doc_id % 13 = 0, FALSE)
                    AND fp IS NOT NULL) AS in_block,
                   CASE WHEN fp IS NULL THEN FALSE
                        ELSE list_has_all(bitlist.bl, {_POSITIONS_SQL})
                   END AS hit
            FROM fps, bitlist
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN in_block THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_blocklisted,
               CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_dropped,
               CAST(SUM(CASE WHEN hit AND NOT in_block THEN 1 ELSE 0
                   END) AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN NOT hit THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_kept
        FROM probes
        GROUP BY source
        ORDER BY source
    """,
    doc=f"Bloom-filter decontamination report ({BLOOM_BITS} bits, "
        f"{BLOOM_HASHES} hashes, blocklist = doc_id%13): membership "
        "is H bitmap probes per doc — no join, no shuffle; false "
        "positives deterministic and hash-compared cross-engine",
    tags=("text", "sketch", "dedup", "north-star"),
))
