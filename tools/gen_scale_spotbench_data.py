"""Synthesize an ~sf1 dataset for the 8-vs-32-core scaling spot-bench.

The driver's fixtures stop at sf0.1 (/root/testdata, read-only), and at
that size per-stage fixed cost dominates: the r18 verdict measured the
whole suite at 78.1 s on 8 cores vs 75.5 s on 32 — parallelism wins are
invisible.  This tool builds a 10x replica of sf0.1 in a scratch dir so
the heavy queries can be timed at a scale where core count matters.
It is a MEASUREMENT fixture only: nothing in the engine, bench contract,
or oracle gate reads it, and the numbers it produces are recorded to
docs/bench/ as scaling evidence, never as headline timings.

Replication must preserve the queries' work *shape* per byte:

* documents: 10 replicas; doc_id shifted by replica * DOC_OFF and text
  passed through a replica-specific consonant substitution (translate),
  so token counts, lengths and per-doc shingle counts are identical to
  the original while the shingle/fingerprint VALUES of different
  replicas are disjoint.  A naive copy (same text) would put every
  replica of a doc into the same LSH buckets — candidate pairs would
  grow 100x for 10x data and the "scaling" run would measure a
  different algorithmically-degenerate problem.  With disjoint
  replicas the near-dup structure is 10 independent copies of sf0.1:
  work grows ~linearly, which is the honest scaling question.
* lineitem: 10 replicas with l_orderkey shifted (profile queries fold
  per-row; distinct counts grow ~10x for key-like columns, flat for
  enum-like ones — same as real growth).
* embeddings: 10 replicas; vec_id shifted, embedding passed through a
  replica-specific cyclic dimension rotation (an orthogonal map, so
  intra-replica cosine structure is EXACTLY sf0.1's; cross-replica
  cosines scatter like background pairs).

Usage: python tools/gen_scale_spotbench_data.py [out_dir]
        (default /tmp/sf1_synth)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_REP = 10
SRC = "/root/testdata/sf0.1"
DOC_OFF = 10_000_000
ORD_OFF = 100_000_000
VEC_OFF = 1_000_000

# replica-specific consonant rotations: replica i maps these 10
# consonants to a rotation of themselves (bijective per replica, so
# text stays word-shaped; replica 0 is the identity).
_CONS = "bcdfghjklm"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    from pyspark.sql import functions as F

    from cga_logs_to_kinesis_spark.session import get_session

    spark = get_session("gen-sf1")
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = []
    for i in range(N_REP):
        rot = _CONS[i:] + _CONS[:i]
        reps.append(docs.select(
            (F.col("doc_id") + i * DOC_OFF).alias("doc_id"),
            F.translate(F.col("text"), _CONS, rot).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")]))
    from functools import reduce
    reduce(lambda a, b: a.unionByName(b), reps) \
        .repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/documents.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    reps = []
    for i in range(N_REP):
        reps.append(li.select(
            (F.col("l_orderkey") + i * ORD_OFF).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"]))
    reduce(lambda a, b: a.unionByName(b), reps) \
        .repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/lineitem.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim_expr = "size(embedding)"
    reps = []
    for i in range(N_REP):
        # cyclic rotation by i dims: orthogonal, norm-preserving
        rolled = F.expr(
            f"concat(slice(embedding, {i} + 1, {dim_expr} - {i}), "
            f"slice(embedding, 1, {i}))") if i else F.col("embedding")
        reps.append(emb.select(
            (F.col("vec_id") + i * VEC_OFF).alias("vec_id"),
            rolled.alias("embedding"),
            *[c for c in emb.columns
              if c not in ("vec_id", "embedding")]))
    reduce(lambda a, b: a.unionByName(b), reps) \
        .repartition(8).write.mode("overwrite") \
        .parquet(f"{out}/embeddings.parquet")

    # remaining tables: queries under spot-bench don't read them, but
    # symlink so load_table on any table resolves.
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "events"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)

    for t in ("documents", "lineitem", "embeddings"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
