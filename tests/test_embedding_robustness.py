"""Dirty-embeddings robustness: the validity gate
(sources/tables.py::load_embeddings) must quarantine NULL, mis-shaped,
non-finite/overlarge, and zero-norm vectors BEFORE any similarity /
clustering / decimal math — in ANSI mode an ungated zero norm throws
DIVIDE_BY_ZERO mid-job and a ~1e30 magnitude overflows DECIMAL(38,6)
(both reproduced here, all caught by this net before the gate
existed).  The `embedding_validity` report query is hash-compared
against its DuckDB oracle on the same dirty table."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cga_logs_to_kinesis_spark.registry import all_queries
from tests.conftest import SF_SMOKE
from tests.test_null_robustness import _DOCS
from tests.test_queries_oracle import table_hash

# Every registered query that reads the embeddings table.
EMB_QUERIES = [
    "ann_recall_report", "ann_truncation_recall", "ann_incremental",
    "cosine_topk", "cosine_topk_fast",
    "cosine_topk_lsh", "cosine_topk_ivf", "semdedup",
    "dedup_embedding_cosine", "kmeans_embeddings",
    "embedding_covariance", "pca_project", "embedding_quantize",
    "embedding_centroids", "modal_agreement", "embedding_validity",
    "embedding_drift", "cosine_topk_pq", "cosine_topk_ivf_sq",
    "cluster_mixture", "split_leakage_semantic",
    "semdedup_survivors", "semdedup_apply", "semdedup_downweight",
    "semdedup_incremental",
]

N_VALID = 8


def _element(i: int, j: int) -> float:
    return float(((i * 37 + j * 11) % 19) - 9) / 7.0


def _dirty_rows():
    rows = []
    for i in range(N_VALID):
        rows.append((i, [_element(i, j) for j in range(64)], i % 3))
    rows += [
        (100, [0.0] * 64, 0),                                # zero_norm
        (101, None, 1),                                      # missing
        (102, [1e30] * 64, 2),                               # corrupt
        (103, [float("nan")] + [1.0] * 63, 0),               # corrupt
        (104, [1.0] * 8, 1),                                 # wrong_dim
    ]
    return rows


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_emb")
    spark.createDataFrame(_DOCS).write.parquet(
        str(d / "documents.parquet"))
    pdf = pd.DataFrame(_dirty_rows(),
                       columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embedding_query_survives_dirty_vectors(spark, dirty_dir, name):
    """No embedding operator may crash on quarantinable vectors."""
    n = all_queries()[name].fn(spark, dirty_dir).count()
    assert n >= 0


def test_validity_report_matches_oracle_on_dirty(spark, dirty_dir):
    spec = all_queries()["embedding_validity"]
    sdf = spec.fn(spark, dirty_dir)
    srows = [tuple(r) for r in sdf.collect()]
    by_class = {r[0]: r[1] for r in srows}
    assert by_class == {"missing": 1, "wrong_dim": 1,
                        "corrupt_values": 2, "zero_norm": 1,
                        "valid": N_VALID}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{dirty_dir}/embeddings.parquet/*.parquet')")
    cur = con.execute(spec.oracle)
    ocols = [c[0] for c in cur.description]
    orows = cur.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(srows, list(sdf.columns)) == table_hash(orows, ocols)


def test_gate_excludes_only_invalid_rows(spark, dirty_dir):
    """cosine_topk over the dirty table must equal cosine_topk over
    the valid-only subset: the gate removes exactly the quarantined
    rows and nothing else."""
    from cga_logs_to_kinesis_spark.operators.similarity import (
        cosine_topk,
    )
    from cga_logs_to_kinesis_spark.sources import load_embeddings
    from pyspark.sql import functions as F

    gated = load_embeddings(spark, dirty_dir)
    assert gated.count() == N_VALID
    assert sorted(r.vec_id for r in gated.select("vec_id").collect()) \
        == list(range(N_VALID))
    got = cosine_topk(gated, gated.filter(F.col("vec_id") < 3), k=3) \
        .collect()
    valid_only = gated.filter(F.col("vec_id") < N_VALID)
    want = cosine_topk(valid_only,
                       valid_only.filter(F.col("vec_id") < 3), k=3) \
        .collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 9


def test_validity_all_valid_on_clean_fixture(spark):
    """On the driver fixtures the gate is an identity: one 'valid' row
    covering every vector — which is why every pre-existing oracle
    hash is unchanged by gating the loads."""
    rows = all_queries()["embedding_validity"].fn(spark, SF_SMOKE) \
        .collect()
    assert len(rows) == 1
    assert rows[0].validity == "valid"


# With the oracles routed through VALID_EMBEDDING_SQL (the gate's SQL
# twin), every gated query must stay HASH-IDENTICAL to its oracle on a
# fixture containing invalid vectors — the upgrade from crash-freedom
# to hash-comparison that caught nine divergences when applied to the
# documents net.  embedding_validity is covered separately above (it
# reads the raw table by design); parquet-path views stand in for the
# driver's fixture views.
GATED_HASH_QUERIES = [q for q in EMB_QUERIES if q != "embedding_validity"]


@pytest.fixture(scope="module")
def dirty_oracle(dirty_dir):
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{dirty_dir}/{t}.parquet/*.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", GATED_HASH_QUERIES)
def test_gated_query_matches_oracle_on_dirty(spark, dirty_dir,
                                             dirty_oracle, name):
    spec = all_queries()[name]
    sdf = spec.fn(spark, dirty_dir)
    srows = [tuple(r) for r in sdf.collect()]
    cur = dirty_oracle.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), "row count mismatch"
    assert sorted(sdf.columns) == sorted(ocols), "schema mismatch"
    assert table_hash(srows, list(sdf.columns)) == table_hash(orows, ocols)


# ---------------------------------------------------------------------------
# gate_embeddings_sql rewrite hygiene (the oracle twin of the gate)
# ---------------------------------------------------------------------------

def test_gate_rewrite_is_idempotent_and_case_insensitive():
    from cga_logs_to_kinesis_spark.sources.tables import (
        VALID_EMBEDDING_SQL,
        gate_embeddings_sql,
    )
    once = gate_embeddings_sql("SELECT * FROM embeddings WHERE vec_id < 8")
    assert VALID_EMBEDDING_SQL in once
    # re-gating (an oracle embedding an already-gated CTE) is a no-op
    assert gate_embeddings_sql(once) == once
    # lowercase reads are gated too, not silently skipped
    lower = gate_embeddings_sql("select vec_id from embeddings")
    assert VALID_EMBEDDING_SQL in lower
    join = gate_embeddings_sql("SELECT * FROM documents JOIN embeddings "
                               "ON doc_id = vec_id")
    assert VALID_EMBEDDING_SQL in join


def test_gate_rewrite_raises_on_unrecognized_read():
    """A comma join (or quoted identifier) the regex can't rewrite must
    raise — an ungated oracle would silently hash-diverge on dirty
    fixtures, which is exactly the failure mode the gate closes."""
    from cga_logs_to_kinesis_spark.sources.tables import gate_embeddings_sql
    with pytest.raises(ValueError, match="survived the rewrite"):
        gate_embeddings_sql("SELECT * FROM documents, embeddings")
