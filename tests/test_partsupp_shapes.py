"""TPC-H Q2/Q9/Q11/Q16/Q20 partsupp topologies — live registry
queries since both engines DERIVE partsupp from part x supplier
(operators/tpch_partsupp.py).  This module verifies each query
hash-exact against its DuckDB oracle, pins the Spark derivation
against the pure-Python reference generator, asserts the plan
properties that make each shape scale, and keeps the NULL net alive
by substituting a punched parquet for the derivation on both
engines.  ``ps_dir`` still materializes a generated partsupp.parquet
— it is the base the dirty fixture punches NULLs into."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cga_logs_to_kinesis_spark.operators.tpch_partsupp import (
    PARTSUPP_SPECS,
    generate_partsupp,
)
from cga_logs_to_kinesis_spark.plans import formatted_plan, has_pushed_filters
from tests.conftest import SF_SMOKE
from tests.test_queries_oracle import table_hash

_TABLES = ("part", "supplier", "nation", "region", "lineitem", "orders")


@pytest.fixture(scope="module")
def ps_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("partsupp_sf")
    for t in _TABLES:
        os.symlink(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    part_keys = pq.read_table(
        f"{SF_SMOKE}/part.parquet", columns=["p_partkey"]
    )["p_partkey"].to_pylist()
    n_supp = pq.read_metadata(f"{SF_SMOKE}/supplier.parquet").num_rows
    rows = generate_partsupp(part_keys, n_supp)
    pq.write_table(pa.table({
        "ps_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "ps_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "ps_availqty": pa.array([r[2] for r in rows], pa.int64()),
        "ps_supplycost_cents": pa.array([r[3] for r in rows], pa.int64()),
    }), d / "partsupp.parquet")
    return str(d)


@pytest.fixture(scope="module")
def ps_oracle(ps_dir):
    con = duckdb.connect()
    for t in (*_TABLES, "partsupp"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{ps_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PARTSUPP_SPECS))
def test_partsupp_query_matches_oracle(spark, ps_dir, ps_oracle, name):
    spec = PARTSUPP_SPECS[name]
    sdf = spec.fn(spark, ps_dir)
    srows = [tuple(r) for r in sdf.collect()]
    assert srows, f"{name}: empty result defeats the hash check"
    cur = ps_oracle.execute(spec.oracle)
    ocols = [c[0] for c in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(srows, list(sdf.columns)) == table_hash(orows, ocols)


def test_q2_decorrelation_plan(spark, ps_dir):
    """The scalar-min subquery must decorrelate to agg + equi-join:
    broadcast dims, no nested-loop join, and the part filter pushed
    into its scan."""
    df = PARTSUPP_SPECS["min_cost_supplier"].fn(spark, ps_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert has_pushed_filters(df, "p_type")


def test_q11_scalar_total_is_broadcast_not_recompute(spark, ps_dir):
    """The global total must enter as ONE broadcast row (nested-loop
    join against a 1-row aggregate), not a per-group recomputation —
    exactly one broadcast-nested-loop, no cartesian product."""
    plan = formatted_plan(PARTSUPP_SPECS["important_stock"].fn(spark, ps_dir))
    # exactly one such node in the plan tree (each node appears twice
    # in formatted output: once in the tree, once in the detail list)
    assert plan.count("BroadcastNestedLoopJoin") == 2
    assert "CartesianProduct" not in plan


def test_q16_anti_join_is_broadcast(spark, ps_dir):
    plan = formatted_plan(
        PARTSUPP_SPECS["supplier_part_counts"].fn(spark, ps_dir))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q9_double_fact_join_is_product_free(spark, ps_dir):
    """Q9's two fact-fact joins (orders on l_orderkey, partsupp on
    l_partkey+l_suppkey) key differently, so the plan pays exactly
    those shuffles — everything else must broadcast, nothing may
    nested-loop."""
    plan = formatted_plan(
        PARTSUPP_SPECS["product_profit"].fn(spark, ps_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q20_semi_chain(spark, ps_dir):
    plan = formatted_plan(
        PARTSUPP_SPECS["excess_stock_suppliers"].fn(spark, ps_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_partsupp_suite_is_live_in_registry():
    """The five partsupp shapes are ordinary registry queries now that
    both engines derive partsupp from part x supplier — no fixture, no
    probe, no latent crash."""
    from cga_logs_to_kinesis_spark.registry import all_queries

    qs = all_queries()
    for name in sorted(PARTSUPP_SPECS):
        assert name in qs
        assert qs[name].oracle.lstrip().startswith("WITH partsupp AS")


def test_derived_partsupp_matches_reference_generator(spark, ps_dir):
    """load_partsupp (Spark) must produce exactly the rows of the
    pure-Python generate_partsupp reference — the same rows the
    PARTSUPP_SQL oracle CTE derives (pinned transitively by every
    hash-matched query above)."""
    from cga_logs_to_kinesis_spark.operators.tpch_partsupp import (
        load_partsupp,
    )

    part_keys = pq.read_table(
        f"{SF_SMOKE}/part.parquet", columns=["p_partkey"]
    )["p_partkey"].to_pylist()
    n_supp = pq.read_metadata(f"{SF_SMOKE}/supplier.parquet").num_rows
    want = sorted(generate_partsupp(part_keys, n_supp))
    got = sorted(tuple(r) for r in
                 load_partsupp(spark, SF_SMOKE).collect())
    assert got == want and len(got) == len(part_keys) * 4


# ---------------------------------------------------------------------------
# Dirty-partsupp net: NULL keys/quantities through the Q2/Q16/Q20
# NOT-IN / semi / anti chains — exactly where SQL NULL semantics bite.
# Hash-compared (not crash-checked) against DuckDB on the same files.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dirty_ps_dir(tmp_path_factory, ps_dir):
    d = tmp_path_factory.mktemp("dirty_partsupp_sf")
    for t in _TABLES:
        if t != "supplier":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    # supplier with NULL s_acctbal holes (Q2 ranks by acctbal)
    con.execute(f"""
        COPY (SELECT * REPLACE (
                  CASE WHEN s_suppkey % 7 = 3 THEN NULL
                       ELSE s_acctbal END AS s_acctbal)
              FROM read_parquet('{SF_SMOKE}/supplier.parquet'))
        TO '{d}/supplier.parquet' (FORMAT PARQUET)
    """)
    # partsupp with NULLs punched into every column the five shapes
    # join, aggregate, or range-filter on
    con.execute(f"""
        COPY (SELECT
                  CASE WHEN rn % 13 = 7 THEN NULL
                       ELSE ps_partkey END AS ps_partkey,
                  CASE WHEN rn % 11 = 5 THEN NULL
                       ELSE ps_suppkey END AS ps_suppkey,
                  CASE WHEN rn % 17 = 9 THEN NULL
                       ELSE ps_availqty END AS ps_availqty,
                  CASE WHEN rn % 19 = 11 THEN NULL
                       ELSE ps_supplycost_cents END AS ps_supplycost_cents
              FROM (SELECT *, row_number() OVER () AS rn
                    FROM read_parquet('{ps_dir}/partsupp.parquet')))
        TO '{d}/partsupp.parquet' (FORMAT PARQUET)
    """)
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def dirty_ps_oracle(dirty_ps_dir):
    con = duckdb.connect()
    for t in (*_TABLES, "partsupp"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{dirty_ps_dir}/{t}.parquet')")
    yield con
    con.close()


def test_dirty_fixture_actually_has_nulls(dirty_ps_oracle):
    n = dirty_ps_oracle.execute(
        "SELECT COUNT(*) FILTER (ps_suppkey IS NULL), "
        "COUNT(*) FILTER (ps_partkey IS NULL), "
        "COUNT(*) FILTER (ps_availqty IS NULL), "
        "COUNT(*) FILTER (ps_supplycost_cents IS NULL), "
        "(SELECT COUNT(*) FILTER (s_acctbal IS NULL) FROM supplier) "
        "FROM partsupp").fetchone()
    assert all(c > 0 for c in n), n


@pytest.mark.parametrize("name", sorted(PARTSUPP_SPECS))
def test_partsupp_query_matches_oracle_on_dirty(spark, dirty_ps_dir,
                                                dirty_ps_oracle, name,
                                                monkeypatch):
    """Derived partsupp can never contain NULLs, so the NULL net
    substitutes a punched parquet on BOTH engines: load_partsupp is
    monkeypatched to read it, and the oracle's derivation CTE body is
    replaced by a read of the same file — the NOT-IN/semi/anti NULL
    semantics stay covered column-independently."""
    from cga_logs_to_kinesis_spark.operators import tpch_partsupp
    from cga_logs_to_kinesis_spark.operators.tpch_partsupp import (
        PARTSUPP_SQL,
    )

    monkeypatch.setattr(
        tpch_partsupp, "load_partsupp",
        lambda sp, sf: sp.read.parquet(f"{sf}/partsupp.parquet"))
    spec = PARTSUPP_SPECS[name]
    assert PARTSUPP_SQL in spec.oracle
    oracle = spec.oracle.replace(
        PARTSUPP_SQL,
        f"(SELECT * FROM "
        f"read_parquet('{dirty_ps_dir}/partsupp.parquet'))")
    sdf = spec.fn(spark, dirty_ps_dir)
    srows = [tuple(r) for r in sdf.collect()]
    cur = dirty_ps_oracle.execute(oracle)
    ocols = [c[0] for c in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), \
        f"{name}: {len(srows)} spark vs {len(orows)} oracle rows"
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(srows, list(sdf.columns)) == table_hash(orows, ocols)
